"""Sequence (video track) runtime (ref: libheif/sequences/)."""

from .track import Track, TrackVisual, TrackMetadata, interpret_tracks

__all__ = ["Track", "TrackVisual", "TrackMetadata", "interpret_tracks"]
