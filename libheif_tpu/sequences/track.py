"""Track runtime: sample tables → decodable frame sequences.

Re-designed equivalent of the reference's track layer (reference:
libheif/sequences/track.{h,cc} Track track.h:131, track_visual.cc:175
decode_next_image_sample, chunk.cc sample-extent mapping). The sample
geometry (stsc/stco/stsz) is flattened once into per-sample extents —
the mapping is pure table math, no reference to decode state — and
frame decode goes through the same codec registry as image items.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

from ..core.error import HeifError, SubError
from ..boxes.box import Box
from ..boxes.seq import (Box_mvhd, Box_tkhd, Box_mdhd, Box_stsd, Box_stts,
                         Box_ctts, Box_stsc, Box_stsz, Box_stco, Box_co64,
                         Box_stss, VisualSampleEntry)


@dataclass
class Sample:
    offset: int           # absolute file offset
    size: int
    duration: int         # in media timescale
    dts: int
    is_sync: bool
    desc_index: int


class Track:
    """Base track model built from a trak box tree."""

    def __init__(self, trak: Box, file):
        self.trak = trak
        self.file = file
        self.tkhd: Box_tkhd = trak.get_child("tkhd", required=True)
        mdia = trak.get_child("mdia", required=True)
        self.mdhd: Box_mdhd = mdia.get_child("mdhd", required=True)
        hdlr = mdia.get_child("hdlr")
        self.handler = getattr(hdlr, "handler_type", "????") if hdlr else "????"
        minf = mdia.get_child("minf", required=True)
        stbl = minf.get_child("stbl", required=True)
        self.stbl = stbl
        self.stsd: Box_stsd = stbl.get_child("stsd", required=True)
        self.samples = self._flatten_samples(stbl)

    # ------------------------------------------------------------- tables

    def _flatten_samples(self, stbl) -> List[Sample]:
        """stsc/stco/stsz/stts/stss → flat per-sample extents
        (ref: chunk.cc Chunk::get_data_extent_for_sample)."""
        stsz: Box_stsz = stbl.get_child("stsz", required=True)
        stsc: Box_stsc = stbl.get_child("stsc", required=True)
        stco = stbl.get_child("stco") or stbl.get_child("co64")
        stts: Box_stts = stbl.get_child("stts", required=True)
        stss: Optional[Box_stss] = stbl.get_child("stss")
        if stco is None:
            raise HeifError.invalid_input(msg="track without chunk offsets")

        n = stsz.num_samples()
        sync = set(stss.samples) if stss else None
        # expand stsc runs over the chunk list
        chunks = stco.offsets
        spc: List[Tuple[int, int]] = []   # per chunk: (samples, desc_idx)
        entries = stsc.entries
        for i, (first, count, desc) in enumerate(entries):
            last = entries[i + 1][0] - 1 if i + 1 < len(entries) \
                else len(chunks)
            for _ in range(first, last + 1):
                spc.append((count, desc))
        samples: List[Sample] = []
        si = 0
        dts = 0
        for ci, off in enumerate(chunks):
            if ci >= len(spc):
                break
            count, desc = spc[ci]
            pos = off
            for _ in range(count):
                if si >= n:
                    break
                size = stsz.sample_size(si)
                dur = stts.sample_duration(si)
                samples.append(Sample(
                    offset=pos, size=size, duration=dur, dts=dts,
                    is_sync=(sync is None or (si + 1) in sync),
                    desc_index=desc))
                pos += size
                dts += dur
                si += 1
        return samples

    # ---------------------------------------------------------------- api

    @property
    def track_id(self) -> int:
        return self.tkhd.track_id

    @property
    def timescale(self) -> int:
        return self.mdhd.timescale

    @property
    def num_samples(self) -> int:
        return len(self.samples)

    def duration(self) -> int:
        return sum(s.duration for s in self.samples)

    def sample_duration(self, idx: int) -> int:
        return self.samples[idx].duration

    def sample_data(self, idx: int) -> bytes:
        s = self.samples[idx]
        return self.file.read_file_range(s.offset, s.size)


class TrackVisual(Track):
    """Video track: decode frames via the codec registry
    (ref: track_visual.cc:175 decode_next_image_sample)."""

    def __init__(self, trak: Box, file):
        super().__init__(trak, file)
        self._pos = 0
        entry = None
        for c in self.stsd.children:
            if isinstance(c, VisualSampleEntry):
                entry = c
                break
        if entry is None:
            raise HeifError.unsupported(SubError.Unsupported_codec,
                                        "no visual sample entry")
        self.entry = entry
        self.width = entry.width
        self.height = entry.height
        self.coding = entry.box_type

    def _codec_format(self) -> str:
        return {"hvc1": "hevc", "hev1": "hevc", "av01": "av1",
                "avc1": "avc"}.get(self.coding, self.coding)

    def _config_box(self):
        for c in self.entry.children:
            if c.box_type in ("hvcC", "av1C", "avcC", "vvcC"):
                return c
        return None

    def decode_sample(self, idx: int, limits=None):
        from ..codecs import registry
        dec = registry.get_decoder(self._codec_format())
        data = self.sample_data(idx)
        return dec.decode_single_image(self._config_box(), data,
                                       declared_size=(self.width,
                                                      self.height),
                                       limits=limits)

    def decode_next_image(self, limits=None):
        """(ref: heif_track_decode_next_image)."""
        if self._pos >= len(self.samples):
            return None
        img = self.decode_sample(self._pos, limits)
        self._pos += 1
        return img

    def seek(self, idx: int) -> None:
        self._pos = max(0, min(idx, len(self.samples)))


class TrackMetadata(Track):
    """URI metadata track (ref: track_metadata.{h,cc})."""

    def metadata_sample(self, idx: int) -> bytes:
        return self.sample_data(idx)


def interpret_tracks(file) -> List[Track]:
    """Build tracks from the file's moov box
    (ref: HeifContext::interpret_heif_file_sequences context.cc:2044)."""
    moov = file.top_level_box("moov")
    if moov is None:
        return []
    out: List[Track] = []
    for trak in moov.get_children("trak"):
        try:
            mdia = trak.get_child("mdia", required=True)
            hdlr = mdia.get_child("hdlr")
            handler = getattr(hdlr, "handler_type", "") if hdlr else ""
            if handler == "vide" or (
                    handler == "pict"):
                out.append(TrackVisual(trak, file))
            else:
                out.append(TrackMetadata(trak, file))
        except HeifError:
            continue
    return out


class VisualTrackWriter:
    """Appends encoded frames as track samples
    (ref: Track_Visual encode path track_visual.cc:478)."""

    def __init__(self, file, width: int, height: int, fmt: str = "hevc",
                 timescale: int = 90000, track_id: int = 1):
        self.file = file
        self.width = width
        self.height = height
        self.fmt = fmt
        self.sample_entry_type = {"hevc": "hvc1", "av1": "av01",
                                  "avc": "avc1"}.get(fmt, "hvc1")
        self.timescale = timescale
        self.track_id = track_id
        self.sample_sizes: List[int] = []
        self.sample_offsets: List[int] = []
        self.sample_durations: List[int] = []
        self.sync_samples: List[int] = []
        self.config_box = None

    def add_frame(self, img, duration: int, options=None) -> None:
        from ..codecs import registry
        enc = registry.get_encoder(self.fmt)
        data, cfg, _props = enc.encode_single_image(img, options)
        if self.config_box is None:
            self.config_box = cfg
        off = self.file.append_sample_data(data)
        if not self.sample_offsets or off != (
                self.sample_offsets[-1] + self.sample_sizes[-1]):
            pass  # single-chunk model keeps samples contiguous
        self.sample_offsets.append(off)
        self.sample_sizes.append(len(data))
        self.sample_durations.append(duration)
        self.sync_samples.append(len(self.sample_sizes))  # all intra

    def finalize(self) -> Box:
        """Build the trak box tree."""
        from ..boxes.box import Box_other
        from ..boxes.meta import Box_hdlr, Box_dinf, Box_dref, Box_url
        from ..boxes.seq import (Box_trak, Box_mdia, Box_minf, Box_stbl,
                                 Box_tkhd, Box_mdhd, Box_vmhd, Box_stsd,
                                 Box_stts, Box_stsc, Box_stsz, Box_stco,
                                 Box_stss, Box_ccst, VisualSampleEntry)
        trak = Box_trak()
        tkhd = Box_tkhd()
        tkhd.track_id = self.track_id
        tkhd.duration = sum(self.sample_durations)
        tkhd.width = self.width << 16
        tkhd.height = self.height << 16
        mdia = Box_mdia()
        mdhd = Box_mdhd()
        mdhd.timescale = self.timescale
        mdhd.duration = sum(self.sample_durations)
        hdlr = Box_hdlr()
        hdlr.handler_type = "vide"
        hdlr.name = "libheif_tpu video"
        minf = Box_minf()
        vmhd = Box_vmhd()
        dinf = Box_dinf()
        dref = Box_dref()
        dref.children.append(Box_url())
        dinf.children.append(dref)
        stbl = Box_stbl()
        stsd = Box_stsd()
        entry = VisualSampleEntry(self.sample_entry_type)
        entry.width = self.width
        entry.height = self.height
        if self.config_box is not None:
            entry.children.append(self.config_box)
        ccst = Box_ccst()
        entry.children.append(ccst)
        stsd.children.append(entry)
        stts = Box_stts()
        for d in self.sample_durations:
            if stts.entries and stts.entries[-1][1] == d:
                stts.entries[-1] = (stts.entries[-1][0] + 1, d)
            else:
                stts.entries.append((1, d))
        stsc = Box_stsc()
        stsc.entries = [(1, len(self.sample_sizes), 1)]
        stsz = Box_stsz()
        stsz.sizes = list(self.sample_sizes)
        stco = Box_stco()
        stco.offsets = [self.sample_offsets[0]] if self.sample_offsets \
            else []
        stss = Box_stss()
        stss.samples = list(self.sync_samples)
        for b in (stsd, stts, stsc, stsz, stco, stss):
            stbl.children.append(b)
        minf.children.extend([vmhd, dinf, stbl])
        mdia.children.extend([mdhd, hdlr, minf])
        trak.children.extend([tkhd, mdia])
        return trak
