"""Codec registry: the TPU-native replacement for the plugin system.

Re-designed equivalent of the reference's plugin registry (reference:
libheif/plugin_registry.{h,cc} — priority-ordered decoder/encoder sets
plugin_registry.cc:115-128; plugin ABI heif_plugin.h:85,192).

Where the reference dlopens external codec libraries, this registry
holds in-process codec cores (jnp/Pallas compute + host entropy
decode).  Decoders/encoders register with a priority; lookup returns
the highest-priority codec for a compression format, optionally pinned
by id (ref: heif_decoding_options.decoder_id).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple


class Decoder:
    """Decoder interface (ref: heif_decoder_plugin heif_plugin.h:85)."""

    id: str = "unknown"
    format: str = "unknown"
    priority: int = 100

    def decode_single_image(self, config_box, data: bytes,
                            declared_size=None, limits=None):
        raise NotImplementedError

    # sequence push/flush/pull API (ref: decoder.h:132-149)
    def push_sequence_data(self, data: bytes) -> None:
        raise NotImplementedError

    def pull_next_frame(self):
        raise NotImplementedError


class Encoder:
    """Encoder interface (ref: heif_encoder_plugin heif_plugin.h:192)."""

    id: str = "unknown"
    format: str = "unknown"
    priority: int = 100
    lossy_supported = True
    lossless_supported = False

    def encode_single_image(self, img, options=None):
        """Returns CodedImageData-like (data, config_box, extra_props)."""
        raise NotImplementedError

    def parameters(self) -> List[dict]:
        """Typed parameter introspection (ref: heif_encoding.h:154+)."""
        return []


_decoders: Dict[str, List[Decoder]] = {}
_encoders: Dict[str, List[Encoder]] = {}


def register_decoder(dec: Decoder) -> None:
    lst = _decoders.setdefault(dec.format, [])
    lst.append(dec)
    lst.sort(key=lambda d: -d.priority)


def register_encoder(enc: Encoder) -> None:
    lst = _encoders.setdefault(enc.format, [])
    lst.append(enc)
    lst.sort(key=lambda e: -e.priority)


def get_decoder(fmt: str, decoder_id: Optional[str] = None) -> Optional[Decoder]:
    for d in _decoders.get(fmt, []):
        if decoder_id is None or d.id == decoder_id:
            return d
    return None


def get_encoder(fmt: str, encoder_id: Optional[str] = None) -> Optional[Encoder]:
    for e in _encoders.get(fmt, []):
        if encoder_id is None or e.id == encoder_id:
            return e
    return None


def have_decoder(fmt: str) -> bool:
    return bool(_decoders.get(fmt))


def have_encoder(fmt: str) -> bool:
    return bool(_encoders.get(fmt))


def list_decoders() -> List[Tuple[str, str]]:
    return [(d.format, d.id) for lst in _decoders.values() for d in lst]


def list_encoders() -> List[Tuple[str, str]]:
    return [(e.format, e.id) for lst in _encoders.values() for e in lst]


def unregister_decoder(dec: Decoder) -> None:
    """Remove a previously registered decoder (plugin unload path)."""
    lst = _decoders.get(dec.format, [])
    if dec in lst:
        lst.remove(dec)


def unregister_encoder(enc: Encoder) -> None:
    lst = _encoders.get(enc.format, [])
    if enc in lst:
        lst.remove(enc)


def snapshot() -> Tuple[List[Decoder], List[Encoder]]:
    """Flat snapshot of all registered codecs, used by the plugin
    loader to diff what a plugin registered."""
    return ([d for lst in _decoders.values() for d in lst],
            [e for lst in _encoders.values() for e in lst])
