"""Library lifecycle & version API (ref: api/libheif/heif_library.h,
17 LIBHEIF_API fns: heif_get_version.., heif_init/deinit,
heif_load_plugin(s), plugin paths).

Plugin loading maps to the in-process codec registry
(libheif_tpu.codecs.registry) — the TPU build has no dlopen plugins;
codec cores are built in (SURVEY.md §2.4 → Pallas/numpy cores).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

from ..codecs import registry

#: Mirrors the reference version this framework tracks feature-wise.
LIBHEIF_VERSION = "1.23.1"
LIBHEIF_NUMERIC_VERSION = (1 << 24) | (23 << 16) | (1 << 8)

_init_count = 0


def heif_get_version() -> str:
    """(ref: heif_library.h heif_get_version)."""
    return LIBHEIF_VERSION


def heif_get_version_number() -> int:
    return LIBHEIF_NUMERIC_VERSION


def heif_get_version_number_major() -> int:
    return (LIBHEIF_NUMERIC_VERSION >> 24) & 0xFF


def heif_get_version_number_minor() -> int:
    return (LIBHEIF_NUMERIC_VERSION >> 16) & 0xFF


def heif_get_version_number_maintenance() -> int:
    return (LIBHEIF_NUMERIC_VERSION >> 8) & 0xFF


def heif_init(params: Optional[dict] = None) -> None:
    """(ref: heif_library.h heif_init; init.cc:108). Ref-counted no-op:
    codec registration happens at package import."""
    global _init_count
    _init_count += 1


def heif_deinit() -> None:
    """(ref: init.cc:148)."""
    global _init_count
    _init_count = max(0, _init_count - 1)


# ---- plugin discovery (maps dlopen-plugin API onto the registry) ----

def heif_load_plugin(path: str):
    """Dynamic codec plugins do not exist in the TPU build (cores are
    compiled in); returns a handle-like descriptor for API parity."""
    raise NotImplementedError(
        "dynamic plugins are not used; codec cores are built in")


def heif_load_plugins(directory: str) -> List[object]:
    return []


def heif_unload_plugin(handle) -> None:
    pass


def heif_get_plugin_directories() -> List[str]:
    return []


def heif_free_plugin_directories(dirs) -> None:
    pass


def heif_get_plugin_paths() -> List[str]:
    return []


# ---- codec availability (ref: heif_decoding.h/heif_encoding.h have_*)

def heif_have_decoder_for_format(compression_format: str) -> bool:
    return registry.have_decoder(compression_format)


def heif_have_encoder_for_format(compression_format: str) -> bool:
    return registry.have_encoder(compression_format)


def heif_get_decoder_descriptors(compression_format: Optional[str] = None
                                 ) -> List[Tuple[str, str]]:
    """Returns (format, decoder_id) pairs (ref: heif_decoding.h
    heif_get_decoder_descriptors)."""
    out = registry.list_decoders()
    if compression_format is not None:
        out = [d for d in out if d[0] == compression_format]
    return out


def heif_get_encoder_descriptors(compression_format: Optional[str] = None
                                 ) -> List[Tuple[str, str]]:
    out = registry.list_encoders()
    if compression_format is not None:
        out = [e for e in out if e[0] == compression_format]
    return out
