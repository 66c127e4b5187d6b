"""Public API value types mirroring the reference C structs."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional


@dataclass
class ImageTiling:
    """(ref: heif_image_tiling, heif_tiling.h:37)."""

    num_columns: int = 1
    num_rows: int = 1
    tile_width: int = 0
    tile_height: int = 0
    image_width: int = 0
    image_height: int = 0
    top_offset: int = 0
    left_offset: int = 0
    number_of_extra_dimensions: int = 0


@dataclass
class EncodingOptions:
    """(ref: heif_encoding_options v8, heif_encoding.h:281-332)."""

    save_alpha_channel: bool = True
    image_orientation: int = 1           # EXIF orientation 1..8
    quality: int = 50
    lossless: bool = False
    output_nclx: Optional[object] = None  # NclxProfile
    macOS_compatibility_workaround_no_nclx_profile: bool = False
    save_two_colr_boxes_when_ICC_and_nclx_available: bool = False
    # unci-specific
    tile_cols: int = 1
    tile_rows: int = 1
    compression: Optional[str] = None     # 'zlib' | 'defl' | 'brot'
