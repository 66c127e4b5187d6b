"""Support layer for the C ABI shim (bindings/c/heif_shim.c).

The embedded interpreter calls only these flat functions, keeping the C
side free of in-Python object navigation.  Enum integers use the
upstream libheif ABI values (reference:
libheif/api/libheif/heif_image.h:55-127, heif_error.h) so the shim's
header stays drop-in compatible.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from .context import HeifContext
from .core.error import HeifError
from .image.pixel_image import Channel, Chroma, Colorspace, PixelImage

_COLORSPACE_FROM_C = {
    99: Colorspace.Undefined,
    0: Colorspace.YCbCr,
    1: Colorspace.RGB,
    2: Colorspace.Monochrome,
}
_COLORSPACE_TO_C = {
    Colorspace.Undefined: 99,
    Colorspace.YCbCr: 0,
    Colorspace.RGB: 1,
    Colorspace.Monochrome: 2,
}
_CHROMA_FROM_C = {
    99: Chroma.Undefined,
    0: Chroma.Monochrome,
    1: Chroma.C420,
    2: Chroma.C422,
    3: Chroma.C444,
    10: Chroma.InterleavedRGB,
    11: Chroma.InterleavedRGBA,
}
_CHROMA_TO_C = {v: k for k, v in _CHROMA_FROM_C.items()}
_CHANNEL_FROM_C = {
    0: Channel.Y,
    1: Channel.Cb,
    2: Channel.Cr,
    3: Channel.R,
    4: Channel.G,
    5: Channel.B,
    6: Channel.Alpha,
    10: Channel.Interleaved,
}


def version() -> str:
    from . import __version__
    return "libheif_tpu " + __version__


def context_new() -> HeifContext:
    return HeifContext()


def read_from_file(path: str) -> HeifContext:
    return HeifContext.read_from_file(path)


def read_from_memory(data: bytes) -> HeifContext:
    return HeifContext.read_from_bytes(data)


def top_level_count(ctx: HeifContext) -> int:
    return len(ctx.top_level_image_ids())


def primary_id(ctx: HeifContext) -> int:
    return ctx.primary_item_id


def handle_info(ctx: HeifContext, item_id: int) -> Tuple[int, int, int, int]:
    """(width, height, is_primary, has_alpha) for an image item."""
    item = ctx.get_item(item_id)
    try:
        w, h = item.width_height()
    except Exception:   # noqa: BLE001 — metadata-only items
        w = h = 0
    primary = 1 if item_id == ctx.primary_item_id else 0
    alpha = 1 if getattr(item, "has_alpha", lambda: False)() else 0
    return int(w), int(h), primary, alpha


def decode(ctx: HeifContext, item_id: int, colorspace_c: int,
           chroma_c: int) -> PixelImage:
    return ctx.decode_image(
        item_id,
        colorspace=_COLORSPACE_FROM_C.get(colorspace_c,
                                          Colorspace.Undefined),
        chroma=_CHROMA_FROM_C.get(chroma_c, Chroma.Undefined))


def image_info(img: PixelImage) -> Tuple[int, int, int, int]:
    """(colorspace_c, chroma_c, width, height)."""
    return (_COLORSPACE_TO_C.get(img.colorspace, 99),
            _CHROMA_TO_C.get(img.chroma, 99), img.width, img.height)


def has_channel(img: PixelImage, channel_c: int) -> int:
    ch = _CHANNEL_FROM_C.get(channel_c)
    return 1 if (ch is not None and ch in img.channels()) else 0


def channel_size(img: PixelImage, channel_c: int) -> Tuple[int, int, int]:
    """(width, height, bit_depth) of one channel; (0,0,0) if absent."""
    ch = _CHANNEL_FROM_C.get(channel_c)
    if ch is None or ch not in img.channels():
        return 0, 0, 0
    w, h = img.plane_size(ch)
    return int(w), int(h), int(img.bit_depth(ch))


def plane(img: PixelImage, channel_c: int) -> Optional[np.ndarray]:
    """C-contiguous array for the channel (rows x row-bytes), kept
    alive by the shim's Py_buffer until heif_image_release."""
    ch = _CHANNEL_FROM_C.get(channel_c)
    if ch is None or ch not in img.channels():
        return None
    arr = np.ascontiguousarray(img.np_plane(ch))
    if arr.dtype == np.uint16 and img.bit_depth(ch) <= 8:
        arr = arr.astype(np.uint8)
    return arr


def image_create(width: int, height: int, colorspace_c: int,
                 chroma_c: int) -> PixelImage:
    return PixelImage(width, height,
                      _COLORSPACE_FROM_C.get(colorspace_c,
                                             Colorspace.Undefined),
                      _CHROMA_FROM_C.get(chroma_c, Chroma.Undefined))


def image_set_plane(img: PixelImage, channel_c: int, data: bytes,
                    width: int, height: int, stride: int,
                    bit_depth: int) -> None:
    ch = _CHANNEL_FROM_C.get(channel_c)
    if ch is None:
        raise HeifError.usage(msg="unknown channel")
    dtype = np.uint16 if bit_depth > 8 else np.uint8
    itemsize = np.dtype(dtype).itemsize
    rows = np.frombuffer(data, np.uint8).reshape(height, stride)
    arr = rows[:, :width * itemsize].view(dtype).reshape(height, width)
    img.set_plane(ch, arr.copy(), bit_depth)


def encode(ctx: HeifContext, img: PixelImage, codec: str,
           quality: int) -> int:
    from .api.encoding import EncodingOptions
    opts = EncodingOptions()
    if quality >= 0:
        opts.quality = min(quality, 100)
        if quality == 100:
            opts.lossless = True
    item = ctx.encode_image(img, codec or "hevc", opts)
    ctx.set_primary_item(item)
    return int(item)


def write_to_file(ctx: HeifContext, path: str) -> None:
    ctx.write_to_file(path)


def error_info(exc: BaseException) -> Tuple[int, int, str]:
    """(code, subcode, message) using upstream heif_error_code values."""
    if isinstance(exc, HeifError):
        return int(exc.code), int(exc.subcode), str(exc)
    if isinstance(exc, FileNotFoundError):
        return 1, 0, str(exc)
    return 2, 0, f"{type(exc).__name__}: {exc}"
