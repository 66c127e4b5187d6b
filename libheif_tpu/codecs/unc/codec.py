"""ISO 23001-17 uncompressed codec: decode/encode orchestration.

Re-designed equivalent of the reference's UncompressedImageCodec
(reference: libheif/codecs/uncompressed/unc_codec.{h,cc} —
UncompressedImageCodec unc_codec.h:50, decode_uncompressed_image
unc_codec.h:52, decode_uncompressed_image_tile unc_codec.h:56) plus the
generic-compression handling (cmpC/icef, unc_decoder.cc:200-282).

Host side: layout computation, generic decompression (zlib/deflate/
brotli), tile buffer assembly.  Device side: the batched affine
extraction kernels in kernels.py.
"""

from __future__ import annotations

import zlib
from typing import Dict, List, Optional

import numpy as np

from ...core.error import HeifError, SubError
from ...core.limits import SecurityLimits
from ...boxes.unc import (
    Box_uncC, Box_cmpd, Box_cmpC, Box_icef, CmpdComponent, UncCComponent,
    CompressedUnitType, InterleaveMode, SamplingMode,
)
from ...image.pixel_image import PixelImage, Channel, Colorspace, Chroma
from .layout import compute_layout, UncLayout
from . import kernels

try:
    import brotli  # type: ignore
    _HAS_BROTLI = True
except ImportError:
    try:
        import brotlicffi as brotli  # type: ignore
        _HAS_BROTLI = True
    except ImportError:
        brotli = None
        _HAS_BROTLI = False


def _decompress(method: str, data: bytes) -> bytes:
    """(ref: compression.h:59-114 — zlib/deflate/brotli)."""
    try:
        if method == "zlib":
            return zlib.decompress(data)
        if method == "defl":
            return zlib.decompress(data, -15)
        if method == "brot":
            if not _HAS_BROTLI:
                raise HeifError.unsupported(
                    SubError.Unsupported_generic_compression_method,
                    "brotli not available in this build")
            return brotli.decompress(data)
    except HeifError:
        raise
    except Exception as e:
        raise HeifError.invalid_input(
            SubError.Decompression_invalid_data,
            f"corrupt {method} stream: {e}") from e
    raise HeifError.unsupported(
        SubError.Unsupported_generic_compression_method,
        f"generic compression method {method!r}")


def _compress(method: str, data: bytes) -> bytes:
    if method == "zlib":
        return zlib.compress(data)
    if method == "defl":
        co = zlib.compressobj(wbits=-15)
        return co.compress(data) + co.flush()
    if method == "brot":
        if not _HAS_BROTLI:
            raise HeifError.unsupported(
                SubError.Unsupported_generic_compression_method,
                "brotli not available in this build")
        return brotli.compress(data)
    raise HeifError.unsupported(
        SubError.Unsupported_generic_compression_method,
        f"generic compression method {method!r}")


class UnciDecoder:
    """Decoder for one unci item (built-in pixel codec)."""

    def __init__(self, uncC: Box_uncC, cmpd: Optional[Box_cmpd],
                 width: int, height: int,
                 cmpC: Optional[Box_cmpC] = None,
                 icef: Optional[Box_icef] = None,
                 limits: Optional[SecurityLimits] = None):
        if uncC is None:
            raise HeifError.invalid_input(msg="missing uncC box")
        if cmpd is None and uncC.version == 0:
            raise HeifError.invalid_input(msg="missing cmpd box")
        if cmpd is None:
            # v1 profiles imply a standard cmpd (ref: unc_boxes.cc v1 expansion)
            cmpd = _implied_cmpd_for_profile(uncC)
        self.uncC = uncC
        self.cmpd = cmpd
        self.cmpC = cmpC
        self.icef = icef
        self.limits = limits or SecurityLimits()
        self.limits.check_image_size(width, height)
        self.layout = compute_layout(uncC, cmpd, width, height)
        self.limits.check_tile_count(self.layout.tile_cols, self.layout.tile_rows)

    # ------------------------------------------------------------- decompress

    def _uncompressed_payload(self, data: bytes) -> bytes:
        """Resolve generic compression to the raw sample buffer."""
        if self.cmpC is None:
            return data
        method = self.cmpC.compression_type
        if self.icef is not None and self.icef.unit_infos:
            parts = []
            for u in self.icef.unit_infos:
                if u.unit_offset + u.unit_size > len(data):
                    raise HeifError.eof("icef unit beyond compressed data")
                parts.append(_decompress(
                    method, data[u.unit_offset:u.unit_offset + u.unit_size]))
            return b"".join(parts)
        return _decompress(method, data)

    # ----------------------------------------------------------------- decode

    def decode(self, data) -> PixelImage:
        """Decode the full image (all tiles batched on device)."""
        payload = self._uncompressed_payload(_as_bytes(data))
        tiles = kernels.assemble_tile_buffers(self.layout, payload)
        planes = kernels.decode_tiles(self.layout, tiles)
        return self._to_image(planes, self.layout.width, self.layout.height,
                              full_image=True)

    def decode_tile(self, data, tile_x: int, tile_y: int) -> PixelImage:
        """Random-access decode of a single tile
        (ref: decode_uncompressed_image_tile unc_codec.h:56 +
        tile stride computation unc_decoder_component_interleave.cc:28)."""
        lay = self.layout
        if tile_x >= lay.tile_cols or tile_y >= lay.tile_rows:
            raise HeifError.usage(SubError.Invalid_parameter_value,
                                  f"tile ({tile_x},{tile_y}) out of range")
        idx = tile_y * lay.tile_cols + tile_x
        buf = self._fetch_tile_payload(data, idx)
        tiles = np.zeros((1, buf.shape[0] + kernels._GATHER_PAD), dtype=np.uint8)
        tiles[0, :buf.shape[0]] = buf
        single = UncLayout(
            width=lay.tile_width, height=lay.tile_height,
            tile_cols=1, tile_rows=1,
            tile_width=lay.tile_width, tile_height=lay.tile_height,
            views=lay.views, tile_size_bytes=lay.tile_size_bytes,
            comp_tile_sizes=lay.comp_tile_sizes,
            colorspace=lay.colorspace, chroma=lay.chroma,
            interleave=lay.interleave)
        planes = kernels.decode_tiles(single, tiles)
        return self._to_image(planes, lay.tile_width, lay.tile_height,
                              full_image=False)

    def _fetch_tile_payload(self, data, idx: int) -> np.ndarray:
        """`data` is bytes or a lazy ItemDataView; only this tile's
        byte ranges are read (ref: tile stride computation
        unc_decoder_component_interleave.cc:28)."""
        lay = self.layout
        if self.cmpC is not None:
            unit_type = self.cmpC.compressed_unit_type
            if unit_type == CompressedUnitType.tile and self.icef is not None:
                u = self.icef.unit_infos[idx]
                part = _decompress(self.cmpC.compression_type,
                                   _read_at(data, u.unit_offset, u.unit_size))
                return np.frombuffer(part, dtype=np.uint8)
            # fall back: decompress everything, then slice
            data = self._uncompressed_payload(_as_bytes(data))

        if lay.comp_tile_sizes is not None:
            parts = []
            comp_base = 0
            for sz in lay.comp_tile_sizes:
                start = comp_base + sz * idx
                parts.append(np.frombuffer(_read_at(data, start, sz),
                                           np.uint8))
                comp_base += sz * lay.num_tiles
            return np.concatenate(parts)
        S = lay.tile_size_bytes
        if (idx + 1) * S > len(data):
            raise HeifError.eof("unci tile data out of range")
        return np.frombuffer(_read_at(data, idx * S, S), np.uint8)

    def _to_image(self, planes: Dict[str, np.ndarray], width: int,
                  height: int, full_image: bool) -> PixelImage:
        img = PixelImage(width, height, self.layout.colorspace,
                         self.layout.chroma, self.limits)
        for ch, arr in planes.items():
            depth = max(v.depth for v in self.layout.views
                        if v.channel == ch)
            # clip plane to the subsampled image size (tile grids can
            # overhang for non-divisible chroma at image edges)
            from ...image.pixel_image import subsampled_size
            pw, ph = subsampled_size(width, height, ch, self.layout.chroma)
            img.set_plane(ch, arr[:ph, :pw], depth)
        return img



def _read_at(data, start: int, size: int) -> bytes:
    """Ranged read over bytes or a lazy ItemDataView."""
    if hasattr(data, "read_at"):
        return data.read_at(start, size)
    return bytes(data[start:start + size])


def _as_bytes(data) -> bytes:
    return data.read_all() if hasattr(data, "read_all") else data


def _implied_cmpd_for_profile(uncC: Box_uncC) -> Box_cmpd:
    from ...core.fourcc import fourcc_to_str
    prof = fourcc_to_str(uncC.profile)
    if prof in ("rgb3",):
        types = [4, 5, 6]
    elif prof in ("rgba",):
        types = [4, 5, 6, 7]
    elif prof in ("abgr",):
        types = [7, 6, 5, 4]
    else:
        types = [1, 2, 3]  # YCbCr family
    return Box_cmpd([CmpdComponent(t) for t in types])


# --------------------------------------------------------------------------
# Encoder
# --------------------------------------------------------------------------

_CHANNEL_TO_COMPONENT_TYPE = {
    Channel.Y: 1, Channel.Cb: 2, Channel.Cr: 3,
    Channel.R: 4, Channel.G: 5, Channel.B: 6,
    Channel.Alpha: 7, Channel.Depth: 8, Channel.Disparity: 9,
    Channel.FilterArray: 11,
}
_MONO_COMPONENT_TYPE = 0


class UnciEncoder:
    """unci encoder: component-interleave output
    (ref: unc_encoder_component_interleave.cc; encode path
    unc_image.cc:312 tile-wise append).

    Produces cmpd/uncC property boxes plus the raw sample stream.
    Supports 8/16-bit planes, mono/RGB(A)/YCbCr 444/422/420, tiling,
    and optional generic compression.
    """

    def __init__(self, tile_cols: int = 1, tile_rows: int = 1,
                 compression: Optional[str] = None,
                 compress_per_tile: bool = False):
        self.tile_cols = tile_cols
        self.tile_rows = tile_rows
        self.compression = compression
        self.compress_per_tile = compress_per_tile

    def _channel_order(self, img: PixelImage) -> List[str]:
        if img.colorspace == Colorspace.RGB:
            order = [Channel.R, Channel.G, Channel.B]
        elif img.colorspace == Colorspace.YCbCr:
            order = [Channel.Y, Channel.Cb, Channel.Cr]
        elif img.colorspace == Colorspace.Monochrome:
            order = [Channel.Y]
        else:
            order = [c for c in img.channels() if c != Channel.Alpha]
        if img.has_channel(Channel.Alpha):
            order.append(Channel.Alpha)
        return [c for c in order if img.has_channel(c)]

    def make_boxes(self, img: PixelImage):
        """Build (cmpd, uncC[, cmpC]) for the image."""
        order = self._channel_order(img)
        cmpd = Box_cmpd()
        uncC = Box_uncC()
        for ch in order:
            if img.colorspace == Colorspace.Monochrome and ch == Channel.Y:
                ctype = _MONO_COMPONENT_TYPE
            else:
                ctype = _CHANNEL_TO_COMPONENT_TYPE[ch]
            cmpd.components.append(CmpdComponent(ctype))
            depth = img.bit_depth(ch)
            uncC.components.append(
                UncCComponent(len(cmpd.components) - 1, depth, 0, 0))
        if img.chroma == Chroma.C422:
            uncC.sampling_type = SamplingMode.s422
        elif img.chroma == Chroma.C420:
            uncC.sampling_type = SamplingMode.s420
        uncC.interleave_type = InterleaveMode.component
        uncC.num_tile_cols = self.tile_cols
        uncC.num_tile_rows = self.tile_rows
        return cmpd, uncC

    def encode_tile(self, img: PixelImage) -> bytes:
        """Serialize one tile's planes in component-interleave order,
        big-endian samples, rows byte-aligned."""
        order = self._channel_order(img)
        parts = []
        for ch in order:
            arr = np.asarray(img.plane(ch))
            depth = img.bit_depth(ch)
            if depth <= 8:
                parts.append(np.ascontiguousarray(arr.astype(np.uint8)).tobytes())
            else:
                parts.append(np.ascontiguousarray(
                    arr.astype(">u2")).tobytes())
        return b"".join(parts)

    def encode(self, img: PixelImage):
        """Encode a full (possibly tiled) image.

        Returns (data, cmpd, uncC, cmpC, icef) — compression boxes are
        None when no generic compression is requested.
        """
        cmpd, uncC = self.make_boxes(img)
        tw = img.width // self.tile_cols
        th = img.height // self.tile_rows
        if tw * self.tile_cols != img.width or th * self.tile_rows != img.height:
            raise HeifError.usage(SubError.Invalid_parameter_value,
                                  "image size not divisible by tile grid")
        tiles = []
        for ty in range(self.tile_rows):
            for tx in range(self.tile_cols):
                tile_img = img.crop(tx * tw, ty * th, tw, th)
                tiles.append(self.encode_tile(tile_img))

        cmpC = icef = None
        if self.compression:
            cmpC = Box_cmpC()
            cmpC.compression_type = self.compression
            if self.compress_per_tile and len(tiles) > 1:
                cmpC.compressed_unit_type = CompressedUnitType.tile
                icef = Box_icef()
                comp_tiles = [_compress(self.compression, t) for t in tiles]
                from ...boxes.unc import CompressedUnitInfo
                off = 0
                for c in comp_tiles:
                    icef.unit_infos.append(CompressedUnitInfo(off, len(c)))
                    off += len(c)
                data = b"".join(comp_tiles)
            else:
                cmpC.compressed_unit_type = CompressedUnitType.whole_image
                data = _compress(self.compression, b"".join(tiles))
        else:
            data = b"".join(tiles)
        return data, cmpd, uncC, cmpC, icef
