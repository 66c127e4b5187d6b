"""Planar pixel image model.

Re-designed equivalent of the reference's HeifPixelImage (reference:
libheif/image/pixelimage.{h,cc} — HeifPixelImage pixelimage.h:60,
ComponentStorage :314-360, ops :277-297).

Differences from the reference, by TPU design:

- Planes are *arrays* (numpy on host or jax.Array on device), not raw
  byte buffers with strides.  XLA owns layout; the reference's aligned
  stride handling does not apply.
- Geometric ops (rotate/mirror/crop/overlay) are jnp ops that fuse
  under jit rather than per-pixel loops.
- Memory budgeting happens at plane-allocation time against
  :class:`MemoryTracker` like the reference's alloc-under-budget.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple, Union

import numpy as np

from ..core.error import HeifError, SubError, DecodeWarning
from ..core.limits import SecurityLimits


class Channel:
    """Channel names (reference: heif_channel, heif_image.h)."""

    Y = "Y"
    Cb = "Cb"
    Cr = "Cr"
    R = "R"
    G = "G"
    B = "B"
    Alpha = "Alpha"
    Interleaved = "interleaved"
    Depth = "depth"
    Disparity = "disparity"
    FilterArray = "filter_array"
    Other = "other"


class Colorspace:
    Undefined = "undefined"
    YCbCr = "YCbCr"
    RGB = "RGB"
    Monochrome = "monochrome"
    Nonvisual = "nonvisual"
    FilterArray = "filter_array"   # CFA mosaic (ref: heif_image.h:110)


class Chroma:
    Undefined = "undefined"
    Monochrome = "monochrome"
    C420 = "420"
    C422 = "422"
    C444 = "444"
    InterleavedRGB = "interleaved RGB"
    InterleavedRGBA = "interleaved RGBA"


class BayerPattern:
    """CFA mosaic pattern: pattern_height×pattern_width grid of channel
    names + per-cell gains (ref: BayerPattern image_description.h:59,
    Box_cpat unc_boxes.h)."""

    def __init__(self, pattern_width: int, pattern_height: int,
                 channels, gains=None):
        self.pattern_width = pattern_width
        self.pattern_height = pattern_height
        self.channels = list(channels)       # row-major, len w*h
        self.gains = list(gains) if gains is not None \
            else [1.0] * (pattern_width * pattern_height)

    @staticmethod
    def rggb():
        return BayerPattern(2, 2, [Channel.R, Channel.G,
                                   Channel.G, Channel.B])


# component type id (cmpd) → channel name (ref: unc_codec.cc
# map_uncompressed_component_to_channel)
COMPONENT_TYPE_TO_CHANNEL = {
    0: Channel.Y,          # monochrome
    1: Channel.Y,
    2: Channel.Cb,
    3: Channel.Cr,
    4: Channel.R,
    5: Channel.G,
    6: Channel.B,
    7: Channel.Alpha,
    8: Channel.Depth,
    9: Channel.Disparity,
    11: Channel.FilterArray,
}


def chroma_subsampling(chroma: str) -> Tuple[int, int]:
    """(horizontal, vertical) subsampling divisors for Cb/Cr
    (ref: common_utils.h chroma_h/v_subsampling)."""
    if chroma == Chroma.C420:
        return 2, 2
    if chroma == Chroma.C422:
        return 2, 1
    return 1, 1


def subsampled_size(width: int, height: int, channel: str,
                    chroma: str) -> Tuple[int, int]:
    """Channel plane size after chroma subsampling, rounding up
    (ref: common_utils.cc get_subsampled_size_h/v with rounding)."""
    if channel in (Channel.Cb, Channel.Cr):
        sh, sv = chroma_subsampling(chroma)
        return (width + sh - 1) // sh, (height + sv - 1) // sv
    return width, height


@dataclass
class PlaneInfo:
    bit_depth: int = 8
    datatype: str = "unsigned"  # unsigned | signed | float | complex


class PixelImage:
    """A planar image: named channel → 2D array (+ per-plane bit depth).

    Arrays may live on host (numpy) or device (jax.Array); jnp ops accept
    either.  Use :meth:`to_numpy`/:meth:`to_device` to force placement.
    """

    def __init__(self, width: int, height: int,
                 colorspace: str = Colorspace.Undefined,
                 chroma: str = Chroma.Undefined,
                 limits: Optional[SecurityLimits] = None):
        self.width = width
        self.height = height
        self.colorspace = colorspace
        self.chroma = chroma
        self.limits = limits or SecurityLimits()
        self.planes: Dict[str, np.ndarray] = {}
        self.plane_info: Dict[str, PlaneInfo] = {}
        self.premultiplied_alpha = False
        self.color_profile_nclx = None   # set by decode pipeline
        self.color_profile_icc: Optional[bytes] = None
        self.warnings: List[DecodeWarning] = []
        # CFA mosaic pattern for FilterArray images: BayerPattern or None
        # (ref: BayerPattern image_description.h:59, cpat unc_boxes.h)
        self.bayer_pattern = None
        # TAI timestamp / content id (sequences aux info)
        self.tai_timestamp = None
        self.gimi_content_id: Optional[str] = None

    # ---------------------------------------------------------------- planes

    @staticmethod
    def _dtype_for(bit_depth: int, datatype: str = "unsigned"):
        if datatype == "float":
            return np.float32 if bit_depth <= 32 else np.float64
        if datatype == "signed":
            return np.int8 if bit_depth <= 8 else (
                np.int16 if bit_depth <= 16 else np.int32)
        return np.uint8 if bit_depth <= 8 else (
            np.uint16 if bit_depth <= 16 else np.uint32)

    def add_plane(self, channel: str, width: Optional[int] = None,
                  height: Optional[int] = None, bit_depth: int = 8,
                  datatype: str = "unsigned") -> None:
        """Allocate a zeroed plane under the security budget
        (ref: HeifPixelImage::add_plane / alloc under memory budget)."""
        if width is None or height is None:
            width, height = subsampled_size(self.width, self.height,
                                            channel, self.chroma)
        self.limits.check_image_size(width, height)
        dtype = self._dtype_for(bit_depth, datatype)
        nbytes = width * height * np.dtype(dtype).itemsize
        self.limits.check_block_size(nbytes, f"plane {channel}")
        self.planes[channel] = np.zeros((height, width), dtype=dtype)
        self.plane_info[channel] = PlaneInfo(bit_depth, datatype)

    def set_plane(self, channel: str, array, bit_depth: Optional[int] = None,
                  datatype: str = "unsigned") -> None:
        if bit_depth is None:
            bit_depth = int(np.dtype(array.dtype).itemsize) * 8
        self.planes[channel] = array
        self.plane_info[channel] = PlaneInfo(bit_depth, datatype)

    def has_channel(self, channel: str) -> bool:
        return channel in self.planes

    def channels(self) -> List[str]:
        return list(self.planes.keys())

    def plane(self, channel: str):
        if channel not in self.planes:
            raise HeifError.usage(SubError.Nonexisting_image_channel_referenced,
                                  f"channel {channel} not present")
        return self.planes[channel]

    def np_plane(self, channel: str) -> np.ndarray:
        return np.asarray(self.plane(channel))

    def bit_depth(self, channel: str) -> int:
        if channel not in self.plane_info:
            raise HeifError.usage(SubError.Nonexisting_image_channel_referenced,
                                  f"channel {channel} not present")
        return self.plane_info[channel].bit_depth

    def plane_size(self, channel: str) -> Tuple[int, int]:
        h, w = self.plane(channel).shape[:2]
        return w, h

    def has_alpha(self) -> bool:
        return (Channel.Alpha in self.planes or
                self.chroma == Chroma.InterleavedRGBA)

    # ------------------------------------------------------------ transforms
    # All implemented with jnp so they fuse into surrounding device programs
    # (ref: pixelimage.h:277-297 rotate_ccw/mirror/crop ops).

    def rotate_ccw(self, degrees: int) -> "PixelImage":
        import jax.numpy as jnp
        if degrees % 360 == 0:
            return self
        k = (degrees // 90) % 4
        w, h = (self.width, self.height) if k % 2 == 0 else (self.height, self.width)
        out = self._like(w, h)
        for ch, arr in self.planes.items():
            out.planes[ch] = jnp.rot90(jnp.asarray(arr), k)
            out.plane_info[ch] = self.plane_info[ch]
        return out

    def mirror(self, direction: str) -> "PixelImage":
        """direction: 'vertical' mirrors left-right (over the vertical
        axis), 'horizontal' mirrors top-bottom — matching Box_imir."""
        import jax.numpy as jnp
        axis = 1 if direction == "vertical" else 0
        out = self._like(self.width, self.height)
        for ch, arr in self.planes.items():
            out.planes[ch] = jnp.flip(jnp.asarray(arr), axis=axis)
            out.plane_info[ch] = self.plane_info[ch]
        return out

    def crop(self, left: int, top: int, width: int, height: int) -> "PixelImage":
        import jax.numpy as jnp
        if left < 0 or top < 0 or left + width > self.width or \
                top + height > self.height:
            raise HeifError.invalid_input(
                SubError.Invalid_clean_aperture,
                f"crop [{left},{top},{width}x{height}] outside image "
                f"{self.width}x{self.height}")
        out = self._like(width, height)
        for ch, arr in self.planes.items():
            sh = 1
            sv = 1
            pw, ph = self.plane(ch).shape[1], self.plane(ch).shape[0]
            if ch in (Channel.Cb, Channel.Cr):
                sh, sv = chroma_subsampling(self.chroma)
            l, t = left // sh, top // sv
            w = (width + sh - 1) // sh
            h = (height + sv - 1) // sv
            out.planes[ch] = jnp.asarray(arr)[t:t + h, l:l + w]
            out.plane_info[ch] = self.plane_info[ch]
        return out

    def scale_nearest(self, new_width: int, new_height: int) -> "PixelImage":
        """Nearest-neighbour scale (ref: pixelimage.cc scale_nearest_neighbor)."""
        import jax.numpy as jnp
        out = self._like(new_width, new_height)
        for ch, arr in self.planes.items():
            a = jnp.asarray(arr)
            ph, pw = a.shape
            tw, th = subsampled_size(new_width, new_height, ch, self.chroma)
            ys = (jnp.arange(th) * ph) // th
            xs = (jnp.arange(tw) * pw) // tw
            out.planes[ch] = a[ys[:, None], xs[None, :]]
            out.plane_info[ch] = self.plane_info[ch]
        return out

    def extend(self, new_width: int, new_height: int,
               mode: str = "edge") -> "PixelImage":
        """Pad to a larger canvas replicating the border (ref:
        pixelimage.cc extend_to_size_with_zero / edge replication)."""
        import jax.numpy as jnp
        out = self._like(new_width, new_height)
        for ch, arr in self.planes.items():
            a = jnp.asarray(arr)
            tw, th = subsampled_size(new_width, new_height, ch, self.chroma)
            pad_y = th - a.shape[0]
            pad_x = tw - a.shape[1]
            out.planes[ch] = jnp.pad(a, ((0, pad_y), (0, pad_x)),
                                     mode=("edge" if mode == "edge" else "constant"))
            out.plane_info[ch] = self.plane_info[ch]
        return out

    def copy_into(self, other: "PixelImage", x0: int, y0: int) -> None:
        """Paste `other` at (x0,y0) — grid tile composition primitive
        (ref: pixelimage.cc copy_image / grid.cc paste).  Host-side
        numpy scatter; the batched TPU grid composition path lives in
        codecs/unc/kernels.py."""
        for ch, arr in other.planes.items():
            if ch not in self.planes:
                continue
            dst = np.asarray(self.planes[ch])
            src = np.asarray(arr)
            sh, sv = 1, 1
            if ch in (Channel.Cb, Channel.Cr):
                sh, sv = chroma_subsampling(self.chroma)
            x, y = x0 // sh, y0 // sv
            h = min(src.shape[0], dst.shape[0] - y)
            w = min(src.shape[1], dst.shape[1] - x)
            dst[y:y + h, x:x + w] = src[:h, :w]
            self.planes[ch] = dst

    def _like(self, width: int, height: int) -> "PixelImage":
        out = PixelImage(width, height, self.colorspace, self.chroma, self.limits)
        out.premultiplied_alpha = self.premultiplied_alpha
        out.color_profile_nclx = self.color_profile_nclx
        out.color_profile_icc = self.color_profile_icc
        out.warnings = list(self.warnings)
        out.bayer_pattern = self.bayer_pattern
        return out

    # ------------------------------------------------------------- placement

    def to_numpy(self) -> "PixelImage":
        for ch in self.planes:
            self.planes[ch] = np.asarray(self.planes[ch])
        return self

    def to_device(self, device=None) -> "PixelImage":
        import jax
        for ch in self.planes:
            self.planes[ch] = jax.device_put(self.planes[ch], device)
        return self

    # ------------------------------------------------------------------ misc

    def add_warning(self, err: HeifError) -> None:
        self.warnings.append(DecodeWarning(err))

    def __repr__(self) -> str:
        chans = ",".join(f"{c}{self.plane_info[c].bit_depth}"
                         for c in self.planes)
        return (f"<PixelImage {self.width}x{self.height} {self.colorspace}/"
                f"{self.chroma} [{chans}]>")
