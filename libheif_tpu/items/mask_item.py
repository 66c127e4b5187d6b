"""mski mask image items (ISO 23008-12 §6.10.2).

Re-designed equivalent of the reference's ImageItem_mask
(reference: libheif/image-items/mask_image.{h,cc} — mask_image.h:84,
Box_mskC parse mask_image.cc:39, decode :88-125).
"""

from __future__ import annotations

from typing import List, Set

import numpy as np

from ..core.bitstream import ByteReader, ByteWriter
from ..core.error import HeifError, SubError
from ..core.limits import SecurityLimits
from ..boxes.box import FullBox, register_box
from ..boxes.meta import Box_ispe
from ..image.pixel_image import PixelImage, Channel, Colorspace, Chroma
from .item import ImageItem, register_item, DecodingOptions


@register_box("mskC")
class Box_mskC(FullBox):
    """Mask configuration (ref: mask_image.cc:33-56)."""

    def __init__(self, bits_per_pixel: int = 8):
        super().__init__()
        self.bits_per_pixel = bits_per_pixel

    def parse_payload(self, r: ByteReader, limits: SecurityLimits, depth=0) -> None:
        self.bits_per_pixel = r.read8()

    def write_payload(self, w: ByteWriter) -> None:
        self.write_full_header(w)
        w.write8(self.bits_per_pixel)

    def dump_fields(self) -> List[str]:
        return [f"bits_per_pixel: {self.bits_per_pixel}"]


@register_item("mski")
class ImageItem_mask(ImageItem):

    def decode_compressed_image(self, options: DecodingOptions,
                                processed_ids: Set[int]) -> PixelImage:
        mskC = self.get_property(Box_mskC)
        ispe = self.get_property(Box_ispe)
        if mskC is None or ispe is None:
            raise HeifError.invalid_input(
                msg="mski item missing mskC/ispe property")
        bpp = mskC.bits_per_pixel
        if bpp not in (8, 16):
            raise HeifError.unsupported(
                SubError.Unsupported_bit_depth,
                f"mask bit depth {bpp} (only 8/16 supported)")
        w, h = ispe.width, ispe.height
        self.ctx.limits.check_image_size(w, h)
        data = self.file.get_item_data(self.item_id)
        nbytes = w * h * (bpp // 8)
        if len(data) < nbytes:
            raise HeifError.eof("mask data too short")
        dt = np.uint8 if bpp == 8 else np.dtype(">u2")
        plane = np.frombuffer(data, dt, w * h).reshape(h, w)
        if bpp == 16:
            plane = plane.astype(np.uint16)
        img = PixelImage(w, h, Colorspace.Monochrome, Chroma.Monochrome,
                         self.ctx.limits)
        img.set_plane(Channel.Y, plane, bpp)
        return img
