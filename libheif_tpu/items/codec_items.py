"""Coded-codec image items: hvc1/av01/vvc1/avc1/jpeg/j2k1.

Re-designed equivalents of the reference's per-codec ImageItems
(reference: libheif/image-items/hevc.{h,cc} ImageItem_HEVC hevc.h:34,
avif.{h,cc} ImageItem_AVIF avif.h:36, vvc/avc/jpeg/jpeg2000 items).

Each item resolves its codec configuration box and delegates pixel
decoding to the codec registry (libheif_tpu.codecs.registry) — the
TPU-native replacement for the reference's plugin system (SURVEY.md
§2.4): where the reference dlopens libde265/dav1d, we dispatch to
Pallas/jnp codec cores.
"""

from __future__ import annotations

from typing import Optional, Set

from ..core.error import HeifError, SubError
from ..boxes.codec_cfg import Box_hvcC, Box_av1C, Box_avcC, Box_vvcC, Box_jpgC
from ..boxes.j2k import Box_j2kH
from ..boxes.meta import Box_ispe
from ..image.pixel_image import PixelImage
from ..codecs import registry
from .item import ImageItem, register_item, DecodingOptions


class CodedImageItem(ImageItem):
    """Base for items whose pixels come from a registered codec."""

    compression_format = "unknown"
    config_box_cls = None

    def config_box(self):
        if self.config_box_cls is None:
            return None
        return self.get_property(self.config_box_cls)

    def coded_data(self) -> bytes:
        return self.file.get_item_data(self.item_id)

    def decode_compressed_image(self, options: DecodingOptions,
                                processed_ids: Set[int]) -> PixelImage:
        dec = registry.get_decoder(self.compression_format, options.decoder_id)
        if dec is None:
            raise HeifError.unsupported(
                SubError.Unsupported_codec,
                f"no decoder available for {self.compression_format}")
        ispe = self.get_property(Box_ispe)
        size = (ispe.width, ispe.height) if ispe else None
        return dec.decode_single_image(
            self.config_box(), self.coded_data(),
            declared_size=size,
            limits=self.ctx.limits)


@register_item("hvc1")
class ImageItem_HEVC(CodedImageItem):
    """(ref: hevc.h:34)."""

    compression_format = "hevc"
    config_box_cls = Box_hvcC


@register_item("av01")
class ImageItem_AVIF(CodedImageItem):
    """(ref: avif.h:36)."""

    compression_format = "av1"
    config_box_cls = Box_av1C


@register_item("vvc1")
class ImageItem_VVC(CodedImageItem):
    """(ref: vvc.h:31)."""

    compression_format = "vvc"
    config_box_cls = Box_vvcC


@register_item("avc1")
class ImageItem_AVC(CodedImageItem):
    """(ref: avc.h:34)."""

    compression_format = "avc"
    config_box_cls = Box_avcC


@register_item("jpeg")
class ImageItem_JPEG(CodedImageItem):
    """(ref: jpeg.h:31)."""

    compression_format = "jpeg"
    config_box_cls = Box_jpgC


@register_item("j2k1")
class ImageItem_JPEG2000(CodedImageItem):
    """(ref: jpeg2000.h:33)."""

    compression_format = "jpeg2000"
    config_box_cls = Box_j2kH
