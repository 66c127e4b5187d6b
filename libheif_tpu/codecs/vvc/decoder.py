"""VVC still-image decoder: glue from vvcC+NALs to PixelImage.

Replaces the reference's vvdec plugin boundary (ref:
libheif/plugins/decoder_vvdec.cc:449, libheif/codecs/vvc_dec.cc).
Decodes the intra toolset described in tables.py; streams using
other VVC tools raise Unsupported_codec (mirroring the reference's
behavior when no VVC plugin is compiled in).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from ...core.error import HeifError, SubError
from ...boxes.codec_cfg import remove_emulation_prevention
from ...image.pixel_image import PixelImage, Channel, Colorspace, Chroma
from ..registry import Decoder, register_decoder
from ..hevc.decoder import split_length_prefixed
from . import headers as H
from .cabac import ContextModels, CabacDecoder
from .ctu import SyntaxIO, SliceCoder
from .recon import PictureRecon, chroma_qp_from_luma


def decode_intra_picture(sps: H.SPS, pps: H.PPS, slice_nal: bytes
                         ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    if sps.chroma_format_idc != 1:
        raise HeifError.unsupported(SubError.Unsupported_codec,
                                    "only 4:2:0 VVC supported")
    if sps.bit_depth not in (8, 10):
        raise HeifError.unsupported(SubError.Unsupported_bit_depth,
                                    "only 8/10-bit VVC supported")
    sh = H.parse_slice_header(slice_nal, sps, {pps.pps_id: pps})
    rbsp = remove_emulation_prevention(slice_nal[2:])

    ctx = ContextModels(sh.qp)
    dec = CabacDecoder(rbsp, sh.data_offset_bits // 8, len(rbsp), ctx)
    io = SyntaxIO(ctx, dec=dec)
    coder = SliceCoder(sps, pps, sh, io)
    cus = coder.run()

    recon = PictureRecon(sps.pic_width, sps.pic_height, sps.bit_depth)
    cqp = chroma_qp_from_luma(sh.qp)
    for cu in cus:
        recon.reconstruct_cu_luma(cu, sh.qp)
        recon.reconstruct_tb(cu.x, cu.y, cu.log2w - 1, cu.log2h - 1, 1,
                             cu.chroma_mode, cu.coeffs_cb, cqp)
        recon.reconstruct_tb(cu.x, cu.y, cu.log2w - 1, cu.log2h - 1, 2,
                             cu.chroma_mode, cu.coeffs_cr, cqp)
    return tuple(recon.planes)


class VvcDecoder(Decoder):
    id = "tpu-vvc"
    format = "vvc"
    priority = 100

    def decode_single_image(self, config_box, data: bytes,
                            declared_size=None, limits=None) -> PixelImage:
        if config_box is None:
            raise HeifError.invalid_input(SubError.No_vvcC_box)
        sps = pps = None
        nals = list(config_box.get_header_nals())
        nals += split_length_prefixed(data, config_box.length_size)
        slices = []
        for nal in nals:
            t = H.nal_type(nal)
            if t == H.NAL_SPS:
                sps = H.parse_sps(nal)
            elif t == H.NAL_PPS:
                pps = H.parse_pps(nal)
            elif H.is_slice(t):
                slices.append(nal)
        if sps is None or pps is None:
            raise HeifError.invalid_input(SubError.No_vvcC_box,
                                          "missing VVC SPS/PPS")
        if not slices:
            raise HeifError.invalid_input(msg="no VVC slice NAL")
        if len(slices) != 1:
            raise HeifError.unsupported(SubError.Unsupported_codec,
                                        "multi-slice VVC pictures")
        if limits is not None:
            limits.check_image_size(sps.pic_width, sps.pic_height)
            if declared_size is not None:
                dw, dh = declared_size
                if sps.pic_width * sps.pic_height > \
                        max(4 * dw * dh, dw * dh + (1 << 16)):
                    raise HeifError.security(
                        "coded size much larger than declared size")

        y, cb, cr = decode_intra_picture(sps, pps, slices[0])

        w, h = sps.cropped_size
        l, _, t, _ = sps.conf_win
        y = y[2 * t:2 * t + h, 2 * l:2 * l + w]
        cb = cb[t:t + (h + 1) // 2, l:l + (w + 1) // 2]
        cr = cr[t:t + (h + 1) // 2, l:l + (w + 1) // 2]

        dt = np.uint8 if sps.bit_depth <= 8 else np.uint16
        img = PixelImage(w, h, Colorspace.YCbCr, Chroma.C420, limits)
        img.set_plane(Channel.Y, y.astype(dt), sps.bit_depth)
        img.set_plane(Channel.Cb, cb.astype(dt), sps.bit_depth)
        img.set_plane(Channel.Cr, cr.astype(dt), sps.bit_depth)
        return img


def register():
    register_decoder(VvcDecoder())
