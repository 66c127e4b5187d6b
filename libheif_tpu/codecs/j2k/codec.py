"""Registry adapter for the JPEG 2000 codec core.

Maps J2K codestream components ↔ PixelImage planes and exposes the
codec through the registry the way the reference exposes OpenJPEG
via its plugin table (ref: plugins/decoder_openjpeg.cc:519,
plugins/encoder_openjpeg.cc; jpeg2000_dec.cc Decoder_JPEG2000).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ...core.error import HeifError, SubError
from ...image.pixel_image import Channel, Chroma, Colorspace, PixelImage
from ..registry import Decoder, Encoder, register_decoder, register_encoder
from .decoder import decode_codestream
from .encoder import encode_codestream


def _np_dtype(depth: int):
    return np.uint8 if depth <= 8 else np.uint16


class J2KDecoder_Registry(Decoder):
    """Registry decoder for `j2k1` items."""

    id = "tpu-j2k"
    format = "jpeg2000"
    priority = 100

    def decode_single_image(self, config_box, data: bytes,
                            declared_size=None, limits=None):
        if limits is not None and declared_size:
            limits.check_image_size(*declared_size)
        planes, cs = decode_codestream(data)
        siz = cs.siz
        w = siz.xsiz - siz.xosiz
        h = siz.ysiz - siz.yosiz
        if limits is not None:
            limits.check_image_size(w, h)
        ncomp = len(planes)
        depths = [c.depth for c in siz.comps]

        # channel roles from the j2kH cdef box when present
        alpha_comp = None
        if config_box is not None:
            from ...boxes.j2k import Box_cdef
            for ch in config_box.get_children(Box_cdef):
                for (ci, ty, _asoc) in ch.channels:
                    if ty in (1, 2) and ci < ncomp:
                        alpha_comp = ci

        if ncomp == 1:
            img = PixelImage(w, h, Colorspace.Monochrome, Chroma.Monochrome)
            img.set_plane(Channel.Y, planes[0].astype(_np_dtype(depths[0])),
                          depths[0])
            return img
        sub = [(siz.comps[i].xr, siz.comps[i].yr) for i in range(ncomp)]
        if ncomp >= 3 and sub[0] == sub[1] == sub[2] == (1, 1):
            img = PixelImage(w, h, Colorspace.RGB, Chroma.C444)
            for ch_name, idx in ((Channel.R, 0), (Channel.G, 1),
                                 (Channel.B, 2)):
                img.set_plane(ch_name, planes[idx].astype(
                    _np_dtype(depths[idx])), depths[idx])
            if ncomp >= 4:
                ai = alpha_comp if alpha_comp is not None else 3
                img.set_plane(Channel.Alpha, planes[ai].astype(
                    _np_dtype(depths[ai])), depths[ai])
            return img
        if ncomp >= 3:
            # subsampled: treat as YCbCr
            rel = sub[1]
            chroma = {(1, 1): Chroma.C444, (2, 1): Chroma.C422,
                      (2, 2): Chroma.C420}.get(rel)
            if chroma is None or sub[1] != sub[2] or sub[0] != (1, 1):
                raise HeifError.unsupported(
                    SubError.Unsupported_color_conversion,
                    f"unsupported J2K sampling {sub}")
            img = PixelImage(w, h, Colorspace.YCbCr, chroma)
            for ch_name, idx in ((Channel.Y, 0), (Channel.Cb, 1),
                                 (Channel.Cr, 2)):
                img.set_plane(ch_name, planes[idx].astype(
                    _np_dtype(depths[idx])), depths[idx])
            return img
        raise HeifError.unsupported(
            SubError.Unsupported_color_conversion,
            f"J2K with {ncomp} components")


class J2KEncoder_Registry(Encoder):
    """Registry encoder for `j2k1` items (lossless 5/3 by default,
    9/7 when lossy quality requested)."""

    id = "tpu-j2k"
    format = "jpeg2000"
    priority = 100
    lossy_supported = True
    lossless_supported = True

    def parameters(self):
        return [
            {"name": "quality", "type": "integer", "minimum": 1,
             "maximum": 100, "default": 70},
            {"name": "lossless", "type": "boolean", "default": True},
        ]

    def encode_single_image(self, img: PixelImage, options=None):
        lossless = bool(getattr(options, "lossless", True)) if options \
            else True
        quality = getattr(options, "quality", 70) if options else 70
        from ...boxes.j2k import Box_cdef, Box_j2kH
        from ...boxes.meta import Box_ispe

        if img.has_channel(Channel.Interleaved):
            from ...color import convert_image
            img = convert_image(img, Colorspace.RGB, Chroma.C444)

        cdef = Box_cdef()
        if img.colorspace == Colorspace.Monochrome or \
                (img.has_channel(Channel.Y) and not img.has_channel(Channel.Cb)):
            chans = [Channel.Y]
            cdef.channels = [(0, 0, 1)]
        elif img.colorspace == Colorspace.RGB:
            chans = [Channel.R, Channel.G, Channel.B]
            cdef.set_channels_rgb(False)
        elif img.colorspace == Colorspace.YCbCr:
            chans = [Channel.Y, Channel.Cb, Channel.Cr]
            cdef.channels = [(0, 0, 1), (1, 0, 2), (2, 0, 3)]
            if img.chroma != Chroma.C444:
                from ...color import convert_image
                img = convert_image(img, Colorspace.RGB, Chroma.C444)
                chans = [Channel.R, Channel.G, Channel.B]
                cdef.set_channels_rgb(False)
        else:
            raise HeifError.unsupported(
                SubError.Unsupported_color_conversion,
                f"J2K encode from {img.colorspace}")
        depth = img.bit_depth(chans[0])
        planes = [np.asarray(img.plane(c)).astype(np.int32) for c in chans]
        data = encode_codestream(planes, depth=depth,
                                 reversible=lossless,
                                 quality=quality,
                                 htj2k=self.htj2k)
        j2kh = Box_j2kH()
        j2kh.children.append(cdef)
        return data, j2kh, [(Box_ispe(img.width, img.height), False)]

    htj2k = False


class HTJ2KEncoder_Registry(J2KEncoder_Registry):
    """Registry encoder for the `htj2k` compression format: same j2k1
    container path, HT (15444-15) cleanup-pass block coding.  Reference
    analog: Encoder_HTJ2K (jpeg2000_enc.h:84) backed by OpenJPH
    (plugins/encoder_openjph.cc)."""

    id = "tpu-htj2k"
    format = "htj2k"
    htj2k = True


def _register():
    register_decoder(J2KDecoder_Registry())
    register_encoder(J2KEncoder_Registry())
    register_encoder(HTJ2KEncoder_Registry())
