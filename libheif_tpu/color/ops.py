"""Color conversion operations as fused jnp programs.

Re-designed equivalent of the reference's conversion op set (reference:
libheif/color-conversion/ — yuv2rgb.cc, rgb2yuv.cc, chroma_sampling.cc,
monochrome.cc, alpha.cc, hdr_sdr.cc, rgb2rgb.cc; op registry
colorconversion.cc:225-269).

Each op declares the state transition it performs and applies it with
jnp ops on whole planes: matrix conversions and resampling are a few
elementwise/conv ops that XLA fuses into one kernel, replacing the
reference's per-pixel C++ loops.  Arithmetic is float32 with
round-half-away rounding and clipping, matching the reference's
behavior for the lossy conversions.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from ..core.error import HeifError, SubError
from ..image.pixel_image import PixelImage, Channel, Colorspace, Chroma
from .nclx import get_kr_kb
from .state import ColorState


class ColorConversionOptions:
    """(ref: heif_color_conversion_options, heif_color.h)."""

    NEAREST = "nearest-neighbor"
    BILINEAR = "bilinear"
    AVERAGE = "average"
    SHARP_YUV = "sharp-yuv"

    # alpha composition modes (ref: heif_alpha_composition_mode,
    # heif_color.h:74)
    ALPHA_NONE = "none"
    ALPHA_SOLID = "solid-color"
    ALPHA_CHECKERBOARD = "checkerboard"

    def __init__(self, chroma_upsampling: str = BILINEAR,
                 chroma_downsampling: str = AVERAGE,
                 alpha_composition_mode: str = ALPHA_NONE,
                 background_rgb=(0xFFFF, 0xFFFF, 0xFFFF),
                 secondary_background_rgb=(0x6666, 0x6666, 0x6666),
                 checkerboard_square_size: int = 16):
        self.chroma_upsampling = chroma_upsampling
        self.chroma_downsampling = chroma_downsampling
        self.alpha_composition_mode = alpha_composition_mode
        self.background_rgb = background_rgb
        self.secondary_background_rgb = secondary_background_rgb
        self.checkerboard_square_size = checkerboard_square_size


def _jnp():
    import jax.numpy as jnp
    return jnp


def _round_clip(x, maxval):
    jnp = _jnp()
    return jnp.clip(jnp.round(x), 0, maxval)


def _out_dtype(bits: int):
    return np.uint8 if bits <= 8 else np.uint16


def _upsample(plane, out_h, out_w, method: str):
    """Chroma upsampling to (out_h, out_w) (ref: chroma up in
    yuv2rgb.cc / chroma_sampling.cc)."""
    jnp = _jnp()
    a = jnp.asarray(plane)
    h, w = a.shape
    if method == ColorConversionOptions.NEAREST or (h == out_h and w == out_w):
        ys = (jnp.arange(out_h) * h) // out_h
        xs = (jnp.arange(out_w) * w) // out_w
        return a[ys[:, None], xs[None, :]]
    # bilinear: 2x kernels (3a+b)/4 at half-pel positions
    af = a.astype(jnp.float32)
    if out_w == 2 * w or (out_w == 2 * w - 1) or (w * 2 - out_w in (0, 1)):
        left = jnp.concatenate([af[:, :1], af[:, :-1]], axis=1)
        right = jnp.concatenate([af[:, 1:], af[:, -1:]], axis=1)
        even = (3 * af + left) / 4
        odd = (3 * af + right) / 4
        up = jnp.stack([even, odd], axis=-1).reshape(h, 2 * w)
        af = up[:, :out_w]
    elif out_w != w:
        xs = (jnp.arange(out_w) * w) // out_w
        af = af[:, xs]
    h2 = af.shape[0]
    if out_h == 2 * h2 or (2 * h2 - out_h in (0, 1)):
        top = jnp.concatenate([af[:1], af[:-1]], axis=0)
        bottom = jnp.concatenate([af[1:], af[-1:]], axis=0)
        even = (3 * af + top) / 4
        odd = (3 * af + bottom) / 4
        up = jnp.stack([even, odd], axis=1).reshape(2 * h2, af.shape[1])
        af = up[:out_h]
    elif out_h != h2:
        ys = (jnp.arange(out_h) * h2) // out_h
        af = af[ys]
    return af


def _downsample(plane_f32, factor_x: int, factor_y: int, method: str):
    """Chroma downsampling by integer factors (average or nearest)."""
    jnp = _jnp()
    a = plane_f32
    h, w = a.shape
    if factor_x == 1 and factor_y == 1:
        return a
    if method == ColorConversionOptions.NEAREST:
        return a[::factor_y, ::factor_x]
    # average with edge padding to multiples
    ph = (-h) % factor_y
    pw = (-w) % factor_x
    if ph or pw:
        a = jnp.pad(a, ((0, ph), (0, pw)), mode="edge")
    hh, ww = a.shape
    a = a.reshape(hh // factor_y, factor_y, ww // factor_x, factor_x)
    return a.mean(axis=(1, 3))


def _sharp_downsample(plane_f32, th: int, tw: int, iters: int = 4):
    """'Sharp' chroma downsampling (ref: rgb2yuv_sharp.cc, which wraps
    libsharpyuv).  Instead of plain averaging, solve the least-squares
    problem min ‖upsample(C_sub) − C‖² with a Richardson iteration so
    the *reconstructed* (bilinear-upsampled) chroma matches the source
    as closely as possible — the same objective sharpyuv optimises.
    Pure jnp: each iteration is an upsample + residual + average, which
    XLA fuses into one program."""
    jnp = _jnp()
    a = plane_f32
    h, w = a.shape
    fx = max(1, round(w / tw))
    fy = max(1, round(h / th))
    sub = _downsample(a, fx, fy, ColorConversionOptions.AVERAGE)[:th, :tw]
    for _ in range(iters):
        up = _upsample(sub, h, w, ColorConversionOptions.BILINEAR)
        err = a - up
        sub = sub + _downsample(err, fx, fy,
                                ColorConversionOptions.AVERAGE)[:th, :tw]
    return sub


class ColorOp:
    """Base op (ref: ColorConversionOperation colorconversion.h:78)."""

    cost = 4

    def enabled(self, options: Optional[ColorConversionOptions]) -> bool:
        """Whether this op participates in pipeline search under the
        given conversion options."""
        return True

    def output_state(self, inp: ColorState,
                     target: ColorState) -> Optional[ColorState]:
        raise NotImplementedError

    def apply(self, img: PixelImage, inp: ColorState, outp: ColorState,
              options: ColorConversionOptions) -> PixelImage:
        raise NotImplementedError

    def _base_output(self, img: PixelImage, outp: ColorState) -> PixelImage:
        out = PixelImage(img.width, img.height, outp.colorspace, outp.chroma,
                         img.limits)
        out.premultiplied_alpha = img.premultiplied_alpha
        out.color_profile_nclx = img.color_profile_nclx
        out.color_profile_icc = img.color_profile_icc
        out.warnings = list(img.warnings)
        return out


class YCbCrToRGB(ColorOp):
    """(ref: yuv2rgb.cc Op_YCbCr_to_RGB)."""

    cost = 6

    def output_state(self, inp, target):
        if inp.colorspace != Colorspace.YCbCr:
            return None
        if target.colorspace not in (Colorspace.RGB, Colorspace.Undefined):
            return None
        return inp.with_(colorspace=Colorspace.RGB, chroma=Chroma.C444,
                         matrix_coefficients=0, full_range=True)

    def apply(self, img, inp, outp, options):
        jnp = _jnp()
        bits = inp.bits_per_pixel
        maxval = (1 << bits) - 1

        fast = self._apply_pallas(img, inp, outp, options)
        if fast is not None:
            return fast

        y = jnp.asarray(img.plane(Channel.Y)).astype(jnp.float32)
        h, w = y.shape

        if img.has_channel(Channel.Cb):
            cb = _upsample(img.plane(Channel.Cb), h, w,
                           options.chroma_upsampling)
            cr = _upsample(img.plane(Channel.Cr), h, w,
                           options.chroma_upsampling)
            cb = cb.astype(jnp.float32)
            cr = cr.astype(jnp.float32)
        else:
            cb = cr = jnp.full((h, w), float(1 << (bits - 1)), jnp.float32)

        if inp.matrix_coefficients == 0:
            # identity: GBR (ref: yuv2rgb identity path)
            r, g, b = cr, y, cb
        else:
            kr, kb = get_kr_kb(inp.matrix_coefficients, inp.color_primaries)
            half = float(1 << (bits - 1))
            if inp.full_range:
                yf = y
                scale_c = 1.0
            else:
                yf = (y - (16 << (bits - 8))) * (255.0 / 219.0)
                scale_c = 255.0 / 224.0
            cbf = (cb - half) * scale_c
            crf = (cr - half) * scale_c
            r = yf + 2 * (1 - kr) * crf
            b = yf + 2 * (1 - kb) * cbf
            g = (yf - kr * r - kb * b) / (1 - kr - kb)

        out = self._base_output(img, outp)
        dt = _out_dtype(bits)
        out.set_plane(Channel.R, _round_clip(r, maxval).astype(dt), bits)
        out.set_plane(Channel.G, _round_clip(g, maxval).astype(dt), bits)
        out.set_plane(Channel.B, _round_clip(b, maxval).astype(dt), bits)
        if img.has_channel(Channel.Alpha):
            out.set_plane(Channel.Alpha, img.plane(Channel.Alpha),
                          img.bit_depth(Channel.Alpha))
        return out


    # force True/False in tests; None = auto (TPU backend only)
    USE_PALLAS = None

    def _apply_pallas(self, img, inp, outp, options):
        """TPU fast path: one fused Pallas program for upsample-exact
        chroma + H.273 matrix + pack (pallas_fast.ycbcr8_planes_to_rgb).
        Returns None when the layout is outside the kernel's envelope;
        output matches the jnp path within 1 LSB (compiler FMA
        ordering), exactly in interpret mode."""
        use = YCbCrToRGB.USE_PALLAS
        if use is None:
            import jax
            use = jax.default_backend() == "tpu"
        if not use:
            return None
        if (inp.bits_per_pixel != 8 or inp.matrix_coefficients == 0
                or not img.has_channel(Channel.Cb)):
            return None
        if options.chroma_upsampling not in (
                ColorConversionOptions.BILINEAR,
                ColorConversionOptions.NEAREST):
            return None
        jnp = _jnp()
        from ..codecs.unc import pallas_fast
        kr, kb = get_kr_kb(inp.matrix_coefficients, inp.color_primaries)
        import jax
        interpret = jax.default_backend() != "tpu"
        rgb = pallas_fast.ycbcr8_planes_to_rgb(
            jnp.asarray(img.plane(Channel.Y)),
            jnp.asarray(img.plane(Channel.Cb)),
            jnp.asarray(img.plane(Channel.Cr)),
            kr=float(kr), kb=float(kb), full_range=bool(inp.full_range),
            upsampling=options.chroma_upsampling, interpret=interpret)
        out = self._base_output(img, outp)
        out.set_plane(Channel.R, rgb[0], 8)
        out.set_plane(Channel.G, rgb[1], 8)
        out.set_plane(Channel.B, rgb[2], 8)
        if img.has_channel(Channel.Alpha):
            out.set_plane(Channel.Alpha, img.plane(Channel.Alpha),
                          img.bit_depth(Channel.Alpha))
        return out


class RGBToYCbCr(ColorOp):
    """(ref: rgb2yuv.cc Op_RGB_to_YCbCr)."""

    cost = 6

    def output_state(self, inp, target):
        if inp.colorspace != Colorspace.RGB or inp.chroma not in (
                Chroma.C444, Chroma.Undefined):
            return None
        if target.colorspace not in (Colorspace.YCbCr, Colorspace.Undefined):
            return None
        chroma = target.chroma if target.chroma in (
            Chroma.C420, Chroma.C422, Chroma.C444) else Chroma.C420
        mc = target.matrix_coefficients or 6
        return inp.with_(colorspace=Colorspace.YCbCr, chroma=chroma,
                         matrix_coefficients=mc,
                         full_range=target.full_range)

    def apply(self, img, inp, outp, options):
        jnp = _jnp()
        bits = inp.bits_per_pixel
        maxval = (1 << bits) - 1
        r = jnp.asarray(img.plane(Channel.R)).astype(jnp.float32)
        g = jnp.asarray(img.plane(Channel.G)).astype(jnp.float32)
        b = jnp.asarray(img.plane(Channel.B)).astype(jnp.float32)

        kr, kb = get_kr_kb(outp.matrix_coefficients, outp.color_primaries)
        yf = kr * r + (1 - kr - kb) * g + kb * b
        cbf = (b - yf) / (2 * (1 - kb))
        crf = (r - yf) / (2 * (1 - kr))
        half = float(1 << (bits - 1))
        if outp.full_range:
            y = yf
            cb = cbf + half
            cr = crf + half
        else:
            y = yf * (219.0 / 255.0) + (16 << (bits - 8))
            cb = cbf * (224.0 / 255.0) + half
            cr = crf * (224.0 / 255.0) + half

        fx = 2 if outp.chroma in (Chroma.C420, Chroma.C422) else 1
        fy = 2 if outp.chroma == Chroma.C420 else 1
        cb = _downsample(cb, fx, fy, options.chroma_downsampling)
        cr = _downsample(cr, fx, fy, options.chroma_downsampling)

        out = self._base_output(img, outp)
        dt = _out_dtype(bits)
        out.set_plane(Channel.Y, _round_clip(y, maxval).astype(dt), bits)
        out.set_plane(Channel.Cb, _round_clip(cb, maxval).astype(dt), bits)
        out.set_plane(Channel.Cr, _round_clip(cr, maxval).astype(dt), bits)
        if img.has_channel(Channel.Alpha):
            out.set_plane(Channel.Alpha, img.plane(Channel.Alpha),
                          img.bit_depth(Channel.Alpha))
        return out


class MonoToRGB(ColorOp):
    """(ref: monochrome.cc Op_mono_to_RGB24_32)."""

    cost = 2

    def output_state(self, inp, target):
        if inp.colorspace != Colorspace.Monochrome:
            return None
        if target.colorspace not in (Colorspace.RGB, Colorspace.Undefined):
            return None
        return inp.with_(colorspace=Colorspace.RGB, chroma=Chroma.C444)

    def apply(self, img, inp, outp, options):
        out = self._base_output(img, outp)
        y = img.plane(Channel.Y)
        bits = img.bit_depth(Channel.Y)
        for ch in (Channel.R, Channel.G, Channel.B):
            out.set_plane(ch, y, bits)
        if img.has_channel(Channel.Alpha):
            out.set_plane(Channel.Alpha, img.plane(Channel.Alpha),
                          img.bit_depth(Channel.Alpha))
        return out


class MonoToYCbCr(ColorOp):
    """(ref: monochrome.cc Op_mono_to_YCbCr420)."""

    cost = 2

    def output_state(self, inp, target):
        if inp.colorspace != Colorspace.Monochrome:
            return None
        if target.colorspace != Colorspace.YCbCr:
            return None
        chroma = target.chroma if target.chroma in (
            Chroma.C420, Chroma.C422, Chroma.C444) else Chroma.C420
        return inp.with_(colorspace=Colorspace.YCbCr, chroma=chroma)

    def apply(self, img, inp, outp, options):
        jnp = _jnp()
        out = self._base_output(img, outp)
        y = img.plane(Channel.Y)
        bits = img.bit_depth(Channel.Y)
        out.set_plane(Channel.Y, y, bits)
        from ..image.pixel_image import subsampled_size
        cw, chh = subsampled_size(img.width, img.height, Channel.Cb,
                                  outp.chroma)
        neutral = 1 << (bits - 1)
        dt = _out_dtype(bits)
        c = jnp.full((chh, cw), neutral, dtype=dt)
        out.set_plane(Channel.Cb, c, bits)
        out.set_plane(Channel.Cr, c, bits)
        if img.has_channel(Channel.Alpha):
            out.set_plane(Channel.Alpha, img.plane(Channel.Alpha),
                          img.bit_depth(Channel.Alpha))
        return out


class ChromaResample(ColorOp):
    """YCbCr chroma format change (ref: chroma_sampling.cc ops)."""

    cost = 4

    def output_state(self, inp, target):
        if inp.colorspace != Colorspace.YCbCr:
            return None
        if target.colorspace not in (Colorspace.YCbCr, Colorspace.Undefined):
            return None
        if target.chroma in (Chroma.Undefined, inp.chroma) or \
                target.chroma not in (Chroma.C420, Chroma.C422, Chroma.C444):
            return None
        return inp.with_(chroma=target.chroma)

    def apply(self, img, inp, outp, options):
        jnp = _jnp()
        from ..image.pixel_image import subsampled_size
        out = self._base_output(img, outp)
        bits = img.bit_depth(Channel.Y)
        maxval = (1 << bits) - 1
        dt = _out_dtype(bits)
        out.set_plane(Channel.Y, img.plane(Channel.Y), bits)
        tw, th = subsampled_size(img.width, img.height, Channel.Cb,
                                 outp.chroma)
        for ch in (Channel.Cb, Channel.Cr):
            a = jnp.asarray(img.plane(ch))
            h, w = a.shape
            if tw >= w and th >= h:
                res = _upsample(a, th, tw, options.chroma_upsampling)
            elif options.chroma_downsampling == \
                    ColorConversionOptions.SHARP_YUV:
                res = _sharp_downsample(a.astype(jnp.float32), th, tw)
            else:
                fx = max(1, round(w / tw))
                fy = max(1, round(h / th))
                res = _downsample(a.astype(jnp.float32), fx, fy,
                                  options.chroma_downsampling)[:th, :tw]
            out.set_plane(ch, _round_clip(res, maxval).astype(dt), bits)
        if img.has_channel(Channel.Alpha):
            out.set_plane(Channel.Alpha, img.plane(Channel.Alpha),
                          img.bit_depth(Channel.Alpha))
        return out


class BitDepthConvert(ColorOp):
    """Scale all planes to a different bit depth (ref: hdr_sdr.cc
    Op_to_sdr_planes / Op_to_hdr_planes)."""

    cost = 2

    def output_state(self, inp, target):
        if not target.bits_per_pixel or \
                target.bits_per_pixel == inp.bits_per_pixel:
            return None
        if inp.colorspace == Colorspace.Undefined:
            return None
        return inp.with_(bits_per_pixel=target.bits_per_pixel)

    def apply(self, img, inp, outp, options):
        jnp = _jnp()
        out = self._base_output(img, outp)
        tbits = outp.bits_per_pixel
        dt = _out_dtype(tbits)
        for ch in img.channels():
            a = jnp.asarray(img.plane(ch))
            sbits = img.bit_depth(ch)
            if sbits == tbits:
                out.set_plane(ch, a, tbits)
            elif sbits > tbits:
                shift = sbits - tbits
                v = (a.astype(jnp.uint32) + (1 << (shift - 1))) >> shift
                v = jnp.minimum(v, (1 << tbits) - 1)
                out.set_plane(ch, v.astype(dt), tbits)
            else:
                shift = tbits - sbits
                a32 = a.astype(jnp.uint32)
                # bit replication to fill the new LSBs
                v = a32 << shift
                fill = shift
                src = sbits
                while fill > 0:
                    take = min(src, fill)
                    v = v | ((a32 >> (src - take)) << (fill - take))
                    fill -= take
                out.set_plane(ch, v.astype(dt), tbits)
        return out


class DropAlpha(ColorOp):
    """(ref: alpha.cc Op_drop_alpha_plane)."""

    cost = 1

    def enabled(self, options):
        # when a composition mode is requested, FlattenAlpha takes over
        return options is None or options.alpha_composition_mode == \
            ColorConversionOptions.ALPHA_NONE

    def output_state(self, inp, target):
        if not inp.has_alpha or target.has_alpha:
            return None
        return inp.with_(has_alpha=False)

    def apply(self, img, inp, outp, options):
        out = self._base_output(img, outp)
        for ch in img.channels():
            if ch != Channel.Alpha:
                out.set_plane(ch, img.plane(ch), img.bit_depth(ch))
        return out


class FlattenAlpha(ColorOp):
    """Composite the alpha plane over a background and drop it
    (ref: alpha.cc Op_flatten_alpha_plane): solid-color or
    checkerboard composition, RGB 4:4:4 input.

    out = (c*a + bkg*(a_max - a)) >> alpha_bits, with the 16-bit
    background reference scaled to the image bit depth."""

    cost = 2

    def enabled(self, options):
        return options is not None and options.alpha_composition_mode != \
            ColorConversionOptions.ALPHA_NONE

    def output_state(self, inp, target):
        if not inp.has_alpha or target.has_alpha:
            return None
        if inp.colorspace != Colorspace.RGB or inp.chroma != Chroma.C444:
            return None
        return inp.with_(has_alpha=False)

    def apply(self, img, inp, outp, options):
        jnp = _jnp()
        bits = img.bit_depth(Channel.R)
        abits = img.bit_depth(Channel.Alpha)
        amax = (1 << abits) - 1
        a = jnp.asarray(img.plane(Channel.Alpha)).astype(jnp.int64)
        h, w = a.shape
        checker = (options.alpha_composition_mode ==
                   ColorConversionOptions.ALPHA_CHECKERBOARD and
                   options.checkerboard_square_size > 0)
        if checker:
            s = options.checkerboard_square_size
            yy = jnp.arange(h)[:, None] // s
            xx = jnp.arange(w)[None, :] // s
            parity = (yy + xx) & 1
        out = self._base_output(img, outp)
        dt = _out_dtype(bits)
        for i, ch in enumerate((Channel.R, Channel.G, Channel.B)):
            c = jnp.asarray(img.plane(ch)).astype(jnp.int64)
            bkg = options.background_rgb[i] >> (16 - bits)
            if checker:
                bkg2 = options.secondary_background_rgb[i] >> (16 - bits)
                # parity-0 (top-left) square gets the SECONDARY
                # background (ref: alpha.cc `bkg = parity ? bkg1 : bkg2`)
                bkg = jnp.where(parity == 0, bkg2, bkg)
            res = (c * a + bkg * (amax - a)) >> abits
            out.set_plane(ch, np.asarray(res).astype(dt), bits)
        return out


class AddAlpha(ColorOp):
    """Add an opaque alpha plane (ref: alpha.cc)."""

    cost = 1

    def output_state(self, inp, target):
        if inp.has_alpha or not target.has_alpha:
            return None
        if inp.colorspace == Colorspace.Undefined:
            return None
        return inp.with_(has_alpha=True)

    def apply(self, img, inp, outp, options):
        jnp = _jnp()
        out = self._base_output(img, outp)
        for ch in img.channels():
            out.set_plane(ch, img.plane(ch), img.bit_depth(ch))
        bits = inp.bits_per_pixel
        dt = _out_dtype(bits)
        out.set_plane(Channel.Alpha,
                      jnp.full((img.height, img.width), (1 << bits) - 1,
                               dtype=dt), bits)
        return out


class RGBToMono(ColorOp):
    """RGB → monochrome via luma (used for mask/aux encode paths)."""

    cost = 6

    def output_state(self, inp, target):
        if inp.colorspace != Colorspace.RGB:
            return None
        if target.colorspace != Colorspace.Monochrome:
            return None
        return inp.with_(colorspace=Colorspace.Monochrome,
                         chroma=Chroma.Monochrome)

    def apply(self, img, inp, outp, options):
        jnp = _jnp()
        bits = inp.bits_per_pixel
        maxval = (1 << bits) - 1
        r = jnp.asarray(img.plane(Channel.R)).astype(jnp.float32)
        g = jnp.asarray(img.plane(Channel.G)).astype(jnp.float32)
        b = jnp.asarray(img.plane(Channel.B)).astype(jnp.float32)
        kr, kb = get_kr_kb(6, inp.color_primaries)
        y = kr * r + (1 - kr - kb) * g + kb * b
        out = self._base_output(img, outp)
        out.set_plane(Channel.Y, _round_clip(y, maxval).astype(_out_dtype(bits)),
                      bits)
        if img.has_channel(Channel.Alpha):
            out.set_plane(Channel.Alpha, img.plane(Channel.Alpha),
                          img.bit_depth(Channel.Alpha))
        return out


class BayerToRGB(ColorOp):
    """CFA mosaic → RGB bilinear demosaic (ref: bayer_bilinear.cc
    Op_bayer_bilinear_to_RGB24_32).

    The reference averages, for each pixel and missing channel, every
    same-channel neighbour within a (2·ph−1)×(2·pw−1) window with equal
    weights, passing native cells through unchanged
    (bayer_bilinear.cc:139-175 neighbour-offset tables).  The TPU
    formulation: per-channel 0/1 masks tiled from the pattern, then two
    box convolutions — conv(plane·mask)/conv(mask) — and a select on
    the mask.  Border pixels average only in-image neighbours (the
    zero-padded convolution drops outside taps)."""

    cost = 11   # SpeedCosts_Unoptimized in the reference

    def output_state(self, inp, target):
        if inp.colorspace != Colorspace.FilterArray:
            return None
        if target.colorspace not in (Colorspace.RGB, Colorspace.Undefined):
            return None
        return inp.with_(colorspace=Colorspace.RGB, chroma=Chroma.C444)

    def apply(self, img, inp, outp, options):
        jnp = _jnp()
        import jax
        pattern = img.bayer_pattern
        if pattern is None:
            raise HeifError.invalid_input(
                SubError.Unspecified,
                "filter-array image carries no CFA pattern (cpat)")
        ph, pw = pattern.pattern_height, pattern.pattern_width
        cells = pattern.channels
        if any(c not in (Channel.R, Channel.G, Channel.B) for c in cells):
            raise HeifError.unsupported(
                SubError.Unsupported_data_version,
                "Bayer pattern contains component types that we "
                "currently cannot convert to RGB")
        bits = img.bit_depth(Channel.FilterArray)
        maxval = (1 << bits) - 1
        a = jnp.asarray(img.plane(Channel.FilterArray)).astype(jnp.float32)
        h, w = a.shape
        # tile per-channel masks over the image
        yy = jnp.arange(h) % ph
        xx = jnp.arange(w) % pw
        cell_idx = yy[:, None] * pw + xx[None, :]
        cell_ch = jnp.asarray(
            [{Channel.R: 0, Channel.G: 1, Channel.B: 2}[c]
             for c in cells], dtype=jnp.int32)
        pix_ch = cell_ch[cell_idx]                      # (h, w) in {0,1,2}

        kh, kw = 2 * ph - 1, 2 * pw - 1
        kernel = jnp.ones((1, 1, kh, kw), jnp.float32)

        def box(x):
            return jax.lax.conv_general_dilated(
                x[None, None], kernel, (1, 1),
                [(kh // 2, kh // 2), (kw // 2, kw // 2)])[0, 0]

        out = self._base_output(img, outp)
        dt = _out_dtype(bits)
        for ci, ch in enumerate((Channel.R, Channel.G, Channel.B)):
            mask = (pix_ch == ci).astype(jnp.float32)
            num = box(a * mask)
            den = box(mask)
            avg = num / jnp.maximum(den, 1.0)
            plane = jnp.where(mask > 0, a, avg)
            out.set_plane(ch, _round_clip(plane, maxval).astype(dt), bits)
        return out


class PlanarToInterleavedRGB(ColorOp):
    """Planar RGB 4:4:4 → packed interleaved plane (ref: rgb2rgb.cc
    Op_RGB_to_RGB24_32 / Op_RGB_to_RRGGBB).

    8-bit targets pack RGB(A) bytes; >8-bit targets pack RRGGBB(AA) as
    uint16 with LE/BE handled at the numpy view level (the plane is
    stored natively; byte order only matters on serialization).  The
    interleaved plane has shape (h, w·ncomp)."""

    cost = 1   # Trivial in the reference cost model

    TARGETS = (Chroma.InterleavedRGB, Chroma.InterleavedRGBA)

    def output_state(self, inp, target):
        if inp.colorspace != Colorspace.RGB or inp.chroma != Chroma.C444:
            return None
        if target.chroma not in self.TARGETS:
            return None
        has_alpha = target.chroma == Chroma.InterleavedRGBA
        return inp.with_(chroma=target.chroma, has_alpha=has_alpha)

    def apply(self, img, inp, outp, options):
        jnp = _jnp()
        bits = img.bit_depth(Channel.R)
        dt = _out_dtype(bits)
        maxval = (1 << bits) - 1
        planes = [jnp.asarray(img.plane(c)).astype(dt)
                  for c in (Channel.R, Channel.G, Channel.B)]
        if outp.chroma == Chroma.InterleavedRGBA:
            if img.has_channel(Channel.Alpha):
                a = jnp.asarray(img.plane(Channel.Alpha))
                if img.bit_depth(Channel.Alpha) != bits:
                    shift = bits - img.bit_depth(Channel.Alpha)
                    a = (a.astype(jnp.int32) << shift) if shift > 0 \
                        else (a >> -shift)
                planes.append(a.astype(dt))
            else:
                planes.append(jnp.full_like(planes[0], maxval))
        h, w = planes[0].shape
        n = len(planes)
        inter = jnp.stack(planes, axis=-1).reshape(h, w * n)
        out = self._base_output(img, outp)
        out.set_plane(Channel.Interleaved, inter, bits)
        return out


class InterleavedToPlanarRGB(ColorOp):
    """Packed interleaved RGB(A) plane → planar RGB 4:4:4
    (ref: rgb2rgb.cc Op_RGB24_32_to_RGB)."""

    cost = 1

    def output_state(self, inp, target):
        if inp.colorspace != Colorspace.RGB or \
                inp.chroma not in PlanarToInterleavedRGB.TARGETS:
            return None
        if target.chroma in PlanarToInterleavedRGB.TARGETS:
            return None
        has_alpha = inp.chroma == Chroma.InterleavedRGBA
        return inp.with_(chroma=Chroma.C444, has_alpha=has_alpha)

    def apply(self, img, inp, outp, options):
        jnp = _jnp()
        bits = img.bit_depth(Channel.Interleaved)
        n = 4 if inp.chroma == Chroma.InterleavedRGBA else 3
        a = jnp.asarray(img.plane(Channel.Interleaved))
        h = a.shape[0]
        w = a.shape[1] // n
        a = a.reshape(h, w, n)
        out = self._base_output(img, outp)
        for i, ch in enumerate((Channel.R, Channel.G, Channel.B)):
            out.set_plane(ch, a[:, :, i], bits)
        if n == 4:
            out.set_plane(Channel.Alpha, a[:, :, 3], bits)
        return out


ALL_OPS: List[ColorOp] = [
    YCbCrToRGB(), RGBToYCbCr(), MonoToRGB(), MonoToYCbCr(),
    ChromaResample(), BitDepthConvert(), DropAlpha(), FlattenAlpha(),
    AddAlpha(), RGBToMono(), BayerToRGB(), PlanarToInterleavedRGB(),
    InterleavedToPlanarRGB(),
]
