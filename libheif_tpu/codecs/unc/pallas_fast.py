"""Pallas TPU fast paths for the flagship unci decode pipeline.

The generic decode path (kernels.py) is a byte-gather program that
handles every ISO 23001-17 interleave/alignment combination.  For the
layouts that dominate real traffic — byte-aligned 8-bit component
interleave (YCbCr 4:2:0 / 4:4:4 / mono) — decode degenerates to a
reshape, and the real work is the color transform.  These kernels fuse
plane extraction, chroma upsampling, the YCbCr→RGB matrix (H.273
coefficients, ref: libheif color-conversion/yuv2rgb.cc) and the uint8
round/clip into ONE Pallas program, so the only HBM traffic is

    read 1.5 B/px (planes)  +  write 3 B/px (RGB)

instead of the many float32 intermediates the fused-by-XLA jnp path
materializes.  Each grid step decodes one tile and writes it directly
into its final position in the full-resolution output image (the
BlockSpec index map does the "paste" of grid.cc:482 for free).

Exactness contract: every integer stage (plane extraction, chroma
upsampling) is bit-exact vs kernels.py/ops.py.  The final f32 H.273
matrix uses the identical formula and constants as color/ops.py, but
XLA/Mosaic may contract multiplies+adds into FMAs differently per
fusion, which can flip values sitting exactly on a .5 rounding
boundary by 1 LSB (~0.1% of random pixels).  This matches the
reference's situation: its SIMD color paths differ from its scalar
path the same way.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


@functools.partial(
    jax.jit,
    static_argnames=("tile_rows", "tile_cols", "tile_h", "tile_w",
                     "kr", "kb", "full_range", "interpret"))
def yuv420_tiles_to_rgb(tiles_u8, *, tile_rows: int, tile_cols: int,
                        tile_h: int, tile_w: int, kr: float, kb: float,
                        full_range: bool = True,
                        interpret: bool = False):
    """(T, S+pad) uint8 tile buffers → (3, H, W) uint8 RGB image.

    Layout per tile buffer: Y plane (tile_h*tile_w bytes) then Cb then
    Cr (tile_h/2 * tile_w/2 bytes each), i.e. byte-aligned 8-bit
    component interleave with 4:2:0 sampling (unc_types.h:104).
    Chroma upsampling is nearest-neighbour (heif_chroma_upsampling
    nearest_neighbor, heif_decoding.h).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T = tile_rows * tile_cols
    ch, cw = tile_h // 2, tile_w // 2
    ys = tile_h * tile_w
    cs = ch * cw
    H, W = tile_rows * tile_h, tile_cols * tile_w

    # Plane stacks: contiguous per tile, so these are cheap strided
    # copies XLA performs at memcpy speed (no gather).
    y = jax.lax.slice(tiles_u8, (0, 0), (T, ys)).reshape(T, tile_h, tile_w)
    cb = jax.lax.slice(tiles_u8, (0, ys), (T, ys + cs)).reshape(T, ch, cw)
    cr = jax.lax.slice(tiles_u8, (0, ys + cs),
                       (T, ys + 2 * cs)).reshape(T, ch, cw)

    # fold the H.273 constants in f64 exactly as the jnp reference
    # path does (weak-typed Python scalars), then cast once to f32
    krf = np.float32(kr)
    kbf = np.float32(kb)
    c_cr = np.float32(2.0 * (1.0 - kr))
    c_cb = np.float32(2.0 * (1.0 - kb))
    g_den = np.float32(1.0 - kr - kb)

    def kernel(y_ref, cb_ref, cr_ref, out_ref):
        # Mosaic lacks a direct u8->f32 cast; widen via int32 first.
        yf = y_ref[0].astype(jnp.int32).astype(jnp.float32)
        cbf = cb_ref[0].astype(jnp.int32).astype(jnp.float32) - 128.0
        crf = cr_ref[0].astype(jnp.int32).astype(jnp.float32) - 128.0
        if not full_range:
            yf = (yf - 16.0) * (255.0 / 219.0)
            cbf = cbf * (255.0 / 224.0)
            crf = crf * (255.0 / 224.0)
        # Nearest-neighbour 2x upsample as 0/1-matrix matmuls on the
        # MXU (Mosaic cannot lower jnp.repeat's interleaving reshape).
        # E[i,j] = 1 iff j == i//2; each output element sums exactly
        # one input element, so the expansion is exact in f32.
        th, tw = tile_h, tile_w
        # bf16 operands are exact here: chroma is integral in
        # [-128,127] and E is 0/1, both exactly representable; the MXU
        # accumulates in f32 and each row sums a single product.
        rh = jax.lax.broadcasted_iota(jnp.int32, (th, th // 2), 0) // 2
        ch_ = jax.lax.broadcasted_iota(jnp.int32, (th, th // 2), 1)
        e_up = (rh == ch_).astype(jnp.bfloat16)         # (th, th/2)
        rw = jax.lax.broadcasted_iota(jnp.int32, (tw // 2, tw), 0)
        cw_ = jax.lax.broadcasted_iota(jnp.int32, (tw // 2, tw), 1) // 2
        e_right = (rw == cw_).astype(jnp.bfloat16)      # (tw/2, tw)

        def up2(p):
            t = jnp.dot(e_up, p.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
            return jnp.dot(t.astype(jnp.bfloat16), e_right,
                           preferred_element_type=jnp.float32)

        cbf = up2(cbf)
        crf = up2(crf)
        r = yf + c_cr * crf
        b = yf + c_cb * cbf
        g = (yf - krf * r - kbf * b) / g_den
        rgb = jnp.stack([r, g, b])
        rgb = jnp.clip(jnp.round(rgb), 0.0, 255.0)
        out_ref[:] = rgb.astype(jnp.int32).astype(jnp.uint8)

    grid = (tile_rows, tile_cols)
    tc = tile_cols
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_h, tile_w),
                         lambda i, j: (i * tc + j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ch, cw), lambda i, j: (i * tc + j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ch, cw), lambda i, j: (i * tc + j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, tile_h, tile_w),
                               lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, H, W), jnp.uint8),
        interpret=interpret,
    )(y, cb, cr)


def _upsample_int16(plane_u8, out_h: int, out_w: int, method: str):
    """Integer chroma upsample; returns (plane_i16, scale).

    Bilinear keeps the (3a+b)/4 taps un-normalized: the result is the
    exact f32 value of ops._upsample times `scale` (4 per doubled
    axis), representable losslessly in int16 (max 16*255 = 4080).
    Nearest is a pure gather (scale 1).  Exactness lets the Pallas
    matrix kernel reproduce the jnp reference path bit-for-bit up to
    the final f32 matrix (see module docstring).
    """
    a = plane_u8.astype(jnp.int16)
    h, w = a.shape
    scale = 1
    if method == "nearest-neighbor" or (h == out_h and w == out_w):
        if (h, w) != (out_h, out_w):
            ys = (jnp.arange(out_h) * h) // out_h
            xs = (jnp.arange(out_w) * w) // out_w
            a = a[ys[:, None], xs[None, :]]
        return a, scale
    if out_w == 2 * w or (w * 2 - out_w in (0, 1)):
        left = jnp.concatenate([a[:, :1], a[:, :-1]], axis=1)
        right = jnp.concatenate([a[:, 1:], a[:, -1:]], axis=1)
        up = jnp.stack([3 * a + left, 3 * a + right], axis=-1).reshape(h, 2 * w)
        a = up[:, :out_w]
        scale *= 4
    elif out_w != w:
        xs = (jnp.arange(out_w) * w) // out_w
        a = a[:, xs]
    h2 = a.shape[0]
    if out_h == 2 * h2 or (2 * h2 - out_h in (0, 1)):
        top = jnp.concatenate([a[:1], a[:-1]], axis=0)
        bottom = jnp.concatenate([a[1:], a[-1:]], axis=0)
        up = jnp.stack([3 * a + top, 3 * a + bottom],
                       axis=1).reshape(2 * h2, a.shape[1])
        a = up[:out_h]
        scale *= 4
    elif out_h != h2:
        ys = (jnp.arange(out_h) * h2) // out_h
        a = a[ys]
    return a, scale


@functools.partial(
    jax.jit,
    static_argnames=("kr", "kb", "full_range", "upsampling", "interpret"))
def ycbcr8_planes_to_rgb(y_u8, cb_u8, cr_u8, *, kr: float, kb: float,
                         full_range: bool = True,
                         upsampling: str = "bilinear",
                         interpret: bool = False):
    """Whole-plane 8-bit YCbCr→RGB: (H,W)+(ch,cw)×2 → (3,H,W) uint8.

    The product color-conversion fast path (ops.YCbCrToRGB dispatches
    here on TPU).  Chroma upsampling (any 420/422/444 geometry,
    nearest or bilinear per heif_decoding_options.chroma_upsampling)
    runs as exact integer XLA ops; the H.273 matrix + round/clip/pack
    is one elementwise Pallas program, so no float32 plane ever
    touches HBM.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    H, W = y_u8.shape
    cb16, scale = _upsample_int16(cb_u8, H, W, upsampling)
    cr16, _ = _upsample_int16(cr_u8, H, W, upsampling)

    inv_scale = np.float32(1.0 / scale)
    # fold the H.273 constants in f64 exactly as the jnp reference
    # path does (weak-typed Python scalars), then cast once to f32
    krf = np.float32(kr)
    kbf = np.float32(kb)
    c_cr = np.float32(2.0 * (1.0 - kr))
    c_cb = np.float32(2.0 * (1.0 - kb))
    g_den = np.float32(1.0 - kr - kb)

    BH, BW = 256, 512
    bh, bw = min(BH, H), min(BW, W)

    def kernel(y_ref, cb_ref, cr_ref, out_ref):
        yf = y_ref[:].astype(jnp.int32).astype(jnp.float32)
        cbf = cb_ref[:].astype(jnp.float32) * inv_scale - 128.0
        crf = cr_ref[:].astype(jnp.float32) * inv_scale - 128.0
        if not full_range:
            yf = (yf - 16.0) * (255.0 / 219.0)
            cbf = cbf * (255.0 / 224.0)
            crf = crf * (255.0 / 224.0)
        r = yf + c_cr * crf
        b = yf + c_cb * cbf
        g = (yf - krf * r - kbf * b) / g_den
        rgb = jnp.clip(jnp.round(jnp.stack([r, g, b])), 0.0, 255.0)
        out_ref[:] = rgb.astype(jnp.int32).astype(jnp.uint8)

    grid = (pl.cdiv(H, bh), pl.cdiv(W, bw))
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bh, bw), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bh, bw), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bh, bw), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, bh, bw), lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, H, W), jnp.uint8),
        interpret=interpret,
    )(y_u8, cb16, cr16)


@functools.partial(
    jax.jit,
    static_argnames=("tile_rows", "tile_cols", "tile_h", "tile_w",
                     "num_comps", "interpret"))
def planar8_tiles_to_image(tiles_u8, *, tile_rows: int, tile_cols: int,
                           tile_h: int, tile_w: int, num_comps: int,
                           interpret: bool = False):
    """(T, S+pad) uint8 component-interleaved tiles → (C, H, W) uint8.

    Pure decode (no color transform) for byte-aligned 8-bit planar
    layouts with no subsampling (RGB 4:4:4, mono): one DMA-shaped copy
    per tile straight into image position.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T = tile_rows * tile_cols
    ps = tile_h * tile_w
    H, W = tile_rows * tile_h, tile_cols * tile_w
    C = num_comps

    planes = jax.lax.slice(tiles_u8, (0, 0), (T, C * ps)).reshape(
        T, C, tile_h, tile_w)

    def kernel(in_ref, out_ref):
        out_ref[:] = in_ref[0]

    tc = tile_cols
    return pl.pallas_call(
        kernel,
        grid=(tile_rows, tile_cols),
        in_specs=[pl.BlockSpec((1, C, tile_h, tile_w),
                               lambda i, j: (i * tc + j, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((C, tile_h, tile_w),
                               lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, H, W), jnp.uint8),
        interpret=interpret,
    )(planes)


@functools.partial(
    jax.jit,
    static_argnames=("tile_rows", "tile_cols", "tile_h", "tile_w",
                     "sub_x", "sub_y", "kr", "kb", "full_range",
                     "interpret"))
def yuv_tiles_to_rgb(tiles_u8, *, tile_rows: int, tile_cols: int,
                     tile_h: int, tile_w: int, sub_x: int, sub_y: int,
                     kr: float, kb: float, full_range: bool = True,
                     interpret: bool = False):
    """Generalized fused tile decode+convert for 8-bit component-
    interleave YCbCr at ANY sampling: 4:2:0 (sub 2,2), 4:2:2 (2,1),
    4:4:4 (1,1).  Same program structure as yuv420_tiles_to_rgb; the
    chroma upsample matmuls only run on subsampled axes."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T = tile_rows * tile_cols
    ch, cw = tile_h // sub_y, tile_w // sub_x
    ys = tile_h * tile_w
    cs = ch * cw
    H, W = tile_rows * tile_h, tile_cols * tile_w

    y = jax.lax.slice(tiles_u8, (0, 0), (T, ys)).reshape(T, tile_h, tile_w)
    cb = jax.lax.slice(tiles_u8, (0, ys), (T, ys + cs)).reshape(T, ch, cw)
    cr = jax.lax.slice(tiles_u8, (0, ys + cs),
                       (T, ys + 2 * cs)).reshape(T, ch, cw)

    krf = np.float32(kr)
    kbf = np.float32(kb)
    c_cr = np.float32(2.0 * (1.0 - kr))
    c_cb = np.float32(2.0 * (1.0 - kb))
    g_den = np.float32(1.0 - kr - kb)

    def kernel(y_ref, cb_ref, cr_ref, out_ref):
        yf = y_ref[0].astype(jnp.int32).astype(jnp.float32)
        cbf = cb_ref[0].astype(jnp.int32).astype(jnp.float32) - 128.0
        crf = cr_ref[0].astype(jnp.int32).astype(jnp.float32) - 128.0
        if not full_range:
            yf = (yf - 16.0) * (255.0 / 219.0)
            cbf = cbf * (255.0 / 224.0)
            crf = crf * (255.0 / 224.0)
        th, tw = tile_h, tile_w

        def up(p):
            # nearest-neighbour expansion per subsampled axis as
            # 0/1-matrix matmuls (see yuv420_tiles_to_rgb)
            if sub_y == 2:
                rh = jax.lax.broadcasted_iota(
                    jnp.int32, (th, th // 2), 0) // 2
                chi = jax.lax.broadcasted_iota(
                    jnp.int32, (th, th // 2), 1)
                e_up = (rh == chi).astype(jnp.bfloat16)
                p = jnp.dot(e_up, p.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
            if sub_x == 2:
                rw = jax.lax.broadcasted_iota(
                    jnp.int32, (tw // 2, tw), 0)
                cwi = jax.lax.broadcasted_iota(
                    jnp.int32, (tw // 2, tw), 1) // 2
                e_right = (rw == cwi).astype(jnp.bfloat16)
                p = jnp.dot(p.astype(jnp.bfloat16), e_right,
                            preferred_element_type=jnp.float32)
            return p.astype(jnp.float32)

        cbf = up(cbf)
        crf = up(crf)
        r = yf + c_cr * crf
        b = yf + c_cb * cbf
        g = (yf - krf * r - kbf * b) / g_den
        rgb = jnp.stack([r, g, b])
        rgb = jnp.clip(jnp.round(rgb), 0.0, 255.0)
        out_ref[:] = rgb.astype(jnp.int32).astype(jnp.uint8)

    tc = tile_cols
    return pl.pallas_call(
        kernel,
        grid=(tile_rows, tile_cols),
        in_specs=[
            pl.BlockSpec((1, tile_h, tile_w),
                         lambda i, j: (i * tc + j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ch, cw), lambda i, j: (i * tc + j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ch, cw), lambda i, j: (i * tc + j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, tile_h, tile_w),
                               lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, H, W), jnp.uint8),
        interpret=interpret,
    )(y, cb, cr)


def _paste_tiles(arr, tile_rows, tile_cols, dtype, interpret):
    """(T, h, w) per-tile planes → (rows*h, cols*w) full plane via a
    per-tile Pallas grid (the grid.cc:482 paste for free)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    t, h, w = arr.shape

    def kernel(in_ref, out_ref):
        out_ref[:] = in_ref[0]

    tc = tile_cols
    return pl.pallas_call(
        kernel,
        grid=(tile_rows, tile_cols),
        in_specs=[pl.BlockSpec((1, h, w),
                               lambda i, j: (i * tc + j, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((h, w), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((tile_rows * h, tile_cols * w),
                                       dtype),
        interpret=interpret,
    )(arr)


def fused_strided_decode(layout, tiles_u8,
                         interpret: Optional[bool] = None):
    """General fused decode for byte-aligned uniform-stride layouts:
    8/16-bit big-endian samples at constant byte strides — which covers
    component, pixel AND row interleave (and their 4:2:2/4:4:4/16-bit
    variants; ref: unc_decoder_pixel_interleave.cc:88,
    unc_decoder_row_interleave.cc).  Extraction is XLA strided slicing
    (memcpy-shaped, no gather); the per-tile paste into image position
    is a Pallas grid.  Returns dict channel → plane, or None when the
    layout needs the generic bit-gather path (odd depths, little-
    endian, mixed alignment, multi-Y, tile-component mode)."""
    import jax.numpy as jnp

    if interpret is None:
        interpret = not _on_tpu()
    if layout.comp_tile_sizes is not None:
        return None
    views = layout.views
    if not views or any(not v.channel for v in views):
        return None
    for v in views:
        if getattr(v, "multi_y_phase", None) is not None:
            return None
        if v.col_offsets is not None:
            return None
        if v.depth not in (8, 16) or v.read_bits != v.depth:
            return None
        if v.le_bytes:
            return None
        if v.mask != (1 << v.depth) - 1:
            return None
        if v.base_bits % 8 or v.row_stride_bits % 8 or \
                v.x_stride_bits % 8:
            return None
    seen = set()
    for v in views:
        if v.channel in seen:
            return None          # one view per channel only
        seen.add(v.channel)

    t = layout.num_tiles
    s = layout.tile_size_bytes
    data = jnp.asarray(tiles_u8)[:, :s]
    out = {}
    for v in views:
        base = v.base_bits // 8
        rs = v.row_stride_bits // 8
        xs = v.x_stride_bits // 8
        nbytes = v.depth // 8
        rows = jax.lax.slice(data, (0, base),
                             (t, min(base + v.height * rs, s)))
        pad = v.height * rs - rows.shape[1]
        if pad > 0:      # last row may end before the row stride does
            rows = jnp.pad(rows, ((0, 0), (0, pad)))
        rows = rows.reshape(t, v.height, rs)
        cols = rows[:, :, :v.width * xs].reshape(t, v.height, v.width, xs)
        if v.depth == 8:
            plane = cols[..., 0]
            dtype = jnp.uint8
        else:
            hi = cols[..., 0].astype(jnp.uint16)
            lo = cols[..., 1].astype(jnp.uint16)
            plane = (hi << 8) | lo
            dtype = jnp.uint16
        out[v.channel] = _paste_tiles(plane.astype(dtype),
                                      layout.tile_rows,
                                      layout.tile_cols, dtype,
                                      interpret)
    return out
