"""Vectorized unci extraction kernels (jnp; jit/pjit-compatible).

The decode of every ISO 23001-17 interleave mode is a batched
gather+shift over a uint8 tile buffer, driven by the static affine
addressing computed in layout.py.  This replaces the reference's
per-sample bit-reader loops (unc_decoder_legacybase.cc:90-135) with a
single data-parallel program per layout: XLA fuses the gathers, shifts
and masks, and `vmap` batches over tiles — the TPU analog of the
reference's per-tile thread pool (SURVEY.md §2.9).

All ops are integer (uint32) — bit-exact on any backend.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Tuple

import numpy as np

from .layout import UncLayout, ComponentView

_GATHER_PAD = 8  # safety bytes appended to each tile buffer


def _layout_key(layout: UncLayout) -> Tuple:
    views = tuple(
        (v.comp_index, v.channel, v.depth, v.width, v.height, v.base_bits,
         v.row_stride_bits, v.x_stride_bits, v.read_bits, v.mask,
         v.le_bytes, v.le_shift, getattr(v, "multi_y_phase", None),
         v.col_offsets)
        for v in layout.views)
    return (layout.width, layout.height, layout.tile_cols, layout.tile_rows,
            layout.tile_width, layout.tile_height, layout.tile_size_bytes,
            tuple(layout.comp_tile_sizes or ()), views)


def _extract_view(tiles_u32, v: ComponentView):
    """Extract one component plane from all tile buffers at once.

    tiles_u32: (T, S) uint32 (zero-extended bytes of the tile buffers).
    Returns (T, v.height, v.width) uint32 of raw component values.

    The bit addresses are identical for every tile, so batching over
    tiles is plain advanced indexing along the buffer axis — no vmap,
    one fused gather per byte position.
    """
    import jax.numpy as jnp

    y = jnp.arange(v.height, dtype=jnp.int32) * v.row_stride_bits
    if v.col_offsets is not None:
        x = jnp.asarray(np.array(v.col_offsets, dtype=np.int32))
    else:
        x = jnp.arange(v.width, dtype=jnp.int32) * v.x_stride_bits
    bitpos = v.base_bits + y[:, None] + x[None, :]      # (H, W)
    byte0 = bitpos >> 3

    if v.le_bytes:
        acc = None
        for k in range(v.le_bytes):
            g = tiles_u32[:, byte0 + k] << (8 * k)
            acc = g if acc is None else (acc | g)
        return (acc >> v.le_shift) & v.mask

    # big-endian bit field, possibly byte-misaligned
    if v.col_offsets is not None:
        aligned = (v.base_bits % 8 == 0 and v.row_stride_bits % 8 == 0
                   and all(o % 8 == 0 for o in v.col_offsets))
    else:
        aligned = (v.base_bits % 8 == 0 and v.x_stride_bits % 8 == 0
                   and v.row_stride_bits % 8 == 0)
    max_misalign = 0 if aligned else 7
    nbytes = (v.read_bits + max_misalign + 7) // 8
    acc = None
    for k in range(nbytes):
        g = tiles_u32[:, byte0 + k]
        acc = g if acc is None else ((acc << 8) | g)
    shift = (nbytes * 8 - (bitpos & 7) - v.read_bits)[None, :, :]
    return (acc >> shift) & v.mask


# jit compilation is worth it on accelerators (fusion, reuse across many
# tiles) but the per-layout XLA compile dominates for one-shot small
# decodes on CPU; there the eager jnp path is already vectorized.
FORCE_JIT: bool = False


def _should_jit() -> bool:
    import jax
    return FORCE_JIT or jax.default_backend() not in ("cpu",)


@functools.lru_cache(maxsize=256)
def _build_extractor(key, jit: bool = False):
    """Build (and optionally jit) the per-layout extraction program.

    Returns fn(tiles_u8: (T, S+pad) uint8) -> dict channel -> full plane.
    """
    import jax
    import jax.numpy as jnp

    (width, height, tile_cols, tile_rows, tile_w, tile_h,
     tile_size, comp_sizes, views_t) = key

    views = [ComponentView(comp_index=vt[0], channel=vt[1], depth=vt[2],
                           width=vt[3], height=vt[4], base_bits=vt[5],
                           row_stride_bits=vt[6], x_stride_bits=vt[7],
                           read_bits=vt[8], mask=vt[9], le_bytes=vt[10],
                           le_shift=vt[11], col_offsets=vt[13])
             for vt in views_t]
    phases = [vt[12] for vt in views_t]

    def run(tiles_u8):
        data = jnp.asarray(tiles_u8).astype(jnp.uint32)
        per_view = [_extract_view(data, v) for v in views]  # (T, h, w) each

        planes: Dict[str, list] = {}
        for v, phase, arr in zip(views, phases, per_view):
            if not v.channel:
                continue  # padded/unmapped component
            # (T,h,w) → (rows, cols, h, w) → (rows*h, cols*w)
            full = arr.reshape(tile_rows, tile_cols, v.height, v.width)
            full = full.transpose(0, 2, 1, 3).reshape(
                tile_rows * v.height, tile_cols * v.width)
            out_dtype = jnp.uint8 if v.depth <= 8 else jnp.uint16
            planes.setdefault(v.channel, []).append(
                (phase, full.astype(out_dtype)))

        out = {}
        for ch, parts in planes.items():
            if len(parts) == 1 and parts[0][0] is None:
                out[ch] = parts[0][1]
            else:
                # multi-Y: interleave phase views along x
                parts.sort(key=lambda p: (p[0] or (0, 1))[0])
                n = (parts[0][0] or (0, 1))[1]
                h, w = parts[0][1].shape
                stacked = jnp.stack([p[1] for p in parts], axis=-1)
                out[ch] = stacked.reshape(h, w * n)
        return out

    return jax.jit(run) if jit else run


def _should_fuse() -> bool:
    import os
    e = os.environ.get("LIBHEIF_TPU_FUSED_UNC", "auto")
    if e == "0":
        return False
    if e == "1":
        return True
    import jax
    return jax.default_backend() == "tpu"


def decode_tiles(layout: UncLayout, tiles_u8: np.ndarray):
    """Decode stacked tile buffers → dict of full channel planes.

    tiles_u8: (num_tiles, tile_size + _GATHER_PAD) uint8 host array.
    Returns dict channel → jax.Array plane (device).

    On TPU, byte-aligned uniform-stride layouts (8/16-bit component/
    pixel/row interleave at any sampling) take the fused strided path
    (pallas_fast.fused_strided_decode); everything else goes through
    the generic bit-gather program.
    """
    if _should_fuse():
        from . import pallas_fast
        out = pallas_fast.fused_strided_decode(layout, tiles_u8)
        if out is not None:
            return out
    fn = _build_extractor(_layout_key(layout), jit=_should_jit())
    return fn(tiles_u8)


def assemble_tile_buffers(layout: UncLayout, data: bytes) -> np.ndarray:
    """Slice raw item data into the (T, S+pad) stacked tile buffer array.

    Handles both contiguous tiles (component/pixel/row/mixed/multi-y:
    one chunk per tile) and tile-component interleave (mode 4:
    component-major scattered chunks, ref: unc_decoder.cc
    fetch_tile_data scattered branch).
    """
    from ...core.error import HeifError

    T = layout.num_tiles
    if layout.comp_tile_sizes is None:
        S = layout.tile_size_bytes
        need = S * T
        if len(data) < need:
            raise HeifError.eof(
                f"unci data too short: have {len(data)}, need {need}")
        raw = np.frombuffer(data, dtype=np.uint8, count=need).reshape(T, S)
        out = np.zeros((T, S + _GATHER_PAD), dtype=np.uint8)
        out[:, :S] = raw
        return out

    sizes = layout.comp_tile_sizes
    S = sum(sizes)
    need = S * T
    if len(data) < need:
        raise HeifError.eof(
            f"unci tile-component data too short: have {len(data)}, need {need}")
    src = np.frombuffer(data, dtype=np.uint8, count=need)
    out = np.zeros((T, S + _GATHER_PAD), dtype=np.uint8)
    comp_base = 0
    dst_off = 0
    for sz in sizes:
        chunk = src[comp_base:comp_base + sz * T].reshape(T, sz)
        out[:, dst_off:dst_off + sz] = chunk
        comp_base += sz * T
        dst_off += sz
    return out
