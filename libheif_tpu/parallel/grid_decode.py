"""Mesh-sharded unci decode pipeline (the tile-parallel hot path).

The TPU-native analog of the reference's parallel grid decode
(reference: grid.cc:285-453): instead of fanning tiles out to a thread
pool, the whole tile batch is ONE device program under jit with the
tile axis sharded over the mesh.  Each device extracts its tile shard;
plane reassembly propagates to a row-sharded output layout, with XLA
inserting the ICI collectives where tile boundaries cross devices
(SURVEY.md §2.9).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import numpy as np

from ..codecs.unc.layout import UncLayout
from ..codecs.unc import kernels
from .mesh import make_mesh, tile_sharding


def build_sharded_pipeline(layout: UncLayout, mesh=None,
                           convert_to_rgb: bool = False):
    """jit-compiled fn(tiles_u8 (T,S+pad)) → dict channel → plane,
    with the tile batch sharded over `mesh` and output planes sharded
    by rows.  Tiles must be row-major so each device's tile shard maps
    to contiguous plane rows."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    if mesh is None:
        mesh = make_mesh()

    base = kernels._build_extractor(kernels._layout_key(layout), jit=False)

    def pipeline(tiles_u8):
        planes = base(tiles_u8)
        if convert_to_rgb and "Y" in planes:
            from ..color.nclx import get_kr_kb
            kr, kb = get_kr_kb(6)
            bits = layout.views[0].depth
            half = float(1 << (bits - 1))
            maxval = (1 << bits) - 1
            y = planes["Y"].astype(jnp.float32)
            h, w = y.shape
            cb = planes["Cb"].astype(jnp.float32)
            cr = planes["Cr"].astype(jnp.float32)
            if cb.shape != y.shape:  # nearest upsample, sharding-friendly
                ry = h // cb.shape[0]
                rx = w // cb.shape[1]
                cb = jnp.repeat(jnp.repeat(cb, ry, 0), rx, 1)
                cr = jnp.repeat(jnp.repeat(cr, ry, 0), rx, 1)
            r = y + 2 * (1 - kr) * (cr - half)
            b = y + 2 * (1 - kb) * (cb - half)
            g = (y - kr * r - kb * b) / (1 - kr - kb)
            out_dtype = jnp.uint8 if bits <= 8 else jnp.uint16
            clip = lambda v: jnp.clip(jnp.round(v), 0, maxval).astype(out_dtype)
            planes = {"R": clip(r), "G": clip(g), "B": clip(b)}
        return planes

    in_sh = tile_sharding(mesh, mesh.axis_names[0])
    out_sh = NamedSharding(mesh, P(mesh.axis_names[0]))
    return jax.jit(pipeline, in_shardings=in_sh,
                   out_shardings=out_sh), mesh, in_sh


def sharded_unci_decode(decoder, data: bytes, mesh=None,
                        convert_to_rgb: bool = False) -> Dict[str, "np.ndarray"]:
    """Decode an unci item with tiles sharded across the mesh.

    decoder: codecs.unc.UnciDecoder.  Returns dict channel → jax.Array
    (plane sharded by rows across the mesh).
    """
    import jax

    layout = decoder.layout
    payload = decoder._uncompressed_payload(data)
    tiles = kernels.assemble_tile_buffers(layout, payload)
    if mesh is None:
        # shard by whole tile rows so plane reassembly stays local:
        # use the largest device count that divides the tile-row count
        n_avail = len(jax.devices())
        n_use = max(d for d in range(1, n_avail + 1)
                    if layout.tile_rows % d == 0)
        mesh = make_mesh(n_use)
    fn, mesh, in_sh = build_sharded_pipeline(layout, mesh, convert_to_rgb)
    tiles_dev = jax.device_put(tiles, in_sh)
    return fn(tiles_dev)
