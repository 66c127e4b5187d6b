"""Ahead-of-time device-program warmup (VERDICT r3 weak #3).

Compiles the device programs for the common shape buckets into JAX's
persistent compilation cache so interactive decodes skip the 6-170 s
per-bucket jit cost.  Run once per deployment (or per jaxlib upgrade):

    python tools/warmup_cache.py [--cache DIR] [--buckets 512,1024]
    python tools/warmup_cache.py --list        # show what would compile

Covers:
  * the fused unci tile decode + YCbCr->RGB pipeline (bench headline),
  * the HEVC wavefront reconstruction program for pow2 tile buckets
    (codecs/hevc/device_recon.py::_pow2_bucket shapes),
  * the batched coded-grid program at the bench tile counts.

The cache directory defaults to the one bench.py uses, so driver bench
runs and user sessions share it.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

DEFAULT_CACHE = "/tmp/libheif_tpu_jax_cache"


def _tile_for_bucket(side: int, qp: int = 30):
    import numpy as np
    from libheif_tpu.codecs.hevc.encoder import IntraEncoder, EncParams
    from libheif_tpu.image.pixel_image import (PixelImage, Channel,
                                               Colorspace, Chroma)
    from libheif_tpu.boxes.codec_cfg import Box_hvcC
    rng = np.random.default_rng(3)
    base = rng.integers(0, 256, (max(side // 8, 1),) * 2).astype(float)
    y = np.clip(np.kron(base, np.ones((8, 8)))[:side, :side] +
                rng.integers(-6, 7, (side, side)), 0, 255).astype(np.uint8)
    img = PixelImage(side, side, Colorspace.YCbCr, Chroma.C420)
    img.set_plane(Channel.Y, y, 8)
    img.set_plane(Channel.Cb, y[::2, ::2], 8)
    img.set_plane(Channel.Cr, y[1::2, 1::2], 8)
    enc = IntraEncoder(side, side, EncParams(qp=qp, ctb_log2=6,
                                             cu_log2=6, var_cu=True,
                                             rqt_depth=1))
    slice_nal, cfg_nals = enc.encode(img)
    cfg = Box_hvcC()
    cfg.length_size = 4
    for nal in cfg_nals:
        cfg.add_nal(nal)
    return cfg, len(slice_nal).to_bytes(4, "big") + slice_nal


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cache", default=DEFAULT_CACHE)
    ap.add_argument("--buckets", default="512",
                    help="comma-separated square tile sides")
    ap.add_argument("--grid-tiles", default="16,256",
                    help="coded-grid batch sizes to precompile")
    ap.add_argument("--list", action="store_true")
    args = ap.parse_args()

    sides = [int(v) for v in args.buckets.split(",") if v]
    grids = [int(v) for v in args.grid_tiles.split(",") if v]
    if args.list:
        print("would compile: unci pipeline 4096x4096;",
              f"hevc wavefront buckets {sides};",
              f"coded-grid batches {grids}")
        return

    import jax
    jax.config.update("jax_compilation_cache_dir", args.cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    print(f"backend: {jax.default_backend()}, cache: {args.cache}")

    t0 = time.time()
    # 1. unci fused pipeline (bench.py headline shape)
    from __graft_entry__ import entry
    fn, fargs = entry()
    fn(*fargs)
    print(f"unci pipeline warm ({time.time() - t0:.1f}s)")

    # 2/3. coded-tile programs
    from libheif_tpu.parallel.coded_grid import parse_tile
    from libheif_tpu.codecs.hevc.device_recon import (
        build_plan, _build_program, _plan_meta, _plan_arrays)
    for side in sides:
        cfg, data = _tile_for_bucket(side)
        sps, syn, raw = parse_tile(cfg, data)
        for n in grids:
            t1 = time.time()
            plan = build_plan([syn] * n,
                              raw_tus=None if raw is None else [raw] * n)
            prog = _build_program(_plan_meta(plan))
            y, _, _ = prog(_plan_arrays(plan))
            y.block_until_ready() if hasattr(y, "block_until_ready") \
                else None
            print(f"hevc wavefront {side}px x{n} tiles warm "
                  f"({time.time() - t1:.1f}s)")
    print(f"total {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
