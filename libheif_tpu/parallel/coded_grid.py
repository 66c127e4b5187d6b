"""Batched + mesh-sharded decode of coded (HEVC) grid tiles.

The TPU-native replacement for the reference's per-tile thread pool
(reference: libheif/image-items/grid.cc:285-453 std::async fan-out):

  1. entropy decode of every tile runs host-side in a thread pool (the
     native C++ parser releases the GIL), producing flat TU arrays;
  2. ALL tiles reconstruct in ONE device program — the wavefront scan
     of device_recon.py runs wave w of every tile in lockstep (the tile
     axis is the batch axis);
  3. with a multi-device mesh, tiles are split into per-device chunks
     and the same program runs under shard_map with the chunk axis
     sharded — pure data parallelism over ICI, no cross-tile
     communication (SURVEY.md §2.9).
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..codecs.hevc import headers as H
from ..codecs.hevc.decoder import (extract_stream, check_picture_supported,
                                   crop_to_conformance, _substreams)
from ..codecs.hevc.device_recon import (
    build_plan, decode_pictures_device, _plan_meta, _plan_arrays,
    _build_program, _pow2_bucket, _GroupPlan, INTRA_DC)
from ..boxes.codec_cfg import remove_emulation_prevention


def parse_tile(config_box, data: bytes):
    """Host entropy decode of one hvc1 tile → (sps, syn, raw_tu or None)."""
    sps, pps, slices = extract_stream(config_box, data)
    check_picture_supported(sps, pps, slices)
    nal = slices[0]
    sh = H.parse_slice_header(nal, sps, {pps.pps_id: pps})
    rbsp = remove_emulation_prevention(nal[2:])
    subs = _substreams(nal, rbsp, sh.data_offset_bits,
                       sh.entry_point_offsets)
    from ..codecs.hevc.native_parse import parse_picture_raw, parse_slice
    raw = parse_picture_raw(sps, pps, sh, rbsp, subs)
    if raw is not None:
        syn, cols, coeff, offs = raw
        return sps, syn, (cols, coeff, offs)
    return sps, parse_slice(sps, pps, sh, rbsp, subs), None


def parse_tiles(configs_and_data: Sequence[Tuple[object, bytes]],
                max_workers: Optional[int] = None):
    """Thread-pool entropy decode of many tiles (C++ parser drops the
    GIL, so this is real host parallelism — the analog of the
    reference's num_codec_threads)."""
    n = len(configs_and_data)
    workers = max_workers or min(8, os.cpu_count() or 1, max(1, n))
    if workers <= 1 or n <= 1:
        return [parse_tile(c, d) for c, d in configs_and_data]
    with ThreadPoolExecutor(max_workers=workers) as ex:
        return list(ex.map(lambda cd: parse_tile(*cd), configs_and_data))


# ---------------------------------------------------------------- sharding

def _pad_group(g: _GroupPlan, n_pad: int, k: int, n_waves: int,
               trash: int) -> _GroupPlan:
    """Grow a group's padded tables to the unified shard shapes."""
    s = 1 << g.key[1]

    def grow(a, fill):
        if len(a) >= n_pad:
            return a
        extra = np.full((n_pad - len(a),) + a.shape[1:], fill, a.dtype)
        return np.concatenate([a, extra])

    starts = np.full(n_waves, g.n, np.int32)
    counts = np.zeros(n_waves, np.int32)
    starts[:len(g.starts)] = g.starts
    counts[:len(g.counts)] = g.counts
    return _GroupPlan(
        key=g.key, n=g.n, n_pad=n_pad, k=k,
        coeffs=grow(g.coeffs, 0), qp=grow(g.qp, 0),
        ts=grow(g.ts, False), tqb=grow(g.tqb, False),
        mode=grow(g.mode, INTRA_DC),
        ref_idx=grow(g.ref_idx, 0), ref_avail=grow(g.ref_avail, False),
        scat_idx=grow(g.scat_idx, trash),
        starts=starts, counts=counts)


def _empty_group(key, n_pad: int, k: int, n_waves: int,
                 trash: int) -> _GroupPlan:
    s = 1 << key[1]
    return _GroupPlan(
        key=key, n=0, n_pad=n_pad, k=k,
        coeffs=np.zeros((n_pad, s, s), np.int32),
        qp=np.zeros(n_pad, np.int32),
        ts=np.zeros(n_pad, bool), tqb=np.zeros(n_pad, bool),
        mode=np.full(n_pad, INTRA_DC, np.int32),
        ref_idx=np.zeros((n_pad, 4 * s + 1), np.int32),
        ref_avail=np.zeros((n_pad, 4 * s + 1), bool),
        scat_idx=np.full((n_pad, s * s), trash, np.int32),
        starts=np.zeros(n_waves, np.int32),
        counts=np.zeros(n_waves, np.int32))


def _unify_plans(plans):
    """Make every per-device plan share identical static meta so one
    program runs under shard_map."""
    keys = sorted({g.key for p in plans for g in p.groups}, reverse=True)
    n_waves = max(p.n_waves for p in plans)
    kmax = {key: max((g.k for p in plans for g in p.groups
                      if g.key == key), default=1) for key in keys}
    npad = {key: max((_pow2_bucket(g.n) for p in plans for g in p.groups
                      if g.key == key), default=8) + kmax[key]
            for key in keys}

    db_any = next((p.deblock for p in plans if p.deblock is not None), None)
    sao_any = next((p.sao for p in plans if p.sao is not None), None)
    tqb_any = next((p.tqb_mask for p in plans if p.tqb_mask is not None),
                   None)

    for p in plans:
        t_y = p.t * p.height * p.width
        t_c = p.t * 2 * (p.height >> 1) * (p.width >> 1)
        by_key = {g.key: g for g in p.groups}
        p.groups = [
            _pad_group(by_key[key], npad[key], kmax[key], n_waves,
                       t_y if key[0] else t_c)
            if key in by_key else
            _empty_group(key, npad[key], kmax[key], n_waves,
                         t_y if key[0] else t_c)
            for key in keys]
        p.n_waves = n_waves
        if db_any is not None and p.deblock is None:
            p.deblock = {k: np.zeros_like(v) for k, v in db_any.items()}
        if sao_any is not None and p.sao is None:
            p.sao = {k: (np.zeros_like(v) if isinstance(v, np.ndarray)
                         else v) for k, v in sao_any.items()}
        if tqb_any is not None and p.tqb_mask is None:
            p.tqb_mask = np.zeros_like(tqb_any)
    return plans


def decode_tiles_device(syntaxes, raw_tus=None, mesh=None):
    """Device reconstruction of a tile batch; shards tile chunks over
    `mesh` when it has more than one device.  Returns a list of
    (Y, Cb, Cr) uncropped int32 numpy planes per tile."""
    if mesh is None or int(np.prod(mesh.devices.shape)) <= 1:
        return decode_pictures_device(syntaxes, raw_tus=raw_tus)

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    d = int(np.prod(mesh.devices.shape))
    t = len(syntaxes)
    pad = (-t) % d
    syn_p = list(syntaxes) + [syntaxes[0]] * pad
    raw_p = None if raw_tus is None else list(raw_tus) + [raw_tus[0]] * pad
    per = len(syn_p) // d

    plans = [build_plan(
        syn_p[i * per:(i + 1) * per],
        raw_tus=None if raw_p is None else raw_p[i * per:(i + 1) * per])
        for i in range(d)]
    plans = _unify_plans(plans)
    metas = {_plan_meta(p) for p in plans}
    if len(metas) != 1:
        # heterogeneous shards (different static configs): no sharding
        return decode_pictures_device(syntaxes, raw_tus=raw_tus)
    axis = mesh.axis_names[0]
    meta = metas.pop()[:-1] + ((axis,),)   # mark VMA axes for shard_map
    prog = _build_program(meta)

    per_dev = [_plan_arrays(p) for p in plans]
    stacked = {k: np.stack([pd[k] for pd in per_dev])
               for k in per_dev[0]}

    spec_in = {k: P(axis) for k in stacked}
    shardings = {k: NamedSharding(mesh, P(axis)) for k in stacked}

    def shard_fn(arrays):
        local = {k: v[0] for k, v in arrays.items()}
        y, cb, cr = prog(local)
        return y[None], cb[None], cr[None]

    f = shard_map(shard_fn, mesh=mesh, in_specs=(spec_in,),
                  out_specs=(P(axis), P(axis), P(axis)))
    dev_in = {k: jax.device_put(v, shardings[k])
              for k, v in stacked.items()}
    y, cb, cr = f(dev_in)
    y = np.asarray(y).reshape(-1, *y.shape[2:])
    cb = np.asarray(cb).reshape(-1, *cb.shape[2:])
    cr = np.asarray(cr).reshape(-1, *cr.shape[2:])
    return [(y[i], cb[i], cr[i]) for i in range(t)]


# --------------------------------------------------------------- grid glue

def try_batched_hevc_grid(grid_item, grid, tile_ids, options,
                          processed_ids):
    """Batched device decode of an all-hvc1 grid.  Returns a composed
    PixelImage, or None when the fast path doesn't apply (mixed codecs,
    per-tile transforms, unsupported streams, shape mismatches) — the
    caller then falls back to the serial per-tile loop."""
    from ..items.codec_items import ImageItem_HEVC
    from ..image.pixel_image import (PixelImage, Channel, Colorspace,
                                     Chroma)
    from ..core.error import HeifError

    ctx = grid_item.ctx
    try:
        tiles = [ctx.get_item(tid) for tid in tile_ids]
        if not all(isinstance(t, ImageItem_HEVC) for t in tiles):
            return None
        for t in tiles:
            if t.init_error is not None or t.alpha_item is not None:
                return None
            from ..boxes.meta import Box_irot, Box_imir, Box_clap
            if any(isinstance(p, (Box_irot, Box_imir, Box_clap))
                   for p in t.properties()):
                return None
        if options.cancel is not None and options.cancel():
            return None
        parsed = parse_tiles([(t.config_box(), t.coded_data())
                              for t in tiles])
    except HeifError:
        return None

    sps0 = parsed[0][0]
    if any((p[0].pic_width, p[0].pic_height, p[0].bit_depth_luma) !=
           (sps0.pic_width, sps0.pic_height, sps0.bit_depth_luma)
           for p in parsed):
        return None

    syns = [p[1] for p in parsed]
    raws = [p[2] for p in parsed]
    if any(r is None for r in raws):
        raws = None

    mesh = getattr(options, "mesh", None)
    planes = decode_tiles_device(syns, raw_tus=raws, mesh=mesh)

    # compose
    tw, th = sps0.cropped_size
    gw, gh = grid.output_width, grid.output_height
    out = PixelImage(gw, gh, Colorspace.YCbCr, Chroma.C420,
                     ctx.limits)
    bd_l = sps0.bit_depth_luma
    dt = np.uint8 if bd_l <= 8 else np.uint16
    y_out = np.zeros((gh, gw), dt)
    cb_out = np.zeros(((gh + 1) // 2, (gw + 1) // 2), dt)
    cr_out = np.zeros_like(cb_out)
    n_total = len(tile_ids)
    for idx, (sps_t, pl) in enumerate(zip((p[0] for p in parsed), planes)):
        ty, tx = divmod(idx, grid.columns)
        y, cb, cr = crop_to_conformance(sps_t, *pl)
        x0, y0 = tx * tw, ty * th
        w = min(tw, gw - x0)
        h = min(th, gh - y0)
        if w <= 0 or h <= 0:
            continue
        y_out[y0:y0 + h, x0:x0 + w] = y[:h, :w].astype(dt)
        cx0, cy0 = x0 >> 1, y0 >> 1
        cww = min((w + 1) // 2, cb_out.shape[1] - cx0)
        chh = min((h + 1) // 2, cb_out.shape[0] - cy0)
        cb_out[cy0:cy0 + chh, cx0:cx0 + cww] = cb[:chh, :cww].astype(dt)
        cr_out[cy0:cy0 + chh, cx0:cx0 + cww] = cr[:chh, :cww].astype(dt)
        if options.on_progress is not None:
            options.on_progress(idx + 1, n_total)
    out.set_plane(Channel.Y, y_out, bd_l)
    out.set_plane(Channel.Cb, cb_out, sps0.bit_depth_chroma)
    out.set_plane(Channel.Cr, cr_out, sps0.bit_depth_chroma)
    return out


def try_batched_av1_grid(grid_item, grid, tile_ids, options,
                         processed_ids):
    """Batched device decode of an all-av01 grid: every tile's
    wavefront reconstruction runs as ONE device program (the AV1 analog
    of try_batched_hevc_grid); in-loop filters + compose follow on
    host.  Returns a composed PixelImage or None."""
    from ..items.codec_items import ImageItem_AVIF
    from ..image.pixel_image import (PixelImage, Channel, Colorspace,
                                     Chroma)
    from ..core.error import HeifError
    from ..codecs.av1.decoder import parse_frame, finish_frame
    from ..codecs.av1.device_recon import run_jobs_device

    ctx = grid_item.ctx
    try:
        tiles = [ctx.get_item(tid) for tid in tile_ids]
        if not all(isinstance(t, ImageItem_AVIF) for t in tiles):
            return None
        for t in tiles:
            if t.init_error is not None or t.alpha_item is not None:
                return None
            from ..boxes.meta import Box_irot, Box_imir, Box_clap
            if any(isinstance(p, (Box_irot, Box_imir, Box_clap))
                   for p in t.properties()):
                return None
        if options.cancel is not None and options.cancel():
            return None
        parsed = []
        for t in tiles:
            cfg = t.config_box()
            stream = (cfg.config_obus or b"") + t.coded_data() \
                if cfg is not None else t.coded_data()
            parsed.append(parse_frame(stream))
    except HeifError:
        return None

    decs = [p[2] for p in parsed]
    shapes = {d.planes[0].shape for d in decs}
    if len(shapes) != 1 or any(d.bd != decs[0].bd for d in decs):
        return None
    try:
        run_jobs_device(decs)
    except ValueError:
        return None

    planes0 = finish_frame(*parsed[0])
    mono = "U" not in planes0
    tw = planes0["Y"].shape[1]
    th = planes0["Y"].shape[0]
    gw, gh = grid.output_width, grid.output_height
    out = PixelImage(gw, gh,
                     Colorspace.Monochrome if mono else Colorspace.YCbCr,
                     Chroma.Monochrome if mono else Chroma.C420,
                     ctx.limits)
    dt = np.uint8
    y_out = np.zeros((gh, gw), dt)
    if not mono:
        cb_out = np.zeros(((gh + 1) // 2, (gw + 1) // 2), dt)
        cr_out = np.zeros_like(cb_out)
    n_total = len(tile_ids)
    for idx, p in enumerate(parsed):
        pl = planes0 if idx == 0 else finish_frame(*p)
        ty, tx = divmod(idx, grid.columns)
        x0, y0 = tx * tw, ty * th
        w = min(tw, gw - x0)
        h = min(th, gh - y0)
        if w <= 0 or h <= 0:
            continue
        y_out[y0:y0 + h, x0:x0 + w] = pl["Y"][:h, :w].astype(dt)
        if not mono:
            cx0, cy0 = x0 >> 1, y0 >> 1
            cww = min((w + 1) // 2, cb_out.shape[1] - cx0)
            chh = min((h + 1) // 2, cb_out.shape[0] - cy0)
            cb_out[cy0:cy0 + chh, cx0:cx0 + cww] = \
                pl["U"][:chh, :cww].astype(dt)
            cr_out[cy0:cy0 + chh, cx0:cx0 + cww] = \
                pl["V"][:chh, :cww].astype(dt)
        if options.on_progress is not None:
            options.on_progress(idx + 1, n_total)
    out.set_plane(Channel.Y, y_out, 8)
    if not mono:
        out.set_plane(Channel.Cb, cb_out, 8)
        out.set_plane(Channel.Cr, cr_out, 8)
    return out
