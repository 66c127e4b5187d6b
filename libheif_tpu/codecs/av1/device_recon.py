"""AV1 intra reconstruction on the TPU (jnp under jit).

The AV1 counterpart of codecs/hevc/device_recon.py — replaces the pixel
work the reference outsources to dav1d/aom (reference:
libheif/plugins/decoder_dav1d.cc, decoder_aom.cc).  Entropy decode
stays host-side (tile.py → TxbJob list); reconstruction runs as ONE
jitted program:

  stage A  dequant + inverse transforms   batched butterfly networks
                                          per (size, 1-D kind) group —
                                          the staged AV1 transforms with
                                          their internal roundings, ported
                                          verbatim to jnp (itx.py is the
                                          difftest anchor)
  stage B  intra prediction + recon       lax.scan over dependency waves;
                                          per-job reference GATHER INDEX
                                          arrays are precomputed on host
                                          by running the reference gather
                                          code over an index plane, so
                                          fills/replication/availability
                                          all resolve to plain gathers

Job kinds: normal intra (DC/PAETH/SMOOTH*/directional incl. edge filter
+ upsampling, optional CfL), filter-intra (sequential 4x2 patch loop,
batched across blocks), palette (pred precomputed at parse).  All
arithmetic int32; conforming 8-bit streams keep intermediates within
int32 like dav1d's 8bpc path.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from . import tables as T
from . import itx as ITX
from .recon import (_pred_tables, _edge_filter_strength, _use_upsample,
                    _EDGE_KERNELS, _load)
from .tile import TileDecoder, TxbJob

# ---------------------------------------------------------------- helpers

_SENT_BASE_M1 = -1    # base - 1
_SENT_BASE_P1 = -2    # base + 1
_SENT_BASE = -3       # base

# flat smooth-weight table offsets per size (recon sm_weights layout)
_SM_OFF = {4: 0, 8: 4, 16: 12, 32: 28, 64: 60}


def _pow2_bucket(n: int, lo: int = 8) -> int:
    v = lo
    while v < n:
        v *= 2
    return v


def _ref_indices(job: TxbJob, ipl: np.ndarray):
    """Gather-index simulation of recon.predict_intra's reference
    assembly: run the identical fill/replication logic over an index
    plane (ipl[y, x] = flat buffer position).  Returns
    (above (w+h+7,), left (w+h+7,), corner scalar) int64 arrays whose
    negative entries are the _SENT_* constants."""
    x, y, w, h = job.px, job.py, job.tw, job.th
    ph, pw = ipl.shape
    L = w + h + 7
    above = np.zeros(L, np.int64)
    left = np.zeros(L, np.int64)
    if job.have_above:
        src = ipl[y - 1, x:x + w]
        if len(src) < w:
            src = np.concatenate([src, np.full(w - len(src), src[-1])])
        above[:w] = src
        ntr = min(job.n_tr, w)
        if ntr > 0:
            ext = ipl[y - 1, x + w:x + w + ntr]
            above[w:w + len(ext)] = ext
            above[w + len(ext):] = ext[-1] if len(ext) else src[-1]
        else:
            above[w:] = src[-1]
    else:
        above[:] = ipl[y, x - 1] if job.have_left else _SENT_BASE_M1
    if job.have_left:
        src = ipl[y:y + h, x - 1]
        if len(src) < h:
            src = np.concatenate([src, np.full(h - len(src), src[-1])])
        left[:h] = src
        nbl = min(job.n_bl, h)
        if nbl > 0:
            ext = ipl[y + h:y + h + nbl, x - 1]
            left[h:h + len(ext)] = ext
            left[h + len(ext):] = ext[-1] if len(ext) else src[-1]
        else:
            left[h:] = src[-1]
    else:
        left[:] = above[0] if job.have_above else _SENT_BASE_P1
    if job.have_above and job.have_left:
        corner = int(ipl[y - 1, x - 1])
    elif job.have_above:
        corner = int(above[0])
    elif job.have_left:
        corner = int(left[0])
    else:
        corner = _SENT_BASE
    return above, left, corner


def _fi_edge_indices(job: TxbJob, ipl: np.ndarray):
    """Index simulation of predict_filter_intra's edge assembly:
    top row (w+1 incl. corner) and left col (h)."""
    x, y, w, h = job.px, job.py, job.tw, job.th
    top = np.zeros(w + 1, np.int64)     # top[0] = corner
    lft = np.zeros(h, np.int64)
    if job.have_above:
        src = ipl[y - 1, x:x + w]
        if len(src) < w:
            src = np.concatenate([src, np.full(w - len(src), src[-1])])
        top[1:] = src
    else:
        top[1:] = ipl[y, x - 1] if job.have_left else _SENT_BASE_M1
    if job.have_left:
        src = ipl[y:y + h, x - 1]
        if len(src) < h:
            src = np.concatenate([src, np.full(h - len(src), src[-1])])
        lft[:] = src
    else:
        lft[:] = top[1] if job.have_above else _SENT_BASE_P1
    if job.have_above and job.have_left:
        top[0] = ipl[y - 1, x - 1]
    elif job.have_above:
        top[0] = top[1]
    elif job.have_left:
        top[0] = lft[0]
    else:
        top[0] = _SENT_BASE
    return top, lft


def _cfl_indices(job: TxbJob, luma_ipl: np.ndarray, ssx: int, ssy: int):
    """Index simulation of the CfL luma box-subsample incl. cfl_pad:
    returns list of (th, tw) index grids (the box members) + Q3 shift."""
    tw, th = job.tw, job.th
    ph, pw = luma_ipl.shape
    ly, lx = job.py << ssy, job.px << ssx
    if ssx and ssy:
        members = [(0, 0), (0, 1), (1, 0), (1, 1)]
        step_y, step_x, q3s = 2, 2, 1
    elif ssx:
        members = [(0, 0), (0, 1)]
        step_y, step_x, q3s = 1, 2, 2
    else:
        members = [(0, 0)]
        step_y, step_x, q3s = 1, 1, 3
    # valid box counts before the pad kicks in
    bh = min(th, max(0, (ph - ly + step_y - 1) // step_y))
    bw = min(tw, max(0, (pw - lx + step_x - 1) // step_x))
    r = np.minimum(np.arange(th), max(bh - 1, 0))[:, None]
    c = np.minimum(np.arange(tw), max(bw - 1, 0))[None, :]
    grids = []
    for dy, dx in members:
        gy = np.minimum(ly + r * step_y + dy, ph - 1)
        gx = np.minimum(lx + c * step_x + dx, pw - 1)
        grids.append(luma_ipl[gy, gx])
    return grids, q3s


# ---------------------------------------------------------------- plan

@dataclass
class _PredGroup:
    kind: str                 # "n" | "fi" | "pal"
    sq: int                   # square size bucket (jobs padded into it)
    n: int
    n_pad: int
    k: int
    arrays: Dict[str, np.ndarray]
    starts: np.ndarray
    counts: np.ndarray
    # residual sub-batches: (subkey, row_indices) computed by stage A
    res_subs: List[Tuple[tuple, np.ndarray]]


@dataclass
class Av1Plan:
    t: int
    bd: int
    luma_shape: Tuple[int, int]
    chroma_shape: Tuple[int, int]
    num_planes: int
    n_waves: int
    groups: List[_PredGroup]
    enable_edge_filter: bool


def build_plan(decs: Sequence[TileDecoder]) -> Av1Plan:
    """Wavefront schedule over the deferred TxbJobs of a picture batch
    (all pictures must share shape/depth — av01 grid tiles do)."""
    d0 = decs[0]
    bd = d0.bd
    lh, lw = d0.planes[0].shape
    num_planes = len(d0.planes)
    ch_, cw_ = (d0.planes[1].shape if num_planes > 1 else (0, 0))
    T_ = len(decs)
    for d in decs:
        if d.planes[0].shape != (lh, lw) or d.bd != bd or \
                len(d.planes) != num_planes:
            raise ValueError("batch pictures must share shape/depth")

    luma_sz = lh * lw
    chroma_sz = ch_ * cw_
    # ONE flat buffer holds every plane of every picture: per-picture
    # stride S = luma + 2*chroma, so all gathers (incl. CfL's luma
    # reads from chroma jobs) target a single array
    stride = luma_sz + 2 * chroma_sz
    trash = T_ * stride
    sm_w, dr = _pred_tables()

    staging: Dict[tuple, Dict[str, list]] = {}

    def stage(key):
        if key not in staging:
            staging[key] = {}
        return staging[key]

    def put(st, **kw):
        for k, v in kw.items():
            st.setdefault(k, []).append(v)

    max_wave = 0
    for t_idx, dec in enumerate(decs):
        ssx, ssy = dec.ssx, dec.ssy
        pic_base = t_idx * stride
        # index planes: flat buffer position per sample
        ipls = [np.arange(luma_sz, dtype=np.int64).reshape(lh, lw)
                + pic_base]
        if num_planes > 1:
            for c in (1, 2):
                ipls.append(np.arange(chroma_sz, dtype=np.int64)
                            .reshape(ch_, cw_) + pic_base + luma_sz +
                            (c - 1) * chroma_sz)
        writer = np.zeros(stride, np.int32)

        fh = dec.fh
        q = fh.quant
        for job in dec.jobs:
            plane = job.plane
            ipl = ipls[plane]
            tw, th = job.tw, job.th
            reads_p = []          # (plane_kind==this plane) read positions
            reads_l = []          # luma reads (cfl) when plane > 0

            if job.pal_pred is not None:
                kind = "pal"
                above = left = None
                corner = 0
            elif plane == 0 and job.fi_mode is not None:
                kind = "fi"
                top_idx, left_idx = _fi_edge_indices(job, ipl)
                reads_p.extend([top_idx[top_idx >= 0],
                                left_idx[left_idx >= 0]])
            else:
                kind = "n"
                above, left, corner = _ref_indices(job, ipl)
                reads_p.extend([above[above >= 0], left[left >= 0]])
                if corner >= 0:
                    reads_p.append(np.array([corner]))

            sq = max(tw, th)              # square size bucket
            cfl_grids = None
            q3s = 0
            if job.is_cfl:
                cfl_grids, q3s = _cfl_indices(job, ipls[0], ssx, ssy)
                reads_l.append(np.concatenate([g.ravel()
                                               for g in cfl_grids]))

            # ---- wave = 1 + max writer over all reads ----
            wave = 0
            if reads_p:
                rp = np.concatenate(reads_p)
                if len(rp):
                    wave = int(writer[rp - pic_base].max()) + 1
            if reads_l:
                rl = np.concatenate(reads_l)
                if len(rl):
                    wave = max(wave,
                               int(writer[rl - pic_base].max()) + 1)
            max_wave = max(max_wave, wave)

            # ---- scatter indices (padded to the square bucket;
            # lanes beyond the true block land in the trash slot) ----
            pw = lw if plane == 0 else cw_
            sy = np.arange(job.hh)[:, None]
            sx = np.arange(job.ww)[None, :]
            base = ipl[job.py, job.px]
            full = np.full((sq, sq), trash, np.int64)
            full[:job.hh, :job.ww] = base + sy * pw + sx
            scat = full.ravel()

            # ---- dequant scalars ----
            if plane == 0:
                dc_d, ac_d = q.delta_q_y_dc, 0
            elif plane == 1:
                dc_d, ac_d = q.delta_q_u_dc, q.delta_q_u_ac
            else:
                dc_d, ac_d = q.delta_q_v_dc, q.delta_q_v_ac
            dc_q = int(T.DC_QLOOKUP[np.clip(job.qindex + dc_d, 0, 255)])
            ac_q = int(T.AC_QLOOKUP[np.clip(job.qindex + ac_d, 0, 255)])

            cs = min(sq, 32)
            coeffs = np.zeros((cs, cs), np.int64)
            if job.coeffs is not None:
                c2 = np.asarray(job.coeffs, np.int64)
                coeffs[:c2.shape[0], :c2.shape[1]] = c2
            lossless = bool(fh.coded_lossless)
            if job.eob > 0 and not lossless:
                vk, hk, ud, lr = ITX._TX1D[job.tx_type]
                subkey = (tw, th, vk, hk, ud, lr)
            else:
                subkey = ("skip",) if job.eob == 0 else ("wht", tw, th)

            key = (kind, sq)
            st = stage(key)
            common = dict(wave=np.int32(wave), scat=scat.astype(np.int32),
                          coeffs=coeffs.astype(np.int32),
                          dc_q=np.int32(dc_q), ac_q=np.int32(ac_q),
                          subkey=subkey)
            if kind == "n":
                angle_ok = job.mode in T.MODE_TO_ANGLE
                p_angle = (T.MODE_TO_ANGLE[job.mode] + job.angle * 3) \
                    if angle_ok else 0
                ups_a = ups_l = 0
                str_a = str_l = 0
                cornerf = 0
                na_f = nl_f = 0
                if d0.seq.enable_intra_edge_filter and angle_ok and \
                        p_angle not in (90, 180):
                    if 90 < p_angle < 180 and (tw + th) >= 24:
                        cornerf = 1
                    if job.have_above:
                        str_a = _edge_filter_strength(
                            tw, th, p_angle - 90, job.filt_type)
                        na_f = tw + (th if p_angle < 90 else 0) + 1
                    if job.have_left:
                        str_l = _edge_filter_strength(
                            tw, th, p_angle - 180, job.filt_type)
                        nl_f = th + (tw if p_angle > 180 else 0) + 1
                if d0.seq.enable_intra_edge_filter and angle_ok:
                    ups_a = _use_upsample(tw, th, p_angle - 90,
                                          job.filt_type) \
                        if job.have_above else 0
                    ups_l = _use_upsample(tw, th, p_angle - 180,
                                          job.filt_type) \
                        if job.have_left else 0
                dx = int(dr[p_angle]) if 0 < p_angle < 90 else \
                    int(dr[180 - p_angle]) if 90 < p_angle < 180 else 0
                dy = int(dr[p_angle - 90]) if 90 < p_angle < 180 else \
                    int(dr[270 - p_angle]) if 180 < p_angle < 270 else 0
                L2 = 2 * sq + 7
                above_p = np.full(L2, above[-1], np.int32)
                above_p[:len(above)] = above
                left_p = np.full(L2, left[-1], np.int32)
                left_p[:len(left)] = left
                if cfl_grids is not None:
                    cfl_p = np.zeros((len(cfl_grids), sq, sq), np.int32)
                    for gi_, g in enumerate(cfl_grids):
                        cfl_p[gi_, :th, :tw] = g
                else:
                    cfl_p = np.zeros((_n_cfl_members(ssx, ssy), sq, sq),
                                     np.int32)
                put(st, above=above_p,
                    left=left_p,
                    corner=np.int32(corner),
                    mode=np.int32(job.mode),
                    wv=np.int32(tw), hv=np.int32(th),
                    lgw=np.int32(tw.bit_length() - 1),
                    lgh=np.int32(th.bit_length() - 1),
                    smo_w=np.int32(_SM_OFF[tw]),
                    smo_h=np.int32(_SM_OFF[th]),
                    p_angle=np.int32(p_angle),
                    dx=np.int32(dx), dy=np.int32(dy),
                    ups_a=np.int32(ups_a), ups_l=np.int32(ups_l),
                    str_a=np.int32(str_a), str_l=np.int32(str_l),
                    na_f=np.int32(na_f), nl_f=np.int32(nl_f),
                    cornerf=np.int32(cornerf),
                    have_above=np.bool_(job.have_above),
                    have_left=np.bool_(job.have_left),
                    is_cfl=np.bool_(job.is_cfl),
                    cfl_alpha=np.int32(job.cfl_alpha),
                    q3s=np.int32(q3s),
                    cfl_idx=cfl_p,
                    **common)
            elif kind == "fi":
                top_p = np.full(sq + 1, top_idx[-1], np.int32)
                top_p[:len(top_idx)] = top_idx
                left_p = np.full(sq, left_idx[-1], np.int32)
                left_p[:len(left_idx)] = left_idx
                put(st, top_idx=top_p, left_idx=left_p,
                    fi_mode=np.int32(job.fi_mode),
                    wv=np.int32(tw), hv=np.int32(th), **common)
            else:
                pp = np.zeros((sq, sq), np.int32)
                pp[:th, :tw] = np.asarray(job.pal_pred, np.int32)
                put(st, pred=pp, **common)

            # ---- place writes ----
            writer[full[:job.hh, :job.ww].ravel() - pic_base] = wave

    n_waves = max_wave + 1
    n_waves_pad = ((n_waves + 31) // 32) * 32

    groups: List[_PredGroup] = []
    for key in sorted(staging, key=lambda k: (k[0], -k[1])):
        st = staging[key]
        kind, sq = key
        waves = np.asarray(st["wave"], np.int32)
        n_real = len(waves)
        order = np.argsort(waves, kind="stable")
        ws = waves[order]
        starts = np.searchsorted(ws, np.arange(n_waves_pad)) \
            .astype(np.int32)
        counts = (np.searchsorted(ws, np.arange(n_waves_pad) + 1)
                  .astype(np.int32) - starts)
        k = _pow2_bucket(max(1, int(counts.max())), lo=4)
        n_pad = _pow2_bucket(n_real, lo=4) + k

        arrays = {}
        for name, vals in st.items():
            if name in ("subkey",):
                continue
            a = np.asarray([vals[i] for i in order])
            pad_shape = (n_pad,) + a.shape[1:]
            fill = trash if name == "scat" else 0
            full = np.full(pad_shape, fill, a.dtype)
            full[:n_real] = a
            arrays[name] = full

        # residual sub-batches (indices are rows in the SORTED order)
        subkeys = [st["subkey"][i] for i in order]
        subs: Dict[tuple, list] = {}
        for i, sk in enumerate(subkeys):
            if sk[0] != "skip":
                subs.setdefault(sk, []).append(i)
        res_subs = [(sk, np.asarray(rows, np.int32))
                    for sk, rows in sorted(subs.items())]

        groups.append(_PredGroup(
            kind=kind, sq=sq, n=n_real, n_pad=n_pad, k=k,
            arrays=arrays, starts=starts, counts=counts,
            res_subs=res_subs))

    return Av1Plan(t=T_, bd=bd, luma_shape=(lh, lw),
                   chroma_shape=(ch_, cw_), num_planes=num_planes,
                   n_waves=n_waves_pad, groups=groups,
                   enable_edge_filter=bool(d0.seq.enable_intra_edge_filter))


def _n_cfl_members(ssx: int, ssy: int) -> int:
    return 4 if (ssx and ssy) else (2 if ssx else 1)


# ===========================================================================
# device program
# ===========================================================================

def _plan_meta(plan: Av1Plan):
    gmeta = tuple(
        (g.kind, g.sq, g.n_pad, g.k,
         tuple((sk, len(rows)) for sk, rows in g.res_subs),
         tuple(sorted((name, a.shape[1:], str(a.dtype))
                      for name, a in g.arrays.items())))
        for g in plan.groups)
    return (plan.t, plan.bd, plan.luma_shape, plan.chroma_shape,
            plan.num_planes, plan.n_waves, gmeta,
            plan.enable_edge_filter)


def _plan_arrays(plan: Av1Plan):
    arrays = {}
    for i, g in enumerate(plan.groups):
        for name, a in g.arrays.items():
            arrays[f"g{i}_{name}"] = a
        arrays[f"g{i}_starts"] = g.starts
        arrays[f"g{i}_counts"] = g.counts
        for j, (sk, rows) in enumerate(g.res_subs):
            arrays[f"g{i}_sub{j}"] = rows
    return arrays


def _round2_j(x, n):
    if n == 0:
        return x
    return (x + (1 << (n - 1))) >> n


@functools.lru_cache(maxsize=64)
def _build_program(meta):
    import jax
    import jax.numpy as jnp
    from jax import lax

    (T_, bd, (lh, lw), (ch_, cw_), num_planes, n_waves, gmeta,
     edge_en) = meta
    luma_sz = lh * lw
    chroma_sz = ch_ * cw_
    stride = luma_sz + 2 * chroma_sz
    trash = T_ * stride
    maxv = (1 << bd) - 1
    base = 1 << (bd - 1)

    sm_w_np, _dr = _pred_tables()
    sm_flat = jnp.asarray(np.concatenate(
        [sm_w_np[n] for n in (4, 8, 16, 32, 64)]), jnp.int32)
    edge_kernels = jnp.asarray([[0, 16, 0, 0, 0]] + _EDGE_KERNELS,
                               jnp.int32)      # strength 0 = identity
    fi_taps = jnp.asarray(_load()["filter_intra_taps"], jnp.int32)

    def refvals(buf, idx):
        """Resolve sentinel-coded gather indices."""
        v = buf[jnp.clip(idx, 0, trash)]
        v = jnp.where(idx == _SENT_BASE_M1, base - 1, v)
        v = jnp.where(idx == _SENT_BASE_P1, base + 1, v)
        v = jnp.where(idx == _SENT_BASE, base, v)
        return v

    def _rdyn(x, n):
        """Round2 with per-element shift n (n >= 1)."""
        return (x + (1 << jnp.maximum(n - 1, 0))) >> n

    def _wht1_j(v):
        a = v[..., 0]
        c = v[..., 1]
        d = v[..., 2]
        b = v[..., 3]
        a = a + c
        d = d - b
        e = (a - d) >> 1
        b = e - b
        c = e - c
        a = a - b
        d = d + c
        return jnp.stack([a, b, c, d], axis=-1)

    # ------------------------------------------------------ stage A: itx

    def residuals(gi, sq, n_pad, subs, arrays):
        res = jnp.zeros((n_pad, sq, sq), jnp.int32)
        cs = min(sq, 32)
        coeffs = arrays[f"g{gi}_coeffs"]          # (n_pad, cs, cs)
        dc_q = arrays[f"g{gi}_dc_q"]
        ac_q = arrays[f"g{gi}_ac_q"]

        for j, (sk, n_rows) in enumerate(subs):
            rows = arrays[f"g{gi}_sub{j}"]        # (n_rows,)
            dq = ac_q[rows][:, None, None]
            dcq = dc_q[rows]
            if sk[0] == "wht":
                _, w_t, h_t = sk
                c = coeffs[rows][:, :h_t, :w_t]
                d = c * dq
                d = d.at[:, 0, 0].set(c[:, 0, 0] * dcq)
                x = d >> 2
                x = _wht1_j(x)                    # rows
                x = jnp.swapaxes(
                    _wht1_j(jnp.swapaxes(x, 1, 2)), 1, 2)  # cols
                out = x
                w_o, h_o = w_t, h_t
            else:
                w_t, h_t, vk, hk, ud, lr = sk
                ch2, cw2 = min(h_t, 32), min(w_t, 32)
                c = coeffs[rows][:, :ch2, :cw2]
                qm = jnp.broadcast_to(dq, c.shape)
                qm = qm.at[:, 0, 0].set(dcq)
                pels = w_t * h_t
                shift = (1 if pels > 256 else 0) +                     (1 if pels > 1024 else 0)
                mag = ((jnp.abs(c) * qm) & 0xFFFFFF) >> shift
                d = jnp.where(c < 0, -mag, mag)
                buf = jnp.zeros((n_rows, h_t, w_t), jnp.int32)
                buf = buf.at[:, :ch2, :cw2].set(d)
                sh_row, sh_col = ITX._SHIFTS[(w_t, h_t)]
                if abs(w_t.bit_length() - h_t.bit_length()) == 1:
                    buf = _round2_j(buf * ITX._INV_SQRT2, 12)
                cols = [buf[:, :, i] for i in range(w_t)]
                rows_out = ITX._txfm1d(hk, w_t)(cols)
                rows_out = [_round2_j(v, -sh_row) for v in rows_out]
                mid = jnp.stack(rows_out, axis=2)     # (R, h, w)
                if lr:
                    mid = mid[:, :, ::-1]
                rr = [mid[:, i, :] for i in range(h_t)]
                cols_out = ITX._txfm1d(vk, h_t)(rr)
                cols_out = [_round2_j(v, -sh_col) for v in cols_out]
                out = jnp.stack(cols_out, axis=1)     # (R, h, w)
                if ud:
                    out = out[:, ::-1, :]
                w_o, h_o = w_t, h_t
            res = res.at[rows[:, None, None],
                         jnp.arange(h_o)[None, :, None],
                         jnp.arange(w_o)[None, None, :]].set(
                out.astype(jnp.int32))
        return res

    # -------------------------------------------------- stage B: predict

    def predict_normal(gi, sq, k, buf, arrays, sl):
        """Batched predict_intra over K jobs padded into an (sq, sq)
        bucket; true (w, h) are per-job dynamic values — lanes outside
        the true block are discarded by the trash scatter."""
        L = 2 * sq + 7
        ai = sl(arrays[f"g{gi}_above"])            # (K, L)
        li = sl(arrays[f"g{gi}_left"])
        ci = sl(arrays[f"g{gi}_corner"])           # (K,)
        mode = sl(arrays[f"g{gi}_mode"])
        wv = sl(arrays[f"g{gi}_wv"])
        hv = sl(arrays[f"g{gi}_hv"])
        lgw = sl(arrays[f"g{gi}_lgw"])
        lgh = sl(arrays[f"g{gi}_lgh"])
        smo_w = sl(arrays[f"g{gi}_smo_w"])
        smo_h = sl(arrays[f"g{gi}_smo_h"])
        p_angle = sl(arrays[f"g{gi}_p_angle"])
        dxv = sl(arrays[f"g{gi}_dx"])
        dyv = sl(arrays[f"g{gi}_dy"])
        ups_a = sl(arrays[f"g{gi}_ups_a"])
        ups_l = sl(arrays[f"g{gi}_ups_l"])
        str_a = sl(arrays[f"g{gi}_str_a"])
        str_l = sl(arrays[f"g{gi}_str_l"])
        na_f = sl(arrays[f"g{gi}_na_f"])
        nl_f = sl(arrays[f"g{gi}_nl_f"])
        cornerf = sl(arrays[f"g{gi}_cornerf"])
        ha = sl(arrays[f"g{gi}_have_above"])
        hl = sl(arrays[f"g{gi}_have_left"])

        refs_a = refvals(buf, ai)                  # (K, L) int32
        refs_l = refvals(buf, li)
        corner = refvals(buf, ci)                  # (K,)

        x1 = lax.broadcasted_iota(jnp.int32, (sq, sq), 1)[None]
        y1 = lax.broadcasted_iota(jnp.int32, (sq, sq), 0)[None]
        iL = jnp.arange(L, dtype=jnp.int32)[None, :]

        # ---- DC ----
        sum_a = jnp.where(iL < wv[:, None], refs_a, 0).sum(axis=1)
        sum_l = jnp.where(iL < hv[:, None], refs_l, 0).sum(axis=1)
        dc_b = (sum_a + sum_l + ((wv + hv) >> 1)) // (wv + hv)
        dc_a = _rdyn(sum_a, lgw)
        dc_l = _rdyn(sum_l, lgh)
        dc = jnp.where(ha & hl, dc_b,
                       jnp.where(ha, dc_a, jnp.where(hl, dc_l, base)))
        dcp = jnp.broadcast_to(dc[:, None, None], (k, sq, sq))

        # ---- PAETH ----
        t_ = refs_a[:, :sq][:, None, :]
        l_ = refs_l[:, :sq][:, :, None]
        tl = corner[:, None, None]
        pbase = t_ + l_ - tl
        pl = jnp.abs(pbase - l_)
        pt = jnp.abs(pbase - t_)
        ptl = jnp.abs(pbase - tl)
        paeth = jnp.where((pl <= pt) & (pl <= ptl),
                          jnp.broadcast_to(l_, (k, sq, sq)),
                          jnp.where(pt <= ptl,
                                    jnp.broadcast_to(t_, (k, sq, sq)),
                                    tl))

        # ---- SMOOTH / SMOOTH_V / SMOOTH_H ----
        wvert = sm_flat[jnp.clip(
            smo_h[:, None] + jnp.minimum(y1[0, :, 0][None],
                                         hv[:, None] - 1),
            0, sm_flat.shape[0] - 1)][:, :, None]       # (K, sq, 1)
        whorz = sm_flat[jnp.clip(
            smo_w[:, None] + jnp.minimum(x1[0, 0, :][None],
                                         wv[:, None] - 1),
            0, sm_flat.shape[0] - 1)][:, None, :]       # (K, 1, sq)
        below = jnp.take_along_axis(refs_l, hv[:, None] - 1,
                                    axis=1)[:, 0][:, None, None]
        right = jnp.take_along_axis(refs_a, wv[:, None] - 1,
                                    axis=1)[:, 0][:, None, None]
        sv = wvert * t_ + (256 - wvert) * below
        sh2 = whorz * l_ + (256 - whorz) * right
        smooth = _round2_j(sv + sh2, 9)
        smooth_v = _round2_j(sv, 8)
        smooth_h = _round2_j(sh2, 8)

        # ---- directional ----
        arow = jnp.concatenate([corner[:, None], refs_a], axis=1)
        lcol = jnp.concatenate([corner[:, None], refs_l], axis=1)
        EL = 1 + L
        if edge_en:
            sC = _round2_j(5 * arow[:, 1] + 6 * corner +
                           5 * lcol[:, 1], 4)
            use_cf = cornerf > 0
            arow = arow.at[:, 0].set(jnp.where(use_cf, sC, arow[:, 0]))
            lcol = lcol.at[:, 0].set(jnp.where(use_cf, sC, lcol[:, 0]))

            def edge_filter(ebuf, nf, strength):
                kern = edge_kernels[jnp.clip(strength, 0, 3)]   # (K, 5)
                i = jnp.arange(EL, dtype=jnp.int32)[None, :]
                acc = jnp.zeros_like(ebuf)
                for jj in range(5):
                    idx = jnp.clip(i - 2 + jj, 0,
                                   jnp.maximum(nf[:, None] - 1, 0))
                    acc = acc + kern[:, jj][:, None] * \
                        jnp.take_along_axis(ebuf, idx, axis=1)
                filt = (acc + 8) >> 4
                on = (strength > 0)[:, None] & (i >= 1) & \
                    (i < nf[:, None])
                return jnp.where(on, filt, ebuf)

            arow = edge_filter(arow, na_f, str_a)
            lcol = edge_filter(lcol, nl_f, str_l)

        UL = 2 + 4 * sq + 8

        def upsample(ebuf, n_up):
            kk = jnp.arange(-2, 2 * sq + 2, dtype=jnp.int32)[None, :]
            n1 = jnp.maximum(n_up[:, None] - 1, 0)
            e_idx = jnp.clip(jnp.minimum(kk, n1), 0, EL - 2) + 1
            sv_ = jnp.where(kk < 0, ebuf[:, 0][:, None],
                            jnp.take_along_axis(ebuf, e_idx, axis=1))
            pos = jnp.arange(UL, dtype=jnp.int32)[None, :]
            kq = (pos - 2) >> 1
            is_even = (pos & 1) == 0
            keff = jnp.minimum(kq, n1)
            even_v = jnp.take_along_axis(
                sv_, jnp.clip(keff + 2, 0, sv_.shape[1] - 1), axis=1)
            km = jnp.minimum(kq, n1 - 1)
            g = lambda off: jnp.take_along_axis(
                sv_, jnp.clip(km + 2 + off, 0, sv_.shape[1] - 1),
                axis=1)
            odd_raw = -g(-1) + 9 * g(0) + 9 * g(1) - g(2)
            odd_v = jnp.clip(_round2_j(odd_raw, 4), 0, maxv)
            last = jnp.take_along_axis(
                sv_, jnp.clip(n1 + 2, 0, sv_.shape[1] - 1), axis=1)
            beyond = pos > (2 + 2 * n1)
            out = jnp.where(is_even, even_v, odd_v)
            out = jnp.where(beyond, last, out)
            return out

        n_up_a = jnp.where(p_angle < 90, wv + hv, wv)
        n_up_l = jnp.where(p_angle > 180, wv + hv, hv)
        up_a = upsample(arow, n_up_a)
        up_l = upsample(lcol, n_up_l)
        pad_a = jnp.pad(arow, ((0, 0), (0, UL - EL)), mode="edge")
        pad_l = jnp.pad(lcol, ((0, 0), (0, UL - EL)), mode="edge")
        ubuf_a = jnp.where((ups_a > 0)[:, None], up_a, pad_a)
        ubuf_l = jnp.where((ups_l > 0)[:, None], up_l, pad_l)
        aoff = jnp.where(ups_a > 0, 2, 1)[:, None, None]
        loff = jnp.where(ups_l > 0, 2, 1)[:, None, None]
        upa = ups_a[:, None, None]
        upl = ups_l[:, None, None]

        def interp(ub, idx):
            i0 = jnp.clip(idx, 0, UL - 1).reshape(k, -1)
            i1 = jnp.clip(idx + 1, 0, UL - 1).reshape(k, -1)
            v0 = jnp.take_along_axis(ub, i0, axis=1).reshape(k, sq, sq)
            v1 = jnp.take_along_axis(ub, i1, axis=1).reshape(k, sq, sq)
            return v0, v1

        dxb = dxv[:, None, None]
        dyb = dyv[:, None, None]
        wb = wv[:, None, None]
        hb = hv[:, None, None]
        # zone 1 (0 < angle < 90): from above
        idx1 = (y1 + 1) * dxb
        b1 = (idx1 >> (6 - upa)) + (x1 << upa)
        sh1 = ((idx1 << upa) >> 1) & 0x1F
        maxb_a = ((wb + hb - 1) << upa)
        v0, v1 = interp(ubuf_a, aoff + b1)
        z1 = _round2_j(v0 * (32 - sh1) + v1 * sh1, 5)
        vmaxa = jnp.take_along_axis(
            ubuf_a, jnp.clip((aoff + maxb_a)[:, 0, 0], 0,
                             UL - 1)[:, None], axis=1)
        z1 = jnp.where(b1 < maxb_a, z1, vmaxa[:, :, None])

        # zone 2 (90 < angle < 180): above or left
        idx2 = (x1 << 6) - (y1 + 1) * dxb
        b2 = idx2 >> (6 - upa)
        sh2a = ((idx2 << upa) >> 1) & 0x1F
        v0, v1 = interp(ubuf_a, aoff + b2)
        z2a = _round2_j(v0 * (32 - sh2a) + v1 * sh2a, 5)
        idx2l = (y1 << 6) - (x1 + 1) * dyb
        b2l = idx2l >> (6 - upl)
        sh2l = ((idx2l << upl) >> 1) & 0x1F
        v0, v1 = interp(ubuf_l, loff + b2l)
        z2l = _round2_j(v0 * (32 - sh2l) + v1 * sh2l, 5)
        z2 = jnp.where(b2 >= -(1 << upa), z2a, z2l)

        # zone 3 (180 < angle < 270): from left
        idx3 = (x1 + 1) * dyb
        b3 = (idx3 >> (6 - upl)) + (y1 << upl)
        sh3 = ((idx3 << upl) >> 1) & 0x1F
        maxb_l = ((wb + hb - 1) << upl)
        v0, v1 = interp(ubuf_l, loff + b3)
        z3 = _round2_j(v0 * (32 - sh3) + v1 * sh3, 5)
        vmaxl = jnp.take_along_axis(
            ubuf_l, jnp.clip((loff + maxb_l)[:, 0, 0], 0,
                             UL - 1)[:, None], axis=1)
        z3 = jnp.where(b3 < maxb_l, z3, vmaxl[:, :, None])

        pa = p_angle[:, None, None]
        v90 = jnp.take_along_axis(
            ubuf_a, (aoff[:, :, 0] + x1[0, 0, :][None]).reshape(k, -1),
            axis=1).reshape(k, 1, sq)
        v90 = jnp.broadcast_to(v90, (k, sq, sq))
        v180 = jnp.take_along_axis(
            ubuf_l, (loff[:, :, 0] + y1[0, :, 0][None]).reshape(k, -1),
            axis=1).reshape(k, sq, 1)
        v180 = jnp.broadcast_to(v180, (k, sq, sq))
        dirp = jnp.where(pa < 90, z1,
                         jnp.where(pa == 90, v90,
                                   jnp.where(pa < 180, z2,
                                             jnp.where(pa == 180, v180,
                                                       z3))))
        dirp = jnp.clip(dirp, 0, maxv)

        pred = jnp.where((mode == T.DC_PRED)[:, None, None], dcp,
                jnp.where((mode == T.PAETH_PRED)[:, None, None], paeth,
                 jnp.where((mode == T.SMOOTH_PRED)[:, None, None], smooth,
                  jnp.where((mode == T.SMOOTH_V_PRED)[:, None, None],
                            smooth_v,
                   jnp.where((mode == T.SMOOTH_H_PRED)[:, None, None],
                             smooth_h, dirp)))))
        return pred

    def apply_cfl(gi, sq, k, buf, arrays, sl, pred):
        is_cfl = sl(arrays[f"g{gi}_is_cfl"])
        alpha = sl(arrays[f"g{gi}_cfl_alpha"])
        q3s = sl(arrays[f"g{gi}_q3s"])
        wv = sl(arrays[f"g{gi}_wv"])
        hv = sl(arrays[f"g{gi}_hv"])
        lgw = sl(arrays[f"g{gi}_lgw"])
        lgh = sl(arrays[f"g{gi}_lgh"])
        cidx = sl(arrays[f"g{gi}_cfl_idx"])        # (K, M, sq, sq)
        vals = buf[jnp.clip(cidx, 0, trash)]
        q3 = vals.sum(axis=1) << q3s[:, None, None]
        x1 = lax.broadcasted_iota(jnp.int32, (sq, sq), 1)[None]
        y1 = lax.broadcasted_iota(jnp.int32, (sq, sq), 0)[None]
        valid = (x1 < wv[:, None, None]) & (y1 < hv[:, None, None])
        tot = jnp.where(valid, q3, 0).reshape(k, -1).sum(axis=1)
        # rounded average (aom subtract_average; matches tile.py)
        avg = (tot + (1 << (lgw + lgh - 1))) >> (lgw + lgh)
        ac = q3 - avg[:, None, None]
        scaled = alpha[:, None, None] * ac
        adj = jnp.where(scaled >= 0, (scaled + 32) >> 6,
                        -((-scaled + 32) >> 6))
        cflp = jnp.clip(pred + adj, 0, maxv)
        return jnp.where(is_cfl[:, None, None], cflp, pred)

    def predict_fi(gi, sq, k, buf, arrays, sl):
        ti = sl(arrays[f"g{gi}_top_idx"])          # (K, sq+1)
        li = sl(arrays[f"g{gi}_left_idx"])         # (K, sq)
        fim = sl(arrays[f"g{gi}_fi_mode"])
        top = refvals(buf, ti)
        lft = refvals(buf, li)
        pb = jnp.zeros((k, sq + 1, sq + 1), jnp.int32)
        pb = pb.at[:, 0, :].set(top)
        pb = pb.at[:, 1:, 0].set(lft)
        taps = fi_taps[jnp.clip(fim, 0, 4)]        # (K, 8, 8)
        n_pc = sq // 4

        def patch_body(p, pb):
            r = 1 + 2 * (p // n_pc)
            c = 1 + 4 * (p % n_pc)
            row_above = lax.dynamic_slice(pb, (0, r - 1, c - 1),
                                          (k, 1, 5))[:, 0, :]
            l0 = lax.dynamic_slice(pb, (0, r, c - 1),
                                   (k, 1, 1))[:, 0, 0]
            l1 = lax.dynamic_slice(pb, (0, r + 1, c - 1),
                                   (k, 1, 1))[:, 0, 0]
            p7 = jnp.concatenate([row_above, l0[:, None], l1[:, None],
                                  jnp.zeros((k, 1), jnp.int32)], axis=1)
            v = jnp.einsum("koj,kj->ko", taps, p7,
                           preferred_element_type=jnp.int32)
            v = jnp.where(v >= 0, (v + 8) >> 4, -((-v + 8) >> 4))
            v = jnp.clip(v, 0, maxv)
            blk = v.reshape(k, 2, 4)
            return lax.dynamic_update_slice(pb, blk, (0, r, c))

        pb = lax.fori_loop(0, (sq // 2) * n_pc, patch_body, pb)
        return pb[:, 1:, 1:]

    # ------------------------------------------------------ full program

    def program(arrays):
        res = {}
        for gi, (kind, sq, n_pad, k, subs, _anames) in enumerate(gmeta):
            res[gi] = residuals(gi, sq, n_pad, subs, arrays)

        buf = jnp.zeros(trash + 1, jnp.int32)

        # palette jobs read nothing: apply them all before the scan
        for gi, (kind, sq, n_pad, k, subs, _anames) in enumerate(gmeta):
            if kind != "pal":
                continue
            pred = arrays[f"g{gi}_pred"]            # (n_pad, sq, sq)
            rec = jnp.clip(pred + res[gi], 0, maxv)
            sidx = arrays[f"g{gi}_scat"].reshape(-1)
            buf = buf.at[sidx].set(rec.reshape(-1), mode="drop")

        scan_groups = [
            (gi, g) for gi, g in enumerate(gmeta) if g[0] != "pal"]
        if scan_groups:
            starts = jnp.stack([arrays[f"g{gi}_starts"]
                                for gi, _ in scan_groups], axis=1)
            counts = jnp.stack([arrays[f"g{gi}_counts"]
                                for gi, _ in scan_groups], axis=1)

            def wave_body(buf, sc):
                st, cn = sc
                for pos, (gi, (kind, sq, n_pad, k, subs, _a)) in \
                        enumerate(scan_groups):
                    s0 = st[pos]

                    def process(buf, gi=gi, kind=kind, sq=sq, k=k,
                                s0=s0, cnt=cn[pos]):
                        sl = lambda a: lax.dynamic_slice_in_dim(
                            a, s0, k, axis=0)
                        if kind == "fi":
                            pred = predict_fi(gi, sq, k, buf, arrays,
                                              sl)
                        else:
                            pred = predict_normal(gi, sq, k, buf,
                                                  arrays, sl)
                            pred = apply_cfl(gi, sq, k, buf, arrays,
                                             sl, pred)
                        r = sl(res[gi])
                        rec = jnp.clip(pred + r, 0, maxv)
                        sidx = sl(arrays[f"g{gi}_scat"])
                        valid = (jnp.arange(k, dtype=jnp.int32) < cnt)
                        widx = jnp.where(valid[:, None],
                                         sidx.reshape(k, -1), trash)
                        return buf.at[widx.reshape(-1)].set(
                            rec.reshape(-1), mode="drop")

                    buf = lax.cond(cn[pos] > 0, process,
                                   lambda b: b, buf)
                return buf, None

            buf, _ = lax.scan(wave_body, buf, (starts, counts))

        pics = buf[:-1].reshape(T_, stride)
        y = pics[:, :luma_sz].reshape(T_, lh, lw)
        if num_planes > 1:
            u = pics[:, luma_sz:luma_sz + chroma_sz] \
                .reshape(T_, ch_, cw_)
            v = pics[:, luma_sz + chroma_sz:].reshape(T_, ch_, cw_)
        else:
            u = v = jnp.zeros((T_, 0, 0), jnp.int32)
        return y, u, v

    return jax.jit(program)


def run_jobs_device(decs: Sequence[TileDecoder]) -> None:
    """Execute every deferred TxbJob of the batch on the device and
    write the reconstructed planes back into each decoder."""
    if not any(d.jobs for d in decs):
        return
    plan = build_plan(decs)
    prog = _build_program(_plan_meta(plan))
    y, u, v = prog(_plan_arrays(plan))
    y = np.asarray(y)
    u = np.asarray(u)
    v = np.asarray(v)
    for i, dec in enumerate(decs):
        dec.planes[0][:, :] = y[i]
        if len(dec.planes) > 1:
            dec.planes[1][:, :] = u[i]
            dec.planes[2][:, :] = v[i]
        dec.jobs = []
