"""AV1 deblocking loop filter (spec §7.14), intra-frame specialization.

The reference's decoders get this from dav1d/aom; here it is built on
edge maps recorded during tile decode (every transform-tile origin is
an edge candidate). For intra-only frames the skip gate never
suppresses filtering (spec: skip only suppresses edges between two
skipped INTER blocks), and without segmentation or delta-LF the four
frame filter levels are uniform.

Vertical edges are filtered for the whole plane first, then horizontal
edges (the second pass reads the first pass's output), per spec
§7.14.1. Filter taps follow the aom/vp9 lineage; validated bit-exact
against libaom via the scripted-stream oracle in
tests/av1_deblock_difftest.py.
"""

from __future__ import annotations

from typing import List

import numpy as np


def _adjust_level(base: int, delta_enabled: bool, intra_delta: int) -> int:
    """aom av1_loop_filter_frame_init intra level: NO base==0 early-out
    — a zero base level with ref_deltas[INTRA_FRAME]=1 still yields
    level 1, so that direction filters weakly (caught by the odd-dims
    cpu0 oracle difftest: lf=[0,14] streams filter vertical edges)."""
    if not delta_enabled:
        return base
    scale = 1 << (base >> 5)
    return int(np.clip(base + intra_delta * scale, 0, 63))


def _thresholds(lvl: int, sharpness: int):
    shift = 2 if sharpness > 4 else (1 if sharpness > 0 else 0)
    if sharpness > 0:
        limit = int(np.clip(lvl >> shift, 1, 9 - sharpness))
    else:
        limit = max(1, lvl)
    blimit = 2 * (lvl + 2) + limit
    thresh = lvl >> 4
    return blimit, limit, thresh


def _filter_segment(line: np.ndarray, pos: int, length: int,
                    blimit: int, limit: int, thresh: int,
                    bd: int = 8) -> None:
    """Filter one edge on `line` (1-D int array): samples
    line[pos-7:pos+7]; edge between pos-1 and pos. Vectorized over the
    leading axis if line is 2-D (segment rows). blimit/limit/thresh
    arrive already scaled by the caller (<< (bd-8), spec §7.14.4)."""
    g = lambda i: line[..., pos + i].astype(np.int64)
    p6, p5, p4 = g(-7), g(-6), g(-5)
    p3, p2, p1, p0 = g(-4), g(-3), g(-2), g(-1)
    q0, q1, q2, q3 = g(0), g(1), g(2), g(3)
    q4, q5, q6 = g(4), g(5), g(6)

    ab = lambda x: np.abs(x)
    fm = (ab(p1 - p0) <= limit) & (ab(q1 - q0) <= limit) & \
         (ab(p0 - q0) * 2 + (ab(p1 - q1) >> 1) <= blimit)
    if length >= 6:
        fm &= (ab(p2 - p1) <= limit) & (ab(q2 - q1) <= limit)
    if length >= 8:
        fm &= (ab(p3 - p2) <= limit) & (ab(q3 - q2) <= limit)
    if not fm.any():
        return

    sh = bd - 8
    F = 1 << sh           # flat threshold scales with depth
    maxv = (1 << bd) - 1
    flat = None
    if length >= 6:
        flat = (ab(p1 - p0) <= F) & (ab(q1 - q0) <= F) & \
               (ab(p2 - p0) <= F) & (ab(q2 - q0) <= F)
        if length >= 8:
            flat &= (ab(p3 - p0) <= F) & (ab(q3 - q0) <= F)
    flat2 = None
    if length >= 14:
        flat2 = (ab(p6 - p0) <= F) & (ab(q6 - q0) <= F) & \
                (ab(p5 - p0) <= F) & (ab(q5 - q0) <= F) & \
                (ab(p4 - p0) <= F) & (ab(q4 - q0) <= F)

    # ---- narrow filter (filter4) on samples where not flat; clamp
    # ranges scale with depth (spec filter4 iclip_diff ±128<<(bd-8))
    mid = 128 << sh
    hev = (ab(p1 - p0) > thresh) | (ab(q1 - q0) > thresh)
    c = lambda x: np.clip(x, -mid, mid - 1)
    ps1, ps0 = p1 - mid, p0 - mid
    qs0, qs1 = q0 - mid, q1 - mid
    f = np.where(hev, c(ps1 - qs1), 0)
    f = c(f + 3 * (qs0 - ps0))
    f1 = c(f + 4) >> 3
    f2 = c(f + 3) >> 3
    n_q0 = np.clip(c(qs0 - f1) + mid, 0, maxv)
    n_p0 = np.clip(c(ps0 + f2) + mid, 0, maxv)
    f3 = (f1 + 1) >> 1
    n_q1 = np.where(hev, q1, np.clip(c(qs1 - f3) + mid, 0, maxv))
    n_p1 = np.where(hev, p1, np.clip(c(ps1 + f3) + mid, 0, maxv))

    r2 = lambda x: (x + 4) >> 3
    r4 = lambda x: (x + 8) >> 4
    out = {}
    if length == 4:
        sel = fm
        out[-2], out[-1] = np.where(sel, n_p1, p1), np.where(sel, n_p0, p0)
        out[0], out[1] = np.where(sel, n_q0, q0), np.where(sel, n_q1, q1)
    elif length == 6:
        w = fm & flat
        o_p1 = r2(p2 * 3 + p1 * 2 + p0 * 2 + q0)
        o_p0 = r2(p2 + p1 * 2 + p0 * 2 + q0 * 2 + q1)
        o_q0 = r2(p1 + p0 * 2 + q0 * 2 + q1 * 2 + q2)
        o_q1 = r2(q2 * 3 + q1 * 2 + q0 * 2 + p0)
        out[-2] = np.where(w, o_p1, np.where(fm, n_p1, p1))
        out[-1] = np.where(w, o_p0, np.where(fm, n_p0, p0))
        out[0] = np.where(w, o_q0, np.where(fm, n_q0, q0))
        out[1] = np.where(w, o_q1, np.where(fm, n_q1, q1))
    else:
        w8 = fm & flat
        o_p2 = r2(p3 * 3 + p2 * 2 + p1 + p0 + q0)
        o_p1 = r2(p3 * 2 + p2 + p1 * 2 + p0 + q0 + q1)
        o_p0 = r2(p3 + p2 + p1 + p0 * 2 + q0 + q1 + q2)
        o_q0 = r2(q3 + q2 + q1 + q0 * 2 + p0 + p1 + p2)
        o_q1 = r2(q3 * 2 + q2 + q1 * 2 + q0 + p0 + p1)
        o_q2 = r2(q3 * 3 + q2 * 2 + q1 + q0 + p0)
        vals = {
            -3: np.where(w8, o_p2, p2),
            -2: np.where(w8, o_p1, np.where(fm, n_p1, p1)),
            -1: np.where(w8, o_p0, np.where(fm, n_p0, p0)),
            0: np.where(w8, o_q0, np.where(fm, n_q0, q0)),
            1: np.where(w8, o_q1, np.where(fm, n_q1, q1)),
            2: np.where(w8, o_q2, q2),
        }
        if length >= 14:
            w14 = w8 & flat2
            # aom filter14: 13-tap window, center 3 samples doubled,
            # edge replication; every line sums to 16
            wide = {
                -6: r4(p6 * 7 + p5 * 2 + p4 * 2 + p3 + p2 + p1 + p0 +
                       q0),
                -5: r4(p6 * 5 + p5 * 2 + p4 * 2 + p3 * 2 + p2 + p1 +
                       p0 + q0 + q1),
                -4: r4(p6 * 4 + p5 + p4 * 2 + p3 * 2 + p2 * 2 + p1 +
                       p0 + q0 + q1 + q2),
                -3: r4(p6 * 3 + p5 + p4 + p3 * 2 + p2 * 2 + p1 * 2 +
                       p0 + q0 + q1 + q2 + q3),
                -2: r4(p6 * 2 + p5 + p4 + p3 + p2 * 2 + p1 * 2 +
                       p0 * 2 + q0 + q1 + q2 + q3 + q4),
                -1: r4(p6 + p5 + p4 + p3 + p2 + p1 * 2 + p0 * 2 +
                       q0 * 2 + q1 + q2 + q3 + q4 + q5),
                0: r4(q6 + q5 + q4 + q3 + q2 + q1 * 2 + q0 * 2 +
                      p0 * 2 + p1 + p2 + p3 + p4 + p5),
                1: r4(q6 * 2 + q5 + q4 + q3 + q2 * 2 + q1 * 2 +
                      q0 * 2 + p0 + p1 + p2 + p3 + p4),
                2: r4(q6 * 3 + q5 + q4 + q3 * 2 + q2 * 2 + q1 * 2 +
                      q0 + p0 + p1 + p2 + p3),
                3: r4(q6 * 4 + q5 + q4 * 2 + q3 * 2 + q2 * 2 + q1 +
                      q0 + p0 + p1 + p2),
                4: r4(q6 * 5 + q5 * 2 + q4 * 2 + q3 * 2 + q2 + q1 +
                      q0 + p0 + p1),
                5: r4(q6 * 7 + q5 * 2 + q4 * 2 + q3 + q2 + q1 + q0 +
                      p0),
            }
            for k in range(-6, 6):
                base = vals.get(k, g(k))
                vals[k] = np.where(w14, wide[k], base)
        out = vals
    for k, v in out.items():
        line[..., pos + k] = v   # non-filtered lanes already folded in
    return


class EdgeMaps:
    """Per-plane tx-tile edge/size maps at 4-px plane granularity,
    filled by TileDecoder during reconstruction."""

    def __init__(self, planes_shapes):
        self.vert = []
        self.horz = []
        self.tw = []
        self.th = []
        for (h, w) in planes_shapes:
            gh, gw = (h + 3) // 4, (w + 3) // 4
            self.vert.append(np.zeros((gh, gw), np.uint8))
            self.horz.append(np.zeros((gh, gw), np.uint8))
            self.tw.append(np.full((gh, gw), 4, np.int32))
            self.th.append(np.full((gh, gw), 4, np.int32))

    def mark(self, plane, px, py, tw, th):
        gy, gx = py // 4, px // 4
        nh, nw = max(th // 4, 1), max(tw // 4, 1)
        self.vert[plane][gy:gy + nh, gx] = 1
        self.horz[plane][gy, gx:gx + nw] = 1
        self.tw[plane][gy:gy + nh, gx:gx + nw] = tw
        self.th[plane][gy:gy + nh, gx:gx + nw] = th


def apply_deblock(planes: List[np.ndarray], maps: EdgeMaps, fh,
                  frame_w: int, frame_h: int, bd: int = 8) -> None:
    """In-place deblocking of [Y, U, V] int planes (frame area only)."""
    intra_delta = fh.loop_filter_ref_deltas[0]
    delta_en = fh.loop_filter_delta_enabled
    sharp = fh.loop_filter_sharpness
    lvls = [_adjust_level(v, delta_en, intra_delta)
            for v in fh.loop_filter_levels]

    raw = fh.loop_filter_levels
    if raw[0] == 0 and raw[1] == 0:
        return      # aom av1_loop_filter_frame: luma both-zero → no
                    # filtering at all (chroma included)
    for plane in range(min(3, len(planes))):   # monochrome: Y only
        if plane > 0 and raw[plane + 1] == 0:
            continue       # chroma plane gated on its RAW level
        buf = planes[plane]
        ph, pw = buf.shape          # padded mi area, like aom
        # plane-scaled visible frame dims: spec §7.14.2 skips an edge
        # when x >= FrameWidth or y >= FrameHeight (plane coords), so
        # mi rows/cols fully inside the alignment padding stay
        # unfiltered (CDEF later reads the unfiltered padding there)
        ssx = 1 if pw < planes[0].shape[1] else 0
        ssy = 1 if ph < planes[0].shape[0] else 0
        fw_p = (frame_w + ssx) >> ssx
        fh_p = (frame_h + ssy) >> ssy
        max_len = 14 if plane == 0 else 6
        for direction in (0, 1):        # 0: vertical edges, 1: horizontal
            lvl = lvls[direction] if plane == 0 else lvls[plane + 1]
            if lvl == 0:
                continue
            blimit, limit, thresh = _thresholds(lvl, sharp)
            # threshold scaling for high bit depth (spec §7.14.4)
            blimit <<= bd - 8
            limit <<= bd - 8
            thresh <<= bd - 8
            edge = maps.vert[plane] if direction == 0 else maps.horz[plane]
            tdim = maps.tw[plane] if direction == 0 else maps.th[plane]
            gh, gw = edge.shape
            if direction == 0:
                work = buf
                edge_lim, row_lim = fw_p, fh_p
            else:
                work = buf.T
                edge = edge.T
                tdim = tdim.T
                pw, ph = ph, pw
                gh, gw = gw, gh
                edge_lim, row_lim = fh_p, fw_p
            # Columns are filtered strictly left-to-right (a wide edge
            # reads pixels a previous column's filter wrote, like aom's
            # in-place pass).  WITHIN a column every 4-row segment is
            # disjoint, so all segments of a column batch into one
            # (M,14) gather → filter → scatter per filter length.
            n_gy = (ph + 3) // 4
            for gx in range(1, min((pw + 3) // 4, edge.shape[1])):
                x = gx * 4
                if x >= edge_lim:       # spec: skip edges at/beyond the
                    break               # visible frame boundary
                col = edge[:min(gh, n_gy), gx]
                gys = np.nonzero(col)[0]
                gys = gys[gys * 4 < row_lim]    # padding-only segments
                if len(gys) == 0:
                    continue
                cur = tdim[gys, gx].astype(np.int64)
                prev = tdim[gys, gx - 1].astype(np.int64)
                ln_raw = np.minimum(np.minimum(cur, prev), max_len)
                if plane == 0:
                    ln = np.where(ln_raw >= 14, 14,
                                  np.where(ln_raw >= 8, 8,
                                           np.where(ln_raw >= 6, 6, 4)))
                else:
                    ln = np.where(ln_raw >= 6, 6, 4)
                s0, s1 = x - 7, x + 7
                col_idx = np.clip(np.arange(s0, s1), 0, pw - 1)
                write_cols = np.arange(max(s0, 0), min(s1, pw))
                wc_off = write_cols - s0
                for ln_val in (4, 6, 8, 14):
                    sel = gys[ln == ln_val]
                    if len(sel) == 0:
                        continue
                    rows = (sel[:, None] * 4 +
                            np.arange(4)[None, :]).ravel()
                    rows = rows[rows < ph]
                    seg = work[rows[:, None], col_idx[None, :]]
                    _filter_segment(seg, 7, int(ln_val), blimit, limit,
                                    thresh, bd)
                    work[rows[:, None], write_cols[None, :]] = \
                        seg[:, wc_off]
            if direction == 1:
                pw, ph = ph, pw
