"""H.264 in-loop deblocking filter, intra frames (Rec. H.264 §8.7).

Host reference implementation in vectorized numpy: per-MB edge
processing in spec order (all vertical edges left→right, then all
horizontal edges top→bottom, MBs in raster order), 16 luma / 8 chroma
lines filtered at once per edge. Covers the intra-only toolset the
framework's AVC core targets: bS = 4 on macroblock boundaries, bS = 3
on internal transform edges, 8x8-transform MBs skip the 4-offset
internal edges.

Replaces the deblocking the reference obtains inside its codec plugins
(reference: libheif/plugins/decoder_openh264.cc boundary).
"""

from __future__ import annotations

import numpy as np

from . import tables as T
from .mb import clip3


def _filter_luma_edge(P, Q, qp_avg, bs4, alpha_off, beta_off):
    """Filter one luma edge. P: (n,4) samples p3..p0, Q: (n,4) q0..q3.
    Returns filtered (P, Q) (spec 8.7.2.3/8.7.2.4)."""
    idx_a = clip3(0, 51, qp_avg + alpha_off)
    idx_b = clip3(0, 51, qp_avg + beta_off)
    alpha = int(T.DEBLOCK_ALPHA[idx_a])
    beta = int(T.DEBLOCK_BETA[idx_b])
    if alpha == 0 or beta == 0:
        return P, Q
    p3, p2, p1, p0 = (P[:, i].astype(np.int64) for i in range(4))
    q0, q1, q2, q3 = (Q[:, i].astype(np.int64) for i in range(4))
    fs = (np.abs(p0 - q0) < alpha) & (np.abs(p1 - p0) < beta) & \
         (np.abs(q1 - q0) < beta)
    ap = np.abs(p2 - p0) < beta
    aq = np.abs(q2 - q0) < beta
    if bs4:
        strong = fs & (np.abs(p0 - q0) < ((alpha >> 2) + 2))
        sp = strong & ap
        sq = strong & aq
        p0n = np.where(sp, (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3,
                       np.where(fs, (2 * p1 + p0 + q1 + 2) >> 2, p0))
        p1n = np.where(sp, (p2 + p1 + p0 + q0 + 2) >> 2, p1)
        p2n = np.where(sp, (2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3, p2)
        q0n = np.where(sq, (q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3,
                       np.where(fs, (2 * q1 + q0 + p1 + 2) >> 2, q0))
        q1n = np.where(sq, (q2 + q1 + q0 + p0 + 2) >> 2, q1)
        q2n = np.where(sq, (2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3, q2)
    else:
        tc0 = int(T.DEBLOCK_TC0[idx_a, 2])  # bS = 3 → column 2
        tc = tc0 + ap.astype(np.int64) + aq.astype(np.int64)
        delta = np.clip(((q0 - p0) * 4 + (p1 - q1) + 4) >> 3, -tc, tc)
        p0n = np.where(fs, np.clip(p0 + delta, 0, 255), p0)
        q0n = np.where(fs, np.clip(q0 - delta, 0, 255), q0)
        dp1 = np.clip((p2 + ((p0 + q0 + 1) >> 1) - 2 * p1) >> 1, -tc0, tc0)
        dq1 = np.clip((q2 + ((p0 + q0 + 1) >> 1) - 2 * q1) >> 1, -tc0, tc0)
        p1n = np.where(fs & ap, p1 + dp1, p1)
        q1n = np.where(fs & aq, q1 + dq1, q1)
        p2n, q2n = p2, q2
    Pn = np.stack([p3, p2n, p1n, p0n], axis=1)
    Qn = np.stack([q0n, q1n, q2n, q3], axis=1)
    return Pn, Qn


def _filter_chroma_edge(P, Q, qp_avg, bs4, alpha_off, beta_off):
    """Filter one chroma edge. P: (n,2) p1,p0; Q: (n,2) q0,q1."""
    idx_a = clip3(0, 51, qp_avg + alpha_off)
    idx_b = clip3(0, 51, qp_avg + beta_off)
    alpha = int(T.DEBLOCK_ALPHA[idx_a])
    beta = int(T.DEBLOCK_BETA[idx_b])
    if alpha == 0 or beta == 0:
        return P, Q
    p1, p0 = P[:, 0].astype(np.int64), P[:, 1].astype(np.int64)
    q0, q1 = Q[:, 0].astype(np.int64), Q[:, 1].astype(np.int64)
    fs = (np.abs(p0 - q0) < alpha) & (np.abs(p1 - p0) < beta) & \
         (np.abs(q1 - q0) < beta)
    if bs4:
        p0n = np.where(fs, (2 * p1 + p0 + q1 + 2) >> 2, p0)
        q0n = np.where(fs, (2 * q1 + q0 + p1 + 2) >> 2, q0)
    else:
        tc = int(T.DEBLOCK_TC0[idx_a, 2]) + 1
        delta = np.clip(((q0 - p0) * 4 + (p1 - q1) + 4) >> 3, -tc, tc)
        p0n = np.where(fs, np.clip(p0 + delta, 0, 255), p0)
        q0n = np.where(fs, np.clip(q0 - delta, 0, 255), q0)
    return np.stack([p1, p0n], axis=1), np.stack([q0n, q1], axis=1)


def _chroma_qp(pps, qp, plane):
    return int(T.CHROMA_QP[clip3(0, 51, qp + pps.chroma_qp_offset(plane))])


def deblock_frame(dec) -> None:
    """Apply the deblocking filter in place over dec.planes using the
    per-MB state in dec.mb (spec 8.7 process order)."""
    hdr = getattr(dec, "last_hdr", None)
    a_off = hdr.slice_alpha_c0_offset if hdr else 0
    b_off = hdr.slice_beta_offset if hdr else 0
    Y = dec.planes[0]
    mono = len(dec.planes) == 1
    mb_w, mb_h = dec.mb_w, dec.mb_h
    for mby in range(mb_h):
        for mbx in range(mb_w):
            cur = dec.mb[mby * mb_w + mbx]
            if cur is None:
                continue
            x0, y0 = mbx * 16, mby * 16
            # ---- vertical edges (filter columns), left to right
            v_edges = [0] if mbx > 0 else []
            v_edges += [8] if cur.tx8 else [4, 8, 12]
            for dx in v_edges:
                if dx == 0:
                    nb = dec.mb[mby * mb_w + mbx - 1]
                    if nb is None:
                        continue
                    qp_avg = (nb.qp + cur.qp + 1) >> 1
                    bs4 = True
                else:
                    qp_avg = cur.qp
                    bs4 = False
                x = x0 + dx
                P = Y[y0:y0 + 16, x - 4:x]
                Q = Y[y0:y0 + 16, x:x + 4]
                Pn, Qn = _filter_luma_edge(P, Q, qp_avg, bs4, a_off, b_off)
                Y[y0:y0 + 16, x - 4:x] = Pn
                Y[y0:y0 + 16, x:x + 4] = Qn
            if not mono:
                cx0, cy0 = mbx * 8, mby * 8
                for dx in ([0] if mbx > 0 else []) + [4]:
                    if dx == 0:
                        nb = dec.mb[mby * mb_w + mbx - 1]
                        if nb is None:
                            continue
                        bs4 = True
                    else:
                        nb = cur
                        bs4 = False
                    for pl in (1, 2):
                        C = dec.planes[pl]
                        qp_avg = (_chroma_qp(dec.pps, nb.qp, pl - 1) +
                                  _chroma_qp(dec.pps, cur.qp, pl - 1) +
                                  1) >> 1
                        x = cx0 + dx
                        P = C[cy0:cy0 + 8, x - 2:x]
                        Q = C[cy0:cy0 + 8, x:x + 2]
                        Pn, Qn = _filter_chroma_edge(P, Q, qp_avg, bs4,
                                                     a_off, b_off)
                        C[cy0:cy0 + 8, x - 2:x] = Pn
                        C[cy0:cy0 + 8, x:x + 2] = Qn
            # ---- horizontal edges (filter rows), top to bottom
            h_edges = [0] if mby > 0 else []
            h_edges += [8] if cur.tx8 else [4, 8, 12]
            for dy in h_edges:
                if dy == 0:
                    nb = dec.mb[(mby - 1) * mb_w + mbx]
                    if nb is None:
                        continue
                    qp_avg = (nb.qp + cur.qp + 1) >> 1
                    bs4 = True
                else:
                    qp_avg = cur.qp
                    bs4 = False
                y = y0 + dy
                P = Y[y - 4:y, x0:x0 + 16].T
                Q = Y[y:y + 4, x0:x0 + 16].T
                Pn, Qn = _filter_luma_edge(P, Q, qp_avg, bs4, a_off, b_off)
                Y[y - 4:y, x0:x0 + 16] = Pn.T
                Y[y:y + 4, x0:x0 + 16] = Qn.T
            if not mono:
                cx0, cy0 = mbx * 8, mby * 8
                for dy in ([0] if mby > 0 else []) + [4]:
                    if dy == 0:
                        nb = dec.mb[(mby - 1) * mb_w + mbx]
                        if nb is None:
                            continue
                        bs4 = True
                    else:
                        nb = cur
                        bs4 = False
                    for pl in (1, 2):
                        C = dec.planes[pl]
                        qp_avg = (_chroma_qp(dec.pps, nb.qp, pl - 1) +
                                  _chroma_qp(dec.pps, cur.qp, pl - 1) +
                                  1) >> 1
                        y = cy0 + dy
                        P = C[y - 2:y, cx0:cx0 + 8].T
                        Q = C[y:y + 2, cx0:cx0 + 8].T
                        Pn, Qn = _filter_chroma_edge(P, Q, qp_avg, bs4,
                                                     a_off, b_off)
                        C[y - 2:y, cx0:cx0 + 8] = Pn.T
                        C[y:y + 2, cx0:cx0 + 8] = Qn.T
