"""AV1 loop restoration: Wiener and self-guided filters (spec §7.17).

Applied after CDEF.  Restoration units read from the CDEF output except
at horizontal stripe boundaries (every 64 luma rows, offset -8), where
up to three boundary rows come from the *deblocked* (pre-CDEF) frame —
the spec's get_source_sample rule that lets hardware pipeline stripes.
Vectorized numpy implementation; validated bit-exactly against libaom
decodes (tests/test_av1_conformance.py lr cases).
"""

from __future__ import annotations

from typing import List

import numpy as np

# Sgr_Params[set] = (r0, e0, r1, e1) — derived from libaom's
# av1_sgr_params {r0,r1,s0,s1} rodata (s = (2^20 + n^2 e/2)/(n^2 e));
# the earlier guessed rows beyond set 2 were wrong, including the
# radius-zero sets 10-13, which also gate the xqd parse (caught by the
# sgrproj oracle difftest)
SGR_PARAMS = (
    (2, 12, 1, 4), (2, 15, 1, 6), (2, 18, 1, 8), (2, 21, 1, 9),
    (2, 24, 1, 10), (2, 29, 1, 11), (2, 36, 1, 12), (2, 45, 1, 13),
    (2, 56, 1, 14), (2, 68, 1, 15), (0, 0, 1, 5), (0, 0, 1, 8),
    (0, 0, 1, 11), (0, 0, 1, 14), (2, 30, 0, 0), (2, 76, 0, 0),
)

SGRPROJ_RST_BITS = 4
SGRPROJ_PRJ_BITS = 7
SGRPROJ_SGR_BITS = 8
SGRPROJ_MTABLE_BITS = 20
SGRPROJ_RECIP_BITS = 12


def _round2(x, n):
    if n == 0:
        return x
    return (x + (1 << (n - 1))) >> n


def _gather_piece(cdef_p, deblk_p, x0, x1, y0, h, ss_start, ss_end,
                  plane_w, plane_h, margin=3):
    """Padded source rectangle rows [y0-margin, y0+h+margin) × cols
    [x0-margin, x1+margin) per the get_source_sample rule (spec
    7.17.1): x/y clamped to the plane; rows outside the current stripe
    read the deblocked frame, clamped to stripe±2."""
    w = x1 - x0
    ph = h + 2 * margin
    pw = w + 2 * margin
    out = np.empty((ph, pw), np.int32)
    xs = np.clip(np.arange(x0 - margin, x1 + margin), 0, plane_w - 1)
    for i in range(ph):
        y = y0 - margin + i
        y = min(max(y, 0), plane_h - 1)
        if y < ss_start:
            yy = max(ss_start - 2, y)
            row = deblk_p[yy]
        elif y > ss_end:
            yy = min(ss_end + 2, y)
            row = deblk_p[yy]
        else:
            row = cdef_p[y]
        out[i] = row[xs]
    return out


def _wiener_taps(coeffs):
    """7-tap filter from the 3 coded taps (spec wiener coefficients)."""
    w0, w1, w2 = int(coeffs[0]), int(coeffs[1]), int(coeffs[2])
    w3 = 128 - 2 * (w0 + w1 + w2)
    return (w0, w1, w2, w3, w2, w1, w0)


def _wiener_filter(pad, w, h, vcoeff, hcoeff, bd):
    """(spec wiener filter process): horizontal pass into a clipped
    intermediate, then vertical pass.  pad has 3px margins."""
    hfilter = _wiener_taps(hcoeff)
    vfilter = _wiener_taps(vcoeff)
    # spec 7.11.3.2 rounding variables: only 12-bit tightens the
    # horizontal rounding (dav1d: round_bits_h = 3 + (bpc==12)*2)
    inter_round0 = 5 if bd == 12 else 3
    inter_round1 = 9 if bd == 12 else 11
    offset = 1 << (bd + 7 - inter_round0 - 1)
    limit = (1 << (bd + 1 + 7 - inter_round0)) - 1

    # horizontal: rows 0..h+5 of the padded area
    src = pad.astype(np.int64)
    inter = np.zeros((h + 6, w), np.int64)
    for t in range(7):
        inter += hfilter[t] * src[:h + 6, t:t + w]
    inter = (inter + (1 << (inter_round0 - 1))) >> inter_round0
    inter = np.clip(inter, -offset, limit - offset)

    out = np.zeros((h, w), np.int64)
    for t in range(7):
        out += vfilter[t] * inter[t:t + h]
    out = (out + (1 << (inter_round1 - 1))) >> inter_round1
    return np.clip(out, 0, (1 << bd) - 1).astype(np.int32)


def _box_sums(sq, s, r, h, w, margin):
    """Box sums of squares/values over (2r+1)^2 windows for the grid
    i,j in [-1, h] x [-1, w] (relative to the piece origin); sq/s are
    padded arrays with `margin` border."""
    # integral images
    csq = np.zeros((sq.shape[0] + 1, sq.shape[1] + 1), np.int64)
    cs = np.zeros_like(csq)
    np.cumsum(np.cumsum(sq, 0), 1, out=csq[1:, 1:])
    np.cumsum(np.cumsum(s, 0), 1, out=cs[1:, 1:])

    def window(ii, jj):
        # top-left of window in padded coords
        y0 = ii + margin - r
        x0 = jj + margin - r
        n = 2 * r + 1
        a = csq[y0 + n, x0 + n] - csq[y0, x0 + n] - csq[y0 + n, x0] + \
            csq[y0, x0]
        b = cs[y0 + n, x0 + n] - cs[y0, x0 + n] - cs[y0 + n, x0] + \
            cs[y0, x0]
        return a, b

    # vectorized: full (h+2, w+2) grids
    n = 2 * r + 1
    ys = np.arange(-1, h + 1) + margin - r
    xs = np.arange(-1, w + 1) + margin - r
    A = (csq[np.ix_(ys + n, xs + n)] - csq[np.ix_(ys, xs + n)] -
         csq[np.ix_(ys + n, xs)] + csq[np.ix_(ys, xs)])
    B = (cs[np.ix_(ys + n, xs + n)] - cs[np.ix_(ys, xs + n)] -
         cs[np.ix_(ys + n, xs)] + cs[np.ix_(ys, xs)])
    return A, B


def _box_filter(pad, w, h, sgr_set, pass_idx, bd):
    """(spec box filter process): returns flt (h, w) int64 for one
    pass; pad is the padded source with 3px margins."""
    r = SGR_PARAMS[sgr_set][pass_idx * 2]
    eps = SGR_PARAMS[sgr_set][pass_idx * 2 + 1]
    n = (2 * r + 1) ** 2
    n2e = n * n * eps
    s_val = ((1 << SGRPROJ_MTABLE_BITS) + n2e // 2) // n2e
    one_over_n = ((1 << SGRPROJ_RECIP_BITS) + (n >> 1)) // n

    src = pad.astype(np.int64)
    a_sum, b_sum = _box_sums(src * src, src, r, h, w, 3)

    # 8-bit: no extra rounding of a/b
    shift = 2 * (bd - 8)
    a_r = _round2(a_sum, shift) if shift else a_sum
    d_r = _round2(b_sum, bd - 8) if bd > 8 else b_sum
    p = np.maximum(0, a_r * n - d_r * d_r)
    z = (p * s_val + (1 << (SGRPROJ_MTABLE_BITS - 1))) >> \
        SGRPROJ_MTABLE_BITS
    a2 = np.where(z >= 255, 256,
                  np.where(z == 0, 1,
                           ((z << SGRPROJ_SGR_BITS) + z // 2) // (z + 1)))
    b2 = (((1 << SGRPROJ_SGR_BITS) - a2) * b_sum * one_over_n +
          (1 << (SGRPROJ_RECIP_BITS - 1))) >> SGRPROJ_RECIP_BITS

    # A/B grids indexed [i+1][j+1] for i in -1..h, j in -1..w
    A, B = a2, b2

    flt = np.zeros((h, w), np.int64)
    center = pad[3:3 + h, 3:3 + w].astype(np.int64)
    if pass_idx == 0:
        # r=2: A/B used only at odd grid rows (spec computes them at
        # i = -1, 1, 3, ...); even output rows read rows i-1/i+1
        for i in range(h):
            gi = i + 1    # grid row of output row i
            if i % 2 == 0:
                a = 6 * (A[gi - 1, 1:w + 1] + A[gi + 1, 1:w + 1]) + \
                    5 * (A[gi - 1, 0:w] + A[gi - 1, 2:w + 2] +
                         A[gi + 1, 0:w] + A[gi + 1, 2:w + 2])
                b = 6 * (B[gi - 1, 1:w + 1] + B[gi + 1, 1:w + 1]) + \
                    5 * (B[gi - 1, 0:w] + B[gi - 1, 2:w + 2] +
                         B[gi + 1, 0:w] + B[gi + 1, 2:w + 2])
                nb = 5
            else:
                a = 6 * A[gi, 1:w + 1] + 5 * (A[gi, 0:w] + A[gi, 2:w + 2])
                b = 6 * B[gi, 1:w + 1] + 5 * (B[gi, 0:w] + B[gi, 2:w + 2])
                nb = 4
            v = a * center[i] + b
            flt[i] = (v + (1 << (SGRPROJ_SGR_BITS + nb -
                                 SGRPROJ_RST_BITS - 1))) >> \
                (SGRPROJ_SGR_BITS + nb - SGRPROJ_RST_BITS)
    else:
        # r=1: full 3x3, cross weights 4 / corner weights 3 — total
        # weight 32, so nb = 5 like the pass-0 even rows (nb=3 left a
        # 4x gain; caught by the sgrproj oracle difftest)
        nb = 5
        a = 4 * (A[1:h + 1, 1:w + 1] + A[0:h, 1:w + 1] + A[2:h + 2, 1:w + 1] +
                 A[1:h + 1, 0:w] + A[1:h + 1, 2:w + 2]) + \
            3 * (A[0:h, 0:w] + A[0:h, 2:w + 2] +
                 A[2:h + 2, 0:w] + A[2:h + 2, 2:w + 2])
        b = 4 * (B[1:h + 1, 1:w + 1] + B[0:h, 1:w + 1] + B[2:h + 2, 1:w + 1] +
                 B[1:h + 1, 0:w] + B[1:h + 1, 2:w + 2]) + \
            3 * (B[0:h, 0:w] + B[0:h, 2:w + 2] +
                 B[2:h + 2, 0:w] + B[2:h + 2, 2:w + 2])
        v = a * center + b
        flt = (v + (1 << (SGRPROJ_SGR_BITS + nb -
                          SGRPROJ_RST_BITS - 1))) >> \
            (SGRPROJ_SGR_BITS + nb - SGRPROJ_RST_BITS)
    return flt


def _sgrproj_filter(pad, w, h, sgr_set, xqd, bd):
    """(spec self-guided process): projection of two box-filter passes."""
    r0 = SGR_PARAMS[sgr_set][0]
    r1 = SGR_PARAMS[sgr_set][2]
    center = pad[3:3 + h, 3:3 + w].astype(np.int64)
    u = center << SGRPROJ_RST_BITS
    flt0 = _box_filter(pad, w, h, sgr_set, 0, bd) if r0 else u
    flt1 = _box_filter(pad, w, h, sgr_set, 1, bd) if r1 else u
    # aom decode_xq: xqd[1] codes the COMPLEMENT weight — the second
    # projection weight is 128 - xq0 - xqd1 (128 - xqd1 when r0 == 0),
    # not xqd1 itself (caught by the sgrproj oracle difftest)
    if r0 == 0:
        xq0, xq1 = 0, (1 << SGRPROJ_PRJ_BITS) - int(xqd[1])
    elif r1 == 0:
        xq0, xq1 = int(xqd[0]), 0
    else:
        xq0 = int(xqd[0])
        xq1 = (1 << SGRPROJ_PRJ_BITS) - xq0 - int(xqd[1])
    w0, w2 = xq0, xq1
    w1 = (1 << SGRPROJ_PRJ_BITS) - w0 - w2
    v = w0 * flt0 + w1 * u + w2 * flt1
    s = (v + (1 << (SGRPROJ_RST_BITS + SGRPROJ_PRJ_BITS - 1))) >> \
        (SGRPROJ_RST_BITS + SGRPROJ_PRJ_BITS)
    return np.clip(s, 0, (1 << bd) - 1).astype(np.int32)


def apply_lr(cdef_planes: List[np.ndarray], deblk_planes: List[np.ndarray],
             dec, seq, fh, frame_w: int, frame_h: int) -> List[np.ndarray]:
    """Frame loop-restore (spec §7.17.1)."""
    bd = seq.bit_depth
    num_planes = 1 if seq.monochrome else 3
    outs = [p.copy() for p in cdef_planes]

    for plane in range(num_planes):
        if fh.lr_type[plane] == 0:
            continue
        sub_x = 0 if plane == 0 else seq.subsampling_x
        sub_y = 0 if plane == 0 else seq.subsampling_y
        plane_w = _round2(frame_w, sub_x)
        plane_h = _round2(frame_h, sub_y)
        usize = fh.lr_unit_size[plane]
        ur_total, uc_total = dec.lr_unit_dims[plane]
        stripe_size = 64 >> sub_y
        voffset = 8 >> sub_y
        cdef_p = cdef_planes[plane]
        deblk_p = deblk_planes[plane]

        for ur in range(ur_total):
            # unit-row extents are shifted up by the stripe offset
            # (spec: unitRow = Min(unitRows-1, (y + StripeOffset) /
            # unitSize)) so unit boundaries align with stripes; caught
            # by the multi-unit wiener oracle difftest
            uy0 = 0 if ur == 0 else ur * usize - voffset
            uy1 = plane_h if ur == ur_total - 1 else \
                min((ur + 1) * usize - voffset, plane_h)
            for uc in range(uc_total):
                unit_type = int(dec.lr_unit_type[plane][ur, uc])
                if unit_type == 0:
                    continue
                ux0 = uc * usize
                ux1 = plane_w if uc == uc_total - 1 else \
                    min((uc + 1) * usize, plane_w)
                w = ux1 - ux0
                if w <= 0:
                    continue
                y = uy0
                while y < uy1:
                    stripe_num = (y + voffset) // stripe_size
                    ss_start = stripe_num * stripe_size - voffset
                    ss_end = ss_start + stripe_size - 1
                    h = min(uy1 - 1, ss_end) - y + 1
                    pad = _gather_piece(cdef_p, deblk_p, ux0, ux1, y, h,
                                        ss_start, ss_end, plane_w, plane_h)
                    if unit_type == 2:
                        wiener = dec.lr_wiener[plane][ur, uc]
                        res = _wiener_filter(pad, w, h, wiener[0],
                                             wiener[1], bd)
                    else:
                        res = _sgrproj_filter(
                            pad, w, h, int(dec.lr_sgr_set[plane][ur, uc]),
                            dec.lr_sgr_xqd[plane][ur, uc], bd)
                    outs[plane][y:y + h, ux0:ux1] = res
                    y += h
    return outs
