"""AV1 film grain synthesis (spec §7.18.3).

The reference's decoders apply grain inside dav1d/aom
(/root/reference/libheif/plugins/decoder_dav1d.cc decodes with grain
on by default); here it is a standalone output-stage pass applied after
the in-loop filters, so both the Python and native engines share it.
Bit-exact vs libaom (tests/test_av1_grain.py).

Grain templates are generated with the spec's 16-bit LFSR +
gaussian_sequence (extracted from system libaom by
tools/extract_av1_qlookup.py) and an autoregressive filter; noise is
applied in 32x32-luma blocks with per-block random template offsets and
optional 2-sample overlap blending.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from . import tables as T

GRAIN_W = 82
GRAIN_H = 73


def _gauss():
    return T._qlookup_hbd()["gaussian_sequence"].astype(np.int32)


class _Rand:
    __slots__ = ("reg",)

    def __init__(self, seed: int):
        self.reg = seed & 0xFFFF

    def bits(self, n: int) -> int:
        r = self.reg
        bit = ((r >> 0) ^ (r >> 1) ^ (r >> 3) ^ (r >> 12)) & 1
        r = (r >> 1) | (bit << 15)
        self.reg = r
        return (r >> (16 - n)) & ((1 << n) - 1)


def _round2(x, n):
    if n == 0:
        return x
    return (x + (1 << (n - 1))) >> n


def _ar_positions(lag: int) -> List[Tuple[int, int]]:
    pos = []
    for dy in range(-lag, 1):
        for dx in range(-lag, lag + 1):
            if dy == 0 and dx == 0:
                break
            pos.append((dy, dx))
    return pos


def generate_luma_grain(g, bd: int) -> np.ndarray:
    gauss = _gauss()
    shift = 12 - bd + g.grain_scale_shift
    grain = np.zeros((GRAIN_H, GRAIN_W), np.int32)
    rnd = _Rand(g.grain_seed)
    if g.num_y_points:
        for y in range(GRAIN_H):
            for x in range(GRAIN_W):
                grain[y, x] = _round2(int(gauss[rnd.bits(11)]), shift)
    gmax = (128 << (bd - 8)) - 1
    gmin = -(128 << (bd - 8))
    lag = g.ar_coeff_lag
    pos = _ar_positions(lag)
    coeffs = g.ar_coeffs_y
    sh = g.ar_coeff_shift
    if g.num_y_points and coeffs:
        for y in range(3, GRAIN_H):
            for x in range(3, GRAIN_W - 3):
                s = 0
                for (dy, dx), c in zip(pos, coeffs):
                    s += c * int(grain[y + dy, x + dx])
                v = int(grain[y, x]) + _round2(s, sh)
                grain[y, x] = min(max(v, gmin), gmax)
    return grain


def generate_chroma_grain(g, luma: np.ndarray, bd: int, ssx: int, ssy: int
                          ) -> Tuple[np.ndarray, np.ndarray]:
    gauss = _gauss()
    shift = 12 - bd + g.grain_scale_shift
    cw = 44 if ssx else GRAIN_W
    ch = 38 if ssy else GRAIN_H
    gmax = (128 << (bd - 8)) - 1
    gmin = -(128 << (bd - 8))
    lag = g.ar_coeff_lag
    pos = _ar_positions(lag)
    sh = g.ar_coeff_shift
    out = []
    for c_idx, (coeffs, xor) in enumerate(((g.ar_coeffs_cb, 0xb524),
                                           (g.ar_coeffs_cr, 0x49d8))):
        grain = np.zeros((ch, cw), np.int32)
        have_pts = (g.num_cb_points if c_idx == 0 else g.num_cr_points) \
            or g.chroma_scaling_from_luma
        rnd = _Rand(g.grain_seed ^ xor)
        if have_pts:
            for y in range(ch):
                for x in range(cw):
                    grain[y, x] = _round2(int(gauss[rnd.bits(11)]), shift)
        if have_pts and coeffs:
            n_spatial = len(pos)
            for y in range(3, ch):
                for x in range(3, cw - 3):
                    s = 0
                    for (dy, dx), c in zip(pos, coeffs[:n_spatial]):
                        s += c * int(grain[y + dy, x + dx])
                    if g.num_y_points:
                        # collocated (averaged) luma grain, final coeff
                        lx = ((x - 3) << ssx) + 3
                        ly = ((y - 3) << ssy) + 3
                        lsum = 0
                        for i in range(1 + ssy):
                            for j in range(1 + ssx):
                                lsum += int(luma[ly + i, lx + j])
                        lval = _round2(lsum, ssx + ssy)
                        s += coeffs[n_spatial] * lval
                    v = int(grain[y, x]) + _round2(s, sh)
                    grain[y, x] = min(max(v, gmin), gmax)
        out.append(grain)
    return out[0], out[1]


def scaling_lut(points: List[Tuple[int, int]], bd: int) -> np.ndarray:
    """Expanded scaling LUT of size (1 << bd) (spec 7.18.3.3 + the
    7.18.3.5 high-bit-depth interpolation folded in, like dav1d's
    generate_scaling)."""
    size = 1 << bd
    lut = np.zeros(size, np.int32)
    if not points:
        return lut
    shift = bd - 8
    base = np.zeros(257, np.int32)
    base[:points[0][0] + 1] = points[0][1]
    for (x0, y0), (x1, y1) in zip(points[:-1], points[1:]):
        dx = x1 - x0
        dy = y1 - y0
        if dx <= 0:
            base[x0] = y0
            continue
        delta = dy * ((0x10000 + (dx >> 1)) // dx)
        xs = np.arange(dx)
        base[x0:x1] = y0 + ((xs * delta + 0x8000) >> 16)
    base[points[-1][0]:] = points[-1][1]
    if shift == 0:
        return base[:256].copy()
    # linear interpolation between the 8-bit grid points
    pad = 1 << shift
    rnd = pad >> 1
    idx = np.arange(size) >> shift
    rem = np.arange(size) & (pad - 1)
    lo = base[idx]
    hi = base[np.minimum(idx + 1, 255)]
    lut = lo + ((hi - lo) * rem + rnd) // pad
    # exact grid points keep their value
    return lut.astype(np.int32)


def apply_film_grain(planes: Dict[str, np.ndarray], g, bd: int,
                     ssx: int = 1, ssy: int = 1) -> Dict[str, np.ndarray]:
    """Add synthesized grain to decoded output planes (spec 7.18.3.4/5).

    planes: {"Y": (h,w), "U"/"V" optional}; returns new dict."""
    y = np.asarray(planes["Y"], np.int32)
    h, w = y.shape
    mono = "U" not in planes

    luma_grain = generate_luma_grain(g, bd)
    if not mono:
        cb_grain, cr_grain = generate_chroma_grain(g, luma_grain, bd,
                                                   ssx, ssy)

    # noise image assembly: 32x32-luma blocks, random offsets, overlap
    half_w = (w + 1) >> 1
    half_h = (h + 1) >> 1
    noise_y = np.zeros((h, w), np.int32)
    if not mono:
        cw = (w + ssx) >> ssx
        chh = (h + ssy) >> ssy
        noise_cb = np.zeros((chh, cw), np.int32)
        noise_cr = np.zeros((chh, cw), np.int32)

    # per-block template offsets: one 8-bit draw per 32x32-luma block
    # (spec 7.18.3.4; stripe seed from the stripe index)
    n_sby = (half_h + 15) // 16
    n_sbx = (half_w + 15) // 16
    offs = [[(0, 0)] * n_sbx for _ in range(n_sby)]
    for s in range(n_sby):
        rnd = _Rand((g.grain_seed
                     ^ (((s * 37 + 178) & 0xFF) << 8)
                     ^ ((s * 173 + 105) & 0xFF)))
        for j in range(n_sbx):
            rv = rnd.bits(8)
            offs[s][j] = (rv >> 4, rv & 15)   # (offsetX, offsetY)

    gmax = (128 << (bd - 8)) - 1
    gmin = -(128 << (bd - 8))

    W2 = ((27, 17), (17, 27))     # 2-sample overlap weights
    W1 = ((23, 22),)              # 1-sample (subsampled) overlap

    def assemble(grain_t, noise_t, span, base, sub):
        """Fill noise_t from grain_t; span = block span (32 luma /
        16 chroma-420), base(offset) maps a 4-bit draw to a template
        coordinate, sub = subsampled (1-sample overlap)."""
        th, tw = noise_t.shape
        wts = W1 if sub else W2
        novl = 1 if sub else 2
        for s in range(n_sby):
            by = s * span
            if by >= th:
                break
            for j in range(n_sbx):
                bx = j * span
                if bx >= tw:
                    break
                ox, oy = offs[s][j]
                gy, gx = base(oy), base(ox)
                bh = min(span, th - by)
                bw = min(span, tw - bx)
                yy = slice(gy, gy + bh)
                cur = grain_t[yy, gx:gx + bw].astype(np.int32)
                if g.overlap_flag and j > 0:
                    # blend with the left block's template extension
                    lox, loy = offs[s][j - 1]
                    lgy, lgx = base(loy), base(lox)
                    left = grain_t[lgy:lgy + bh,
                                   lgx + span:lgx + span + min(novl, bw)]
                    for k, (wo, wn) in enumerate(wts):
                        if k < bw:
                            cur[:, k] = np.clip(_round2(
                                left[:, k] * wo + cur[:, k] * wn, 5),
                                gmin, gmax)
                if g.overlap_flag and s > 0:
                    tox, toy = offs[s - 1][j]
                    tgy, tgx = base(toy) + span, base(tox)
                    top = grain_t[tgy:tgy + min(novl, bh),
                                  tgx:tgx + bw].astype(np.int32)
                    if j > 0:
                        tlox, tloy = offs[s - 1][j - 1]
                        tlgy = base(tloy) + span
                        tlgx = base(tlox) + span
                        topleft = grain_t[tlgy:tlgy + min(novl, bh),
                                          tlgx:tlgx + min(novl, bw)]
                        for k, (wo, wn) in enumerate(wts):
                            if k < bw and k < topleft.shape[1]:
                                top[:, k] = np.clip(_round2(
                                    topleft[:, k] * wo + top[:, k] * wn,
                                    5), gmin, gmax)
                    for k, (wo, wn) in enumerate(wts):
                        if k < bh:
                            cur[k, :] = np.clip(_round2(
                                top[k, :] * wo + cur[k, :] * wn, 5),
                                gmin, gmax)
                noise_t[by:by + bh, bx:bx + bw] = cur

    assemble(luma_grain, noise_y, 32, lambda o: 9 + 2 * o, False)
    if not mono:
        cspan_x = 32 >> ssx
        base_c = (lambda o: 6 + o) if ssx else (lambda o: 9 + 2 * o)
        # chroma blocks follow the luma grid; 4:2:0 → 16x16 blocks
        for grain_t, noise_t in ((cb_grain, noise_cb),
                                 (cr_grain, noise_cr)):
            assemble(grain_t, noise_t, cspan_x, base_c, bool(ssx))

    # ---- scaling + add
    maxv = (1 << bd) - 1
    sc_shift = g.grain_scaling
    if g.clip_to_restricted_range:
        y_min, y_max = 16 << (bd - 8), 235 << (bd - 8)
        c_min, c_max = 16 << (bd - 8), 240 << (bd - 8)
    else:
        y_min = c_min = 0
        y_max = c_max = maxv

    out = {}
    if g.num_y_points:
        lut_y = scaling_lut(g.point_y, bd)
        sc = lut_y[np.clip(y, 0, maxv)]
        noise = (sc * noise_y + (1 << (sc_shift - 1))) >> sc_shift
        out["Y"] = np.clip(y + noise, y_min, y_max).astype(y.dtype)
    else:
        out["Y"] = planes["Y"]

    if not mono:
        u = np.asarray(planes["U"], np.int32)
        v = np.asarray(planes["V"], np.int32)
        # averaged collocated luma for the scaling index
        if ssx:
            ly = y[:, 0::2]
            lx1 = y[:, 1::2]
            if lx1.shape[1] < ly.shape[1]:
                lx1 = np.pad(lx1, ((0, 0), (0, 1)), mode="edge")
            avg = (ly + lx1 + 1) >> 1
        else:
            avg = y
        if ssy:
            avg = avg[0::2, :]
        avg = avg[:u.shape[0], :u.shape[1]]
        if avg.shape != u.shape:
            avg = np.pad(avg, ((0, u.shape[0] - avg.shape[0]),
                               (0, u.shape[1] - avg.shape[1])),
                         mode="edge")
        for name, pl, noise_t, pts, mult, lmult, off in (
                ("U", u, noise_cb, g.point_cb, g.cb_mult,
                 g.cb_luma_mult, g.cb_offset),
                ("V", v, noise_cr, g.point_cr, g.cr_mult,
                 g.cr_luma_mult, g.cr_offset)):
            if g.chroma_scaling_from_luma:
                lut = scaling_lut(g.point_y, bd)
                idx = avg
            elif pts:
                lut = scaling_lut(pts, bd)
                merged = ((avg * lmult + pl * mult) >> 6) + \
                    (off << (bd - 8))
                idx = np.clip(merged, 0, maxv)
            else:
                out[name] = planes[name]
                continue
            sc = lut[np.clip(idx, 0, maxv)]
            noise = (sc * noise_t + (1 << (sc_shift - 1))) >> sc_shift
            out[name] = np.clip(pl + noise, c_min, c_max).astype(
                np.asarray(planes[name]).dtype)
    return out
