"""VVC intra reconstruction: dequant, inverse DCT-II, prediction + PDPC.

Spec anchors: scaling H.266 §8.7.3, transforms §8.7.4, intra
prediction §8.4.5.2 (reference samples §8.4.5.2.5/.7, planar/DC
§8.4.5.2.10-11, angular §8.4.5.2.12, PDPC §8.4.5.2.15).  Square TBs
only (QT-only toolset), refIdx 0, 4:2:0.

Reference-correct numpy implementation; prediction for angular modes
is vectorized per row so the decoder's hot loop stays matrix-shaped.
The same functions run inside the encoder's planning pass, which is
what guarantees encoder-recon == decoder-output bit-exactness.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from .tables import (DCT, ANGLE_TABLE, inv_angle, FILTER_C, FILTER_G,
                     INTRA_HOR_VER_DIST_THRES, CHROMA_QP_TABLE,
                     INTRA_PLANAR, INTRA_DC, INTRA_HOR, INTRA_VER,
                     LEVEL_SCALE)

_FC = FILTER_C.astype(np.int64)
_FG = FILTER_G.astype(np.int64)


def chroma_qp_from_luma(qp_y: int) -> int:
    """ChromaQp via the signalled (identity) table (§8.7.1)."""
    return CHROMA_QP_TABLE[max(0, min(63, qp_y))]


def dequant(coeffs: np.ndarray, log2: int, qp: int,
            bit_depth: int) -> np.ndarray:
    """Scaling process (§8.7.3, flat scaling list m=16, square TB)."""
    bd_shift = bit_depth + log2 - 5
    scale = LEVEL_SCALE[qp % 6] << (qp // 6)
    c = coeffs.astype(np.int64)
    d = (c * 16 * scale + (1 << (bd_shift - 1))) >> bd_shift
    return np.clip(d, -32768, 32767)


def inverse_transform(d: np.ndarray, log2: int,
                      bit_depth: int) -> np.ndarray:
    """Inverse DCT-II, two stages with intermediate clip (§8.7.4)."""
    n = 1 << log2
    m = DCT[n]
    e = (m.T @ d.astype(np.int64) + 64) >> 7
    e = np.clip(e, -32768, 32767)
    shift2 = 20 - bit_depth
    r = (e @ m + (1 << (shift2 - 1))) >> shift2
    return np.clip(r, -32768, 32767).astype(np.int32)


def forward_transform(block: np.ndarray, log2: int,
                      bit_depth: int) -> np.ndarray:
    """Forward DCT-II matching inverse_transform's scaling (encoder)."""
    n = 1 << log2
    m = DCT[n]
    shift1 = log2 + bit_depth - 9
    tmp = (m @ block.astype(np.int64) + (1 << (shift1 - 1) if shift1 > 0
                                         else 0)) >> max(shift1, 0)
    if shift1 < 0:
        tmp = (m @ block.astype(np.int64)) << (-shift1)
    shift2 = log2 + 6
    out = (tmp @ m.T + (1 << (shift2 - 1))) >> shift2
    return out


# --------------------------------------------------------------------------
# Intra prediction
# --------------------------------------------------------------------------

def _filter_flag(mode: int, log2: int, c_idx: int) -> Tuple[bool, bool]:
    """(smooth_refs, use_gauss): reference [1 2 1] smoothing for
    integer-slope modes / planar, Gaussian interpolation filter for
    fractional-slope modes beyond the distance threshold (§8.4.5.2.5)."""
    if c_idx != 0:
        return False, False
    n = 1 << log2
    if n * n <= 32:
        return False, False
    if mode == INTRA_PLANAR:
        return True, False
    if mode == INTRA_DC:
        return False, False
    min_dist = min(abs(mode - INTRA_VER), abs(mode - INTRA_HOR))
    if min_dist <= INTRA_HOR_VER_DIST_THRES[log2]:
        return False, False
    angle = ANGLE_TABLE[mode]
    if angle % 32 == 0:
        return True, False          # integer slope: smooth refs directly
    return False, True              # fractional: smoothing via fG


def predict_intra(ref: np.ndarray, mode: int, log2: int, c_idx: int,
                  bit_depth: int) -> np.ndarray:
    """Predict an n×n block from the 4n+1 reference array (ordered
    bottom-left → corner → top-right as in the HEVC module)."""
    n = 1 << log2
    corner = 2 * n
    maxv = (1 << bit_depth) - 1

    smooth, use_gauss = _filter_flag(mode, log2, c_idx)
    if smooth:
        out = ref.copy()
        out[1:-1] = (ref[:-2].astype(np.int64) + 2 * ref[1:-1].astype(np.int64)
                     + ref[2:] + 2) >> 2
        ref = out

    left = ref[corner - 1::-1].astype(np.int64)   # left[0] = (x0-1, y0)
    top = ref[corner + 1:].astype(np.int64)       # top[0] = (x0, y0-1)
    cval = int(ref[corner])

    if mode == INTRA_PLANAR:
        x = np.arange(n)
        y = np.arange(n)[:, None]
        tr = int(top[n])
        bl = int(left[n])
        pred_v = ((n - 1 - y) * top[:n][None, :] + (y + 1) * bl) << log2
        pred_h = ((n - 1 - x) * left[:n][y] + (x + 1) * tr) << log2
        pred = (pred_v + pred_h + (n * n)) >> (2 * log2 + 1)
        return _pdpc(pred.astype(np.int64), mode, log2, left, top,
                     maxv).astype(np.int32)

    if mode == INTRA_DC:
        dc = (int(top[:n].sum()) + int(left[:n].sum()) + n) >> (log2 + 1)
        pred = np.full((n, n), dc, np.int64)
        return _pdpc(pred, mode, log2, left, top, maxv).astype(np.int32)

    angle = ANGLE_TABLE[mode]
    vertical = mode >= 34
    main_src = top if vertical else left
    side_src = left if vertical else top

    # extended main reference, indices lo..2n (0 = corner)
    lo = (n * angle) >> 5 if angle < 0 else 0
    off = -lo
    ext = np.zeros(off + 2 * n + 1, np.int64)
    ext[off] = cval
    ext[off + 1:] = main_src
    if angle < 0:
        inv = inv_angle(angle)               # negative for negative angles
        for x in range(-1, lo - 1, -1):
            idx = (x * inv + 256) >> 9       # distance along the side edge
            ext[off + x] = cval if idx <= 0 else \
                side_src[min(idx - 1, 2 * n - 1)]

    k = np.arange(1, n + 1)
    i_idx = (k * angle) >> 5
    i_fact = (k * angle) & 31
    pos = np.arange(n)
    hi = len(ext) - 1
    predT = np.zeros((n, n), np.int64)
    filt = _FG if use_gauss else _FC
    for d_i in range(n):
        base = off + int(i_idx[d_i]) + 1
        f = int(i_fact[d_i])
        if c_idx == 0:
            # 4-tap interpolation over taps at base-1 .. base+2 (§8.4.5.2.12)
            taps = filt[f]
            acc = np.zeros(n, np.int64)
            for t in range(4):
                idx = np.clip(pos + base - 1 + t, 0, hi)
                acc += taps[t] * ext[idx]
            row = np.clip((acc + 32) >> 6, 0, maxv)
        else:
            idx0 = np.clip(pos + base, 0, hi)
            if f == 0:
                row = ext[idx0]
            else:
                idx1 = np.clip(pos + base + 1, 0, hi)
                row = ((32 - f) * ext[idx0] + f * ext[idx1] + 16) >> 5
        predT[d_i] = row

    pred = predT if vertical else predT.T
    if mode in (INTRA_HOR, INTRA_VER):
        pred = _pdpc(pred, mode, log2, left, top, maxv)
    return np.clip(pred, 0, maxv).astype(np.int32)


def _pdpc(pred: np.ndarray, mode: int, log2: int, left: np.ndarray,
          top: np.ndarray, maxv: int) -> np.ndarray:
    """Position-dependent prediction combination (§8.4.5.2.15) for
    planar/DC/horizontal/vertical modes (square blocks, refIdx 0)."""
    n = 1 << log2
    scale = (2 * log2 - 2) >> 2
    x = np.arange(n)
    y = np.arange(n)[:, None]
    if mode in (INTRA_PLANAR, INTRA_DC):
        w_t = 32 >> np.minimum(31, (2 * y) >> scale)
        w_l = 32 >> np.minimum(31, (2 * x) >> scale)
        out = (w_l * left[:n][y] + w_t * top[:n][None, :] +
               (64 - w_l - w_t) * pred + 32) >> 6
    elif mode == INTRA_VER:
        w_l = 16 >> np.minimum(31, (2 * x) >> scale)
        out = (w_l * left[:n][y] + (64 - w_l) * pred + 32) >> 6
    else:  # INTRA_HOR
        w_t = 16 >> np.minimum(31, (2 * y) >> scale)
        out = (w_t * top[:n][None, :] + (64 - w_t) * pred + 32) >> 6
    return np.clip(out, 0, maxv)


# --------------------------------------------------------------------------
# Picture reconstruction
# --------------------------------------------------------------------------

class PictureRecon:
    """Incremental reconstruction surface shared by decoder and the
    encoder planning pass: planes + z-order availability."""

    def __init__(self, width: int, height: int, bit_depth: int = 8):
        self.w = width
        self.h = height
        self.bd = bit_depth
        self.cw = width >> 1
        self.ch = height >> 1
        self.planes = [np.zeros((self.h, self.w), np.int32),
                       np.zeros((self.ch, self.cw), np.int32),
                       np.zeros((self.ch, self.cw), np.int32)]
        h4 = (self.h + 3) // 4 + 1
        w4 = (self.w + 3) // 4 + 1
        self.avail = np.zeros((h4, w4), bool)

    def _sample_available(self, lx: int, ly: int) -> bool:
        if lx < 0 or ly < 0 or lx >= self.w or ly >= self.h:
            return False
        return bool(self.avail[ly >> 2, lx >> 2])

    def gather_refs(self, x: int, y: int, log2: int,
                    c_idx: int) -> np.ndarray:
        """4n+1 reference array with unavailable-sample substitution
        (§8.4.5.2.7).  (x, y) are luma coords of the block."""
        n = 1 << log2
        shift = 1 if c_idx else 0
        px, py = x >> shift, y >> shift
        plane = self.planes[c_idx]
        ph, pw = plane.shape

        coords = []
        for i in range(2 * n):
            coords.append((px - 1, py + 2 * n - 1 - i))
        coords.append((px - 1, py - 1))
        for i in range(2 * n):
            coords.append((px + i, py - 1))

        vals = np.zeros(4 * n + 1, np.int32)
        avail = np.zeros(4 * n + 1, bool)
        for i, (sx, sy) in enumerate(coords):
            if 0 <= sx < pw and 0 <= sy < ph and \
                    self._sample_available(sx << shift, sy << shift):
                vals[i] = plane[sy, sx]
                avail[i] = True

        if not avail.any():
            vals[:] = 1 << (self.bd - 1)
            return vals
        if not avail.all():
            if not avail[0]:
                idx = int(np.argmax(avail))
                vals[0] = vals[idx]
                avail[0] = True
            for i in range(1, 4 * n + 1):
                if not avail[i]:
                    vals[i] = vals[i - 1]
        return vals

    def reconstruct_tb(self, x: int, y: int, log2: int, c_idx: int,
                       mode: int, coeffs: Optional[np.ndarray],
                       qp: int) -> None:
        """Predict + add residual + store; marks luma availability."""
        n = 1 << log2
        ref = self.gather_refs(x, y, log2, c_idx)
        pred = predict_intra(ref, mode, log2, c_idx, self.bd)
        if coeffs is not None:
            d = dequant(coeffs, log2, qp, self.bd)
            res = inverse_transform(d, log2, self.bd)
            pred = pred + res
        shift = 1 if c_idx else 0
        px, py = x >> shift, y >> shift
        plane = self.planes[c_idx]
        ph, pw = plane.shape
        h = min(n, ph - py)
        w = min(n, pw - px)
        maxv = (1 << self.bd) - 1
        plane[py:py + h, px:px + w] = np.clip(pred[:h, :w], 0, maxv)
        if c_idx == 0:
            self.avail[y >> 2:(y + n) >> 2, x >> 2:(x + n) >> 2] = True
