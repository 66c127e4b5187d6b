"""Device-assisted HEVC intra mode search (TPU experiment).

The encoder's mode decision has no serial entropy dependency: open-loop
(source-reference) prediction cost can be evaluated for EVERY block and
EVERY intra mode at once.  HEVC intra prediction is an (almost) linear
operator on the 4n+1 reference samples, so the whole search becomes
three matmuls — ideal MXU shape:

    P[N, M, n*n]  = R[N, 4n+1] @ W[M, n*n, 4n+1]   (prediction)
    D             = Hadamard(P - src)               (SATD)
    modes[N]      = argmin_M sum |D|

The integer rounding of the spec predictor is dropped (float weights);
the host encoder re-runs the EXACT in-loop prediction for the chosen
mode, so the stream stays conformant — the device only chooses, never
reconstructs.  This replaces the host encoder's per-block candidate
sweep (`encoder.IntraEncoder._choose_mode`) when
EncParams(mode="device").

Measured by tools/benchmark_all.py `hevc_device_mode_search`; the
reference's encoder analog is x265's intra analysis inside its plugin
boundary (ref: libheif/plugins/encoder_x265.cc).
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import Dict

import numpy as np

from .tables import INTRA_PRED_ANGLE, INTRA_INV_ANGLE

MODES = list(range(35))          # planar, DC, angular 2..34


# --------------------------------------------------------------------------
# per-mode float weight matrices (pred = W @ ref)
# --------------------------------------------------------------------------
# ref layout matches recon._gather_refs: [left bottom-up 2n] [corner]
# [top 2n]; index of (x0-1, y0-1) is 2n.

@lru_cache(maxsize=None)
def weight_matrix(mode: int, log2: int) -> np.ndarray:
    n = 1 << log2
    n_ref = 4 * n + 1
    corner = 2 * n
    W = np.zeros((n * n, n_ref), np.float32)

    def left_i(i):          # left[i] = (x0-1, y0+i)
        return corner - 1 - i

    def top_i(i):           # top[i] = (x0+i, y0-1)
        return corner + 1 + i

    if mode == 0:           # planar
        for y in range(n):
            for x in range(n):
                j = y * n + x
                W[j, left_i(y)] += (n - 1 - x) / (2.0 * n)
                W[j, top_i(n)] += (x + 1) / (2.0 * n)
                W[j, top_i(x)] += (n - 1 - y) / (2.0 * n)
                W[j, left_i(n)] += (y + 1) / (2.0 * n)
        return W
    if mode == 1:           # DC (without the edge filter)
        for i in range(n):
            W[:, left_i(i)] = 1.0 / (2.0 * n)
            W[:, top_i(i)] += 1.0 / (2.0 * n)
        return W

    angle = INTRA_PRED_ANGLE[mode]
    vertical = mode >= 18

    def main_i(i):
        return top_i(i) if vertical else left_i(i)

    def side_i(i):
        return left_i(i) if vertical else top_i(i)

    # extended main reference as index mapping ext[j] -> (ref idx, wgt)
    lo = min(0, (n * angle) >> 5) if angle < 0 else 0
    off = -lo
    ext = [None] * (off + 2 * n + 1)
    ext[off] = corner
    for i in range(2 * n):
        ext[off + 1 + i] = main_i(i)
    if angle < 0:
        inv = INTRA_INV_ANGLE[angle]
        for x in range(-1, lo - 1, -1):
            idx = (x * inv + 128) >> 8
            ext[off + x] = corner if idx == 0 else \
                side_i(min(idx - 1, 2 * n - 1))
    hi = len(ext) - 1

    for d in range(n):
        i_idx = ((d + 1) * angle) >> 5
        f = ((d + 1) * angle) & 31
        for pos in range(n):
            base = off + i_idx + 1 + pos
            j = (d * n + pos) if vertical else (pos * n + d)
            i0 = ext[min(base, hi)]
            if f == 0:
                W[j, i0] += 1.0
            else:
                i1 = ext[min(base + 1, hi)]
                W[j, i0] += (32 - f) / 32.0
                W[j, i1] += f / 32.0
    return W


@lru_cache(maxsize=None)
def all_weights(log2: int) -> np.ndarray:
    return np.stack([weight_matrix(m, log2) for m in MODES])


@lru_cache(maxsize=None)
def hadamard(n: int) -> np.ndarray:
    h = np.array([[1.0]], np.float32)
    while h.shape[0] < n:
        h = np.block([[h, h], [h, -h]])
    return h


# --------------------------------------------------------------------------
# batched reference/block extraction (host, numpy)
# --------------------------------------------------------------------------

def extract_blocks(y: np.ndarray, log2: int):
    """(blocks[N, n*n], refs[N, 4n+1], grid shape) over the padded
    plane; refs come from the SOURCE (open-loop search)."""
    n = 1 << log2
    h, w = y.shape
    gh, gw = h // n, w // n
    ypad = np.pad(y.astype(np.float32), 1, mode="edge")
    blocks = (y[:gh * n, :gw * n].astype(np.float32)
              .reshape(gh, n, gw, n).transpose(0, 2, 1, 3)
              .reshape(gh * gw, n * n))
    refs = np.zeros((gh, gw, 4 * n + 1), np.float32)
    corner = 2 * n
    for by in range(gh):
        for bx in range(gw):
            y0, x0 = by * n, bx * n
            col = ypad[y0 + 1:y0 + 1 + 2 * n, x0]
            if len(col) < 2 * n:
                col = np.pad(col, (0, 2 * n - len(col)), mode="edge")
            row = ypad[y0, x0 + 1:x0 + 1 + 2 * n]
            if len(row) < 2 * n:
                row = np.pad(row, (0, 2 * n - len(row)), mode="edge")
            refs[by, bx, corner - 1::-1] = col
            refs[by, bx, corner] = ypad[y0, x0]
            refs[by, bx, corner + 1:] = row
    return blocks, refs.reshape(gh * gw, 4 * n + 1), (gh, gw)


# --------------------------------------------------------------------------
# the device program
# --------------------------------------------------------------------------

@lru_cache(maxsize=None)
def _jitted_search(log2: int):
    import jax
    import jax.numpy as jnp

    n = 1 << log2
    W = jnp.asarray(all_weights(log2))          # [M, n*n, 4n+1]
    H = jnp.asarray(hadamard(n)) / math.sqrt(n)

    @jax.jit
    def search(blocks, refs):
        # [N, M, n*n]
        preds = jnp.einsum("nk,mjk->nmj", refs, W,
                           preferred_element_type=jnp.float32)
        res = preds - blocks[:, None, :]
        r = res.reshape(res.shape[0], res.shape[1], n, n)
        t = jnp.einsum("ij,nmjk,kl->nmil", H, r, H)
        cost = jnp.abs(t).sum(axis=(2, 3))
        return jnp.argmin(cost, axis=1).astype(jnp.int32)

    return search


def plan_modes_device(y: np.ndarray,
                      sizes=(3, 4, 5)) -> Dict[int, np.ndarray]:
    """Mode maps {log2: [gh, gw] int32} for each block size, computed
    in one device dispatch per size."""
    out = {}
    for log2 in sizes:
        n = 1 << log2
        if y.shape[0] < n or y.shape[1] < n:
            continue
        blocks, refs, (gh, gw) = extract_blocks(y, log2)
        search = _jitted_search(log2)
        modes = np.asarray(search(blocks, refs)).reshape(gh, gw)
        out[log2] = modes
    return out


def plan_modes_host(y: np.ndarray, sizes=(3, 4, 5)) -> Dict[int, np.ndarray]:
    """Same search on host numpy (the measurement baseline)."""
    out = {}
    for log2 in sizes:
        n = 1 << log2
        if y.shape[0] < n or y.shape[1] < n:
            continue
        blocks, refs, (gh, gw) = extract_blocks(y, log2)
        W = all_weights(log2)
        H = hadamard(n) / math.sqrt(n)
        best = np.zeros(blocks.shape[0], np.int32)
        cost = np.full(blocks.shape[0], np.inf, np.float32)
        for mi in range(len(MODES)):
            p = refs @ W[mi].T
            r = (p - blocks).reshape(-1, n, n)
            t = np.einsum("ij,njk,kl->nil", H, r, H)
            c = np.abs(t).sum(axis=(1, 2))
            upd = c < cost
            best[upd] = mi
            cost[upd] = c[upd]
        out[log2] = best.reshape(gh, gw)
    return out
