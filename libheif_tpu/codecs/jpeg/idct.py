"""Batched integer 8x8 DCT/IDCT for JPEG, bit-compatible with the
classic IJG "islow" (Loeffler-Ligtenberg-Moshovitz) fixed-point
algorithm that libjpeg uses — so decode output can be difftested
bit-exactly against PIL/libjpeg (the reference's decoder_libjpeg.cc
path).

All math is int32 with wraparound semantics, batched over every block
of the image at once: (N, 8, 8) arrays, each butterfly an elementwise
op over the N axis — the TPU-native replacement for libjpeg's
per-block scalar loops.
"""

from __future__ import annotations

import numpy as np

CONST_BITS = 13
PASS1_BITS = 2

FIX_0_298631336 = 2446
FIX_0_390180644 = 3196
FIX_0_541196100 = 4433
FIX_0_765366865 = 6270
FIX_0_899976223 = 7373
FIX_1_175875602 = 9633
FIX_1_501321110 = 12299
FIX_1_847759065 = 15137
FIX_1_961570560 = 16069
FIX_2_053119869 = 16819
FIX_2_562915447 = 20995
FIX_3_072711026 = 25172


def _descale(x, n):
    return (x + (1 << (n - 1))) >> n


def _idct_1d(c0, c1, c2, c3, c4, c5, c6, c7, descale_bits):
    """One islow IDCT butterfly over vectors (jidctint.c pass body)."""
    # even part
    z1 = (c2 + c6) * FIX_0_541196100
    tmp2 = z1 + c6 * (-FIX_1_847759065)
    tmp3 = z1 + c2 * FIX_0_765366865
    tmp0 = (c0 + c4) << CONST_BITS
    tmp1 = (c0 - c4) << CONST_BITS
    tmp10 = tmp0 + tmp3
    tmp13 = tmp0 - tmp3
    tmp11 = tmp1 + tmp2
    tmp12 = tmp1 - tmp2
    # odd part
    t0, t1, t2, t3 = c7, c5, c3, c1
    z1 = t0 + t3
    z2 = t1 + t2
    z3 = t0 + t2
    z4 = t1 + t3
    z5 = (z3 + z4) * FIX_1_175875602
    t0 = t0 * FIX_0_298631336
    t1 = t1 * FIX_2_053119869
    t2 = t2 * FIX_3_072711026
    t3 = t3 * FIX_1_501321110
    z1 = z1 * (-FIX_0_899976223)
    z2 = z2 * (-FIX_2_562915447)
    z3 = z3 * (-FIX_1_961570560) + z5
    z4 = z4 * (-FIX_0_390180644) + z5
    t0 = t0 + z1 + z3
    t1 = t1 + z2 + z4
    t2 = t2 + z2 + z3
    t3 = t3 + z1 + z4
    return (_descale(tmp10 + t3, descale_bits),
            _descale(tmp11 + t2, descale_bits),
            _descale(tmp12 + t1, descale_bits),
            _descale(tmp13 + t0, descale_bits),
            _descale(tmp13 - t0, descale_bits),
            _descale(tmp12 - t1, descale_bits),
            _descale(tmp11 - t2, descale_bits),
            _descale(tmp10 - t3, descale_bits))


def idct8x8_islow(blocks_i32):
    """(N, 8, 8) dequantized coefficients → (N, 8, 8) samples [0,255].

    jnp program; jit-compatible.  Matches jpeg_idct_islow for all
    in-range inputs (the final clamp stands in for libjpeg's
    range_limit table, identical for valid streams).
    """
    import jax.numpy as jnp

    b = blocks_i32.astype(jnp.int32)
    # pass 1: columns (operate along axis 1 → vectors are (N, 8) rows)
    cols = [b[:, i, :] for i in range(8)]
    r = _idct_1d(*cols, CONST_BITS - PASS1_BITS)
    ws = jnp.stack(r, axis=1)                     # (N, 8, 8)
    # pass 2: rows
    rows = [ws[:, :, i] for i in range(8)]
    r2 = _idct_1d(*rows, CONST_BITS + PASS1_BITS + 3)
    out = jnp.stack(r2, axis=2)                   # (N, 8, 8)
    return jnp.clip(out + 128, 0, 255)


def fdct8x8_islow(samples_i32):
    """(N, 8, 8) level-shifted samples → (N, 8, 8) DCT coeffs ×8
    (jfdctint.c islow forward transform, batched)."""
    import jax.numpy as jnp

    def pass_(v, first):
        i0, i1, i2, i3, i4, i5, i6, i7 = v
        tmp0 = i0 + i7
        tmp7 = i0 - i7
        tmp1 = i1 + i6
        tmp6 = i1 - i6
        tmp2 = i2 + i5
        tmp5 = i2 - i5
        tmp3 = i3 + i4
        tmp4 = i3 - i4
        tmp10 = tmp0 + tmp3
        tmp13 = tmp0 - tmp3
        tmp11 = tmp1 + tmp2
        tmp12 = tmp1 - tmp2
        if first:
            o0 = (tmp10 + tmp11) << PASS1_BITS
            o4 = (tmp10 - tmp11) << PASS1_BITS
        else:
            o0 = _descale(tmp10 + tmp11, PASS1_BITS)
            o4 = _descale(tmp10 - tmp11, PASS1_BITS)
        z1 = (tmp12 + tmp13) * FIX_0_541196100
        sh = CONST_BITS - PASS1_BITS if first else CONST_BITS + PASS1_BITS
        o2 = _descale(z1 + tmp13 * FIX_0_765366865, sh)
        o6 = _descale(z1 + tmp12 * (-FIX_1_847759065), sh)
        z1 = tmp4 + tmp7
        z2 = tmp5 + tmp6
        z3 = tmp4 + tmp6
        z4 = tmp5 + tmp7
        z5 = (z3 + z4) * FIX_1_175875602
        tmp4 = tmp4 * FIX_0_298631336
        tmp5 = tmp5 * FIX_2_053119869
        tmp6 = tmp6 * FIX_3_072711026
        tmp7 = tmp7 * FIX_1_501321110
        z1 = z1 * (-FIX_0_899976223)
        z2 = z2 * (-FIX_2_562915447)
        z3 = z3 * (-FIX_1_961570560) + z5
        z4 = z4 * (-FIX_0_390180644) + z5
        o7 = _descale(tmp4 + z1 + z3, sh)
        o5 = _descale(tmp5 + z2 + z4, sh)
        o3 = _descale(tmp6 + z2 + z3, sh)
        o1 = _descale(tmp7 + z1 + z4, sh)
        return o0, o1, o2, o3, o4, o5, o6, o7

    b = samples_i32.astype(jnp.int32)
    rows = [b[:, :, i] for i in range(8)]
    r1 = pass_(rows, first=True)
    ws = jnp.stack(r1, axis=2)
    cols = [ws[:, i, :] for i in range(8)]
    r2 = pass_(cols, first=False)
    return jnp.stack(r2, axis=1)
