"""Extract H.264 static spec tables from the system libavcodec binary.

The H.264 spec's CABAC context-initialization table for I slices
(Rec. ITU-T H.264 Tables 9-12..9-33, the (m, n) pairs) and the
deblocking-filter clipping tables (Table 8-16: alpha, beta, tc0) are
compiled into libavcodec's .rodata. This tool locates each by a short
exact prefix of spec-mandated values plus structural checks, and emits
them as a .npz consumed by libheif_tpu/codecs/avc/tables.py.

Identity is confirmed by structure (the I-slice table zeroes the
P/B-only contexts 11..23 and 54..59, unlike the three cabac_init_idc
P/B tables that share the same 11-context prefix) and ultimately by the
test suite decoding libx264-encoded streams bit-exactly — a wrong table
cannot decode anything.

Usage: python tools/extract_avc_tables.py
"""

from __future__ import annotations

import numpy as np

LIB = "/lib/x86_64-linux-gnu/libavcodec.so.59"
OUT = "/root/repo/libheif_tpu/codecs/avc/avc_tables.npz"


def find_all(data: bytes, pat: bytes):
    out, start = [], 0
    while True:
        i = data.find(pat, start)
        if i < 0:
            return out
        out.append(i)
        start = i + 1


def extract_cabac_init_i(data: bytes) -> np.ndarray:
    # Table 9-12 (mb_type contexts 0..10) — identical prefix in all four
    # 1024x2 int8 init tables (I + three cabac_init_idc P/B variants).
    prefix_vals = [20, -15, 2, 54, 3, 74, 20, -15, 2, 54, 3, 74,
                   -28, 127, -23, 104, -6, 53, -1, 54, 7, 51]
    pat = bytes(v & 0xFF for v in prefix_vals)
    cands = []
    for i in find_all(data, pat):
        t = np.frombuffer(data[i:i + 2048], np.int8).reshape(1024, 2)
        # I-slice table: P/B-only mb_type/sub_mb_type/mvd/ref contexts
        # are zero-initialized
        if (t[11:24] == 0).all() and (t[24:36] != 0).any() is not None \
                and (t[40:54] == 0).all():
            cands.append(t)
    if len(cands) != 1:
        raise RuntimeError(f"cabac_context_init_I: {len(cands)} candidates")
    return cands[0].copy()


def extract_cabac_init_pb(data: bytes) -> np.ndarray:
    # The three cabac_init_idc P/B tables (Tables 9-13..9-33 right
    # columns) share the same 11-context mb_type prefix as the I table
    # but have NONZERO inits for the P/B-only contexts 11..23 / 40..53.
    prefix_vals = [20, -15, 2, 54, 3, 74, 20, -15, 2, 54, 3, 74,
                   -28, 127, -23, 104, -6, 53, -1, 54, 7, 51]
    pat = bytes(v & 0xFF for v in prefix_vals)
    cands = []
    for i in find_all(data, pat):
        t = np.frombuffer(data[i:i + 2048], np.int8).reshape(1024, 2)
        if (t[11:24] != 0).any() and (t[40:54] != 0).any():
            cands.append((i, t))
    if len(cands) != 3:
        raise RuntimeError(
            f"cabac_context_init_PB: {len(cands)} candidates")
    # ffmpeg stores them in cabac_init_idc order 0, 1, 2 (adjacent
    # 2048-byte blocks); keep file order
    cands.sort(key=lambda kv: kv[0])
    return np.stack([t.copy() for _, t in cands])


def extract_deblock_tables(data: bytes):
    # Table 8-16 alpha(indexA) for indexA 16..51 (0 below 16)
    alpha_tail = [4, 4, 5, 6, 7, 8, 9, 10, 12, 13, 15, 17, 20, 22, 25,
                  28, 32, 36, 40, 45, 50, 56, 63, 71, 80, 90, 101, 113,
                  127, 144, 162, 182, 203, 226, 255, 255]
    beta_tail = [2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 6, 6, 7, 7, 8, 8, 9, 9,
                 10, 10, 11, 11, 12, 12, 13, 13, 14, 14, 15, 15, 16, 16,
                 17, 17, 18, 18]
    pat_a = bytes(alpha_tail)
    pos_a = find_all(data, pat_a)
    if not pos_a:
        raise RuntimeError("alpha table not found")
    alpha = np.zeros(52, np.int32)
    alpha[16:] = alpha_tail
    pat_b = bytes(beta_tail)
    pos_b = find_all(data, pat_b)
    if not pos_b:
        raise RuntimeError("beta table not found")
    beta = np.zeros(52, np.int32)
    beta[16:] = beta_tail
    # tc0 (Table 8-17): [indexA][bS-1] for bS 1..3, indexA 16..51.
    # ffmpeg stores 4-byte rows [0xFF, tc0_bs1, tc0_bs2, tc0_bs3] (the
    # 0xFF is its bS=0 sentinel). Locate by the full 36-row run; the
    # leading (0,0,0) row is value-identical to the padding rows before
    # it, so alignment ambiguity there is harmless.
    tc0_tail = [
        (0, 0, 0), (0, 0, 1), (0, 0, 1), (0, 0, 1), (0, 0, 1),
        (0, 1, 1), (0, 1, 1), (1, 1, 1), (1, 1, 1), (1, 1, 1),
        (1, 1, 1), (1, 1, 2), (1, 1, 2), (1, 1, 2), (1, 1, 2),
        (1, 2, 3), (1, 2, 3), (2, 2, 3), (2, 2, 4), (2, 3, 4),
        (2, 3, 4), (3, 3, 5), (3, 4, 6), (3, 4, 6), (4, 5, 7),
        (4, 5, 8), (4, 6, 9), (5, 7, 10), (6, 8, 11), (6, 8, 13),
        (7, 10, 14), (8, 11, 16), (9, 12, 18), (10, 13, 20),
        (11, 15, 23), (13, 17, 25),
    ]
    flat = bytes(b for row in tc0_tail for b in (255,) + row)
    pos_t = find_all(data, flat)
    if not pos_t:
        raise RuntimeError("tc0 table not found")
    tc0 = np.zeros((52, 3), np.int32)
    tc0[16:] = np.array(tc0_tail, np.int32)
    return alpha, beta, tc0


def extract_sig8x8(data: bytes) -> np.ndarray:
    # Table 9-43 left column: significant_coeff_flag ctxIdxInc map for
    # 8x8 blocks, frame coding (the field variant follows it in ffmpeg).
    pre = bytes([0, 1, 2, 3, 4, 5, 5, 4, 4, 3, 3, 4, 4, 4, 5, 5,
                 4, 4, 4, 4, 3, 3, 6, 7, 7, 7, 8, 9, 10, 9, 8, 7])
    pos = find_all(data, pre)
    if len(pos) != 1:
        raise RuntimeError(f"sig8x8: {len(pos)} candidates")
    return np.frombuffer(data[pos[0]:pos[0] + 63], np.uint8).astype(np.int32)


def extract_last8x8(data: bytes) -> np.ndarray:
    # Table 9-43 right column (last_significant_coeff_flag ctxIdxInc,
    # 8x8 frame). Runs: 0 | 1x15 | 2x16 | 3x8 | 4x8 | 5x4 | 6x4 |
    # 7x4 | 8x3. Located by the exact 63-byte sequence.
    tab = bytes([0] + [1] * 15 + [2] * 16 + [3] * 8 + [4] * 8 +
                [5] * 4 + [6] * 4 + [7] * 4 + [8] * 3)
    pos = find_all(data, tab)
    if not pos:
        raise RuntimeError("last8x8 table not found")
    return np.frombuffer(tab, np.uint8).astype(np.int32)


def extract_cavlc_tables(data: bytes):
    """CAVLC VLC tables (spec 9.2, tables 9-5..9-10): coeff_token,
    total_zeros (4x4 + chroma DC), run_before — len/bits pairs laid out
    exactly as the spec's code assignments.  Each located by a prefix of
    spec-mandated code lengths/values; a wrong table cannot decode any
    libx264 stream, so the oracle difftests pin identity."""
    out = {}

    def grab(name, prefix, total, anchor_off=0):
        i = data.find(bytes(prefix))
        if i < 0:
            raise RuntimeError(f"cavlc {name} not found")
        start = i - anchor_off
        out[name] = np.frombuffer(data[start:start + total],
                                  np.uint8).copy()

    # coeff_token[4][4*17]: lengths then the code values (table 9-5)
    grab("cavlc_coeff_token_len",
         [1, 0, 0, 0, 6, 2, 0, 0, 8, 6, 3, 0, 9, 8, 7, 5, 10, 9, 8, 6],
         272)
    grab("cavlc_coeff_token_bits",
         [1, 0, 0, 0, 5, 1, 0, 0, 7, 4, 1, 0, 7, 6, 5, 3, 7, 6, 5, 3],
         272)
    # chroma DC coeff_token[4*5] (nC == -1 column of table 9-5)
    grab("cavlc_cdc_token_len",
         [2, 0, 0, 0, 6, 1, 0, 0, 6, 6, 3, 0, 6, 7, 7, 6, 6, 8, 8, 7],
         20)
    grab("cavlc_cdc_token_bits",
         [1, 0, 0, 0, 7, 1, 0, 0, 4, 6, 1, 0, 3, 3, 2, 5, 2, 3, 2, 0],
         20)
    # total_zeros[16][16] (tables 9-7/9-8)
    grab("cavlc_total_zeros_len",
         [1, 3, 3, 4, 4, 5, 5, 6, 6, 7, 7, 8, 8, 9, 9, 9], 256)
    grab("cavlc_total_zeros_bits",
         [1, 3, 2, 3, 2, 3, 2, 3, 2, 3, 2, 3, 2, 3, 2, 1], 256)
    # chroma DC total_zeros[3][4] (table 9-9a)
    grab("cavlc_cdc_tz_len", [1, 2, 3, 3, 1, 2, 2, 0, 1, 1, 0, 0], 12)
    grab("cavlc_cdc_tz_bits", [1, 1, 1, 0, 1, 1, 0, 0, 1, 0, 0, 0], 12)
    # run_before[7][16] (table 9-10); bits located by the distinctive
    # final row (zeros-left > 6), lens by the padded first rows
    grab("cavlc_run_bits", [7, 6, 5, 4, 3, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1],
         112, anchor_off=6 * 16)
    grab("cavlc_run_len",
         [1, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 2, 2, 0],
         112)
    # coded_block_pattern me(v) mappings (table 9-4, codeNum → cbp)
    grab("cavlc_cbp_intra",
         [47, 31, 15, 0, 23, 27, 29, 30, 7, 11, 13, 14, 39, 43, 45, 46],
         48)
    grab("cavlc_cbp_inter",
         [0, 16, 1, 2, 4, 8, 32, 3, 5, 10, 12, 15, 47, 7, 11, 13],
         48)
    # structural checks: valid (tc,t1) slots carry nonzero lengths
    ctl = out["cavlc_coeff_token_len"].reshape(4, 68)
    for nc in range(4):
        for tc in range(17):
            for t1 in range(min(tc, 3) + 1):
                assert ctl[nc, 4 * tc + t1] > 0, (nc, tc, t1)
    return out


def main():
    data = open(LIB, "rb").read()
    init_i = extract_cabac_init_i(data)
    init_pb = extract_cabac_init_pb(data)
    alpha, beta, tc0 = extract_deblock_tables(data)
    sig8x8 = extract_sig8x8(data)
    last8x8 = extract_last8x8(data)
    cavlc = extract_cavlc_tables(data)
    np.savez(OUT, cabac_init_i=init_i, cabac_init_pb=init_pb,
             deblock_alpha=alpha,
             deblock_beta=beta, deblock_tc0=tc0,
             sig_ctx_8x8=sig8x8, last_ctx_8x8=last8x8, **cavlc)
    print(f"saved {OUT}: init_I {init_i.shape}, init_PB {init_pb.shape}, "
          f"alpha/beta/tc0, sig/last 8x8, cavlc ({len(cavlc)} tables) ok")


if __name__ == "__main__":
    main()
