"""Extract AV1 default CDF tables from the system libaom binary.

The AV1 spec's default CDF tables (spec §"Default CDF Tables") are
compiled into libaom's .rodata. This tool locates each table by its
exact shape signature — CDF rows are strictly-decreasing 15-bit values
with a `0, 0` tail (value terminator + adaptation counter), and every
table's dimensions are fixed by the spec — and emits them as a .npz
consumed by libheif_tpu/codecs/av1/cdf.py.

Table identity is confirmed three ways: shape validation, adjacency
chains (arrays sit consecutively modulo alignment padding), and
ultimately bit-exact decoding of libaom-encoded streams in the test
suite (a wrong assignment cannot decode anything).

Usage: python tools/extract_av1_cdfs.py [--verify]
"""

from __future__ import annotations

import subprocess
import sys

import numpy as np

LIB = "/lib/x86_64-linux-gnu/libaom.so.3"


def read_rodata():
    out = subprocess.check_output(["objdump", "-h", LIB]).decode()
    for line in out.splitlines():
        if ".rodata" in line:
            parts = line.split()
            size, off = int(parts[2], 16), int(parts[5], 16)
            data = open(LIB, "rb").read()[off:off + size]
            return np.frombuffer(data, np.uint16)
    raise RuntimeError("no .rodata")


def row_ok(r):
    if r[-1] != 0 or r[-2] != 0:
        return False
    r = r.astype(np.int32)
    if (r >= 32768).any():
        return False
    nz_end = len(r)
    while nz_end > 0 and r[nz_end - 1] == 0:
        nz_end -= 1
    if nz_end == 0:
        return False
    seg = r[:nz_end]
    return bool((np.diff(seg) < 0).all() and (seg > 0).all())


def validate(arr, width, allow_zero_rows=False):
    if len(arr) % width:
        return False
    for r in arr.reshape(-1, width):
        if allow_zero_rows and (r == 0).all():
            continue
        if not row_ok(r):
            return False
    return True


# (name, shape) — last dim is the CDF row width (nsymbols + 1 counter).
# Shapes follow the AV1 spec's default CDF table dimensions.
TABLES = {
    "coeff_base_eob": (4, 5, 2, 4, 4),
    "coeff_base":     (4, 5, 2, 42, 5),
    "coeff_br":       (4, 5, 2, 21, 5),
    "eob_pt_1024":    (4, 2, 2, 12),
    "eob_pt_512":     (4, 2, 2, 11),
    "eob_pt_256":     (4, 2, 2, 10),
    "eob_pt_128":     (4, 2, 2, 9),
    "eob_pt_64":      (4, 2, 2, 8),
    "eob_pt_32":      (4, 2, 2, 7),
    "eob_pt_16":      (4, 2, 2, 6),
    "eob_extra":      (4, 5, 2, 9, 3),
    "txb_skip":       (4, 5, 13, 3),
    "dc_sign":        (4, 2, 3, 3),
    "kf_y_mode":      (5, 5, 14),
    "y_mode":         (4, 14),
    "uv_mode":        (2, 13, 15),
    "partition":      (20, 11),
    "intra_ext_tx":   (3, 4, 13, 17),
    "cfl_alpha":      (6, 17),
    "cfl_sign":       (9,),
    "tx_size":        (4, 3, 4),
    "angle_delta":    (8, 8),
    "filter_intra_use": (22, 3),
    "filter_intra_mode": (6,),
    "skip":           (3, 3),
    "delta_q":        (5,),
    "intrabc":        (3,),
    "txfm_partition": (21, 3),
    "dv_joints":      (5,),
    "dv_classes":     (12,),
    "dv_class0":      (3,),
    "dv_bits":        (10, 3),
    "dv_sign":        (3,),
    "inter_ext_tx":   (3, 4, 17),
    "palette_y_size": (7, 8),
    "palette_uv_size": (7, 8),
    "palette_y_mode": (7, 3, 3),
    "palette_uv_mode": (2, 3),
    "palette_y_color": (7, 5, 9),
    "palette_uv_color": (7, 5, 9),
}

# Anchor offsets confirmed by uniqueness + alignment + adjacency chains
# (uint16 indices into .rodata of aom 3.6.0). Chains: coeff_base_eob →
# coeff_base → coeff_br; eob_pt_1024 → … → eob_pt_16 → eob_extra →
# txb_skip → dc_sign; cfl_alpha → partition → uv_mode → kf_y_mode →
# [lookup junk] → palette sizes → angle_delta; tx_size → delta_q.
# Six tables additionally match dav1d's .rodata verbatim.
KNOWN = {
    "coeff_base_eob": 26160,
    "coeff_base":     26800,
    "coeff_br":       35200,
    "eob_pt_1024":    39408,
    "eob_pt_512":     39600,
    "eob_pt_256":     39776,
    "eob_pt_128":     39936,
    "eob_pt_64":      40080,
    "eob_pt_32":      40208,
    "eob_pt_16":      40320,
    "eob_extra":      40416,
    "txb_skip":       41504,
    "dc_sign":        42288,
    # set0 is unused/zero in aom; the real data is two blocks (set1:
    # 52 rows of 7 symbols, set2: 52 rows of 5) found uniquely by
    # structural scan at u16 offset 44772
    "intra_ext_tx":   44772,
    "partition":      46544,
    "uv_mode":        46768,
    "kf_y_mode":      47168,
    "palette_y_size": 47552,
    "palette_uv_size": 47608,
    "angle_delta":    47664,
    "y_mode":         48448,
    "tx_size":        48616,
    # palette color-index tables sit before txb_skip; identified by
    # their spec first rows (y: CDF2(28710), uv: CDF2(29089))
    "palette_y_color": 42912,
    "palette_uv_color": 42592,
}

# Tables whose values are confirmed (spec defaults recognized verbatim
# in the binary) but whose in-memory array layout is ambiguous.
_PAL_Y_MODE = [
    (1092, 29349, 31507), (856, 29909, 31788), (945, 29368, 31987),
    (738, 29207, 31864), (459, 25431, 31306), (503, 28753, 31247),
    (318, 24822, 32639),
]

LITERAL = {
    # --- intrabc / inter-tx tables (read directly out of the rodata
    # default-cdf blob: txfm_partition at u16 offset 47944 (21 CDF2
    # rows), the DV nmv context at 48800 (joints/classes/class0/bits/
    # sign; fp/hp unused at MV_SUBPEL_NONE), inter_ext_tx at 43616
    # ([4 sets][4 sqr-sizes][17]); unused set/size slots hold uniform
    # rows in libaom and are kept verbatim) ---
    "txfm_partition": np.array(
        [[v, 0, 0] for v in
         [4187, 8922, 11921, 8453, 14572, 20635, 13977, 21881, 21763,
          5589, 12764, 21487, 6219, 13460, 18544, 4753, 11222, 18368,
          4603, 10367, 16680]], np.uint16),
    "dv_joints": np.array([28672, 21504, 13440, 0, 0], np.uint16),
    "dv_classes": np.array(
        [4096, 1792, 910, 448, 217, 112, 28, 11, 6, 1, 0, 0],
        np.uint16),
    "dv_class0": np.array([5120, 0, 0], np.uint16),
    "dv_bits": np.array(
        [[v, 0, 0] for v in
         [15360, 14848, 13824, 12288, 10240, 8192, 4096, 2816, 2816,
          2048]], np.uint16),
    "dv_sign": np.array([16384, 0, 0], np.uint16),
    "inter_ext_tx": np.array([
        # set 1 (ALL16), sqr 4 / 8 trained, 16/32 uniform
        [[28310, 27208, 25073, 23059, 19438, 17979, 15231, 12502,
          11264, 9920, 8834, 7294, 5041, 3853, 2137, 0, 0],
         [31123, 30195, 27990, 27057, 24961, 24146, 22246, 17411,
          15094, 12360, 10251, 7758, 5652, 3912, 2019, 0, 0],
         [30720, 28672, 26624, 24576, 22528, 20480, 18432, 16384,
          14336, 12288, 10240, 8192, 6144, 4096, 2048, 0, 0],
         [30720, 28672, 26624, 24576, 22528, 20480, 18432, 16384,
          14336, 12288, 10240, 8192, 6144, 4096, 2048, 0, 0]],
        # set 2 (DTT9_IDTX_1DDCT, 12 syms), only sqr 16 trained
        [[30037, 27307, 24576, 21845, 19115, 16384, 13653, 10923,
          8192, 5461, 2731, 0, 0, 0, 0, 0, 0],
         [30037, 27307, 24576, 21845, 19115, 16384, 13653, 10923,
          8192, 5461, 2731, 0, 0, 0, 0, 0, 0],
         [31998, 30347, 27543, 19861, 16949, 13841, 11207, 8679,
          6173, 4242, 2239, 0, 0, 0, 0, 0, 0],
         [30037, 27307, 24576, 21845, 19115, 16384, 13653, 10923,
          8192, 5461, 2731, 0, 0, 0, 0, 0, 0]],
        # set 3 (DCT + IDTX, 2 syms)
        [[16384] + [0] * 16,
         [28601] + [0] * 16,
         [30770] + [0] * 16,
         [32020] + [0] * 16],
    ], np.uint16),
    # filter-intra + CfL tables (recovered literally from the rodata
    # default-cdf blob at 48400/48224/48688; alignment pads prevent
    # plain array reads)
    # layout note: BLOCK_SIZES_ALL order puts the extended rectangular
    # sizes 4X16/16X4/8X32/32X8 at indices 16-19 — the four trained
    # values go THERE (filter-intra is allowed for them), while the
    # >32px square/wide sizes at 10-15 keep the flat 16384 default.
    # Misplacing them at 11-14 desynced every 1:4-partition
    # filter-intra stream (caught by the 4x16 oracle difftest).
    "filter_intra_use": np.array(
        [[v, 0, 0] for v in
         [28147, 26025, 26875, 24902, 20217, 23374, 20360, 18467,
          20012, 10425] + [16384] * 6 +
         [19998, 22400, 12539, 14667] + [16384] * 2], np.uint16),
    "cfl_sign": np.array(
        [25008, 18945, 16960, 15127, 13612, 12102, 5877, 0, 0],
        np.uint16),
    "cfl_alpha": np.array([r + [0, 0] for r in [
        [25131, 12049, 1367, 287, 111, 80, 76, 72, 68, 64, 60, 56,
         52, 48, 44],
        [18403, 9165, 4633, 1600, 601, 373, 281, 195, 148, 121, 100,
         96, 92, 88, 84],
        [21236, 10388, 4323, 1408, 419, 245, 184, 119, 95, 91, 87,
         83, 79, 75, 71],
        [5778, 1366, 486, 197, 76, 72, 68, 64, 60, 56, 52, 48, 44,
         40, 36],
        [15520, 6710, 3864, 2160, 1463, 891, 642, 447, 374, 304,
         252, 208, 192, 175, 146],
        [18030, 11090, 6989, 4867, 3744, 2466, 1788, 925, 624, 355,
         248, 174, 146, 112, 108]]], np.uint16),
    # palette mode flag cdfs — recovered from rodata 47784.. (rows are
    # interleaved with one alignment pad, so pinned literally)
    "palette_y_mode": np.array(
        [[[v, 0, 0] for v in g] for g in _PAL_Y_MODE], np.uint16),
    "palette_uv_mode": np.array(
        [[27822, 0, 0], [23300, 0, 0]], np.uint16),
    # default_skip_cdfs = AOM_CDF2(31671 / 16515 / 4576), at rodata 48576
    "skip": np.array([[1097, 0, 0], [16253, 0, 0], [28192, 0, 0]],
                     np.uint16),
    # default_delta_q_cdf = AOM_CDF4(28160, 32120, 32677), at rodata 48664
    "delta_q": np.array([4608, 648, 91, 0, 0], np.uint16),
}


def find_candidates(u16, shape, lo=0, hi=None, allow_zero_rows=False):
    total = int(np.prod(shape))
    width = shape[-1]
    hi = hi if hi is not None else len(u16) - total
    out = []
    for start in range(lo, hi + 1):
        seg = u16[start:start + total]
        if len(seg) < total:
            break
        if seg[width - 1] != 0 or seg[width - 2] != 0:
            continue
        if validate(seg, width, allow_zero_rows):
            out.append(start)
    return out


def main():
    u16 = read_rodata()
    tables = {}
    offsets = dict(KNOWN)

    for name, off in KNOWN.items():
        shape = TABLES[name]
        if name == "intra_ext_tx":
            # rodata holds only sets 1 (7-symbol) and 2 (5-symbol),
            # back to back; set 0 is unused/zero in the spec
            arr = np.zeros(shape, np.uint16)
            n = 4 * 13 * 17
            arr[1] = u16[off:off + n].reshape(4, 13, 17)
            arr[2] = u16[off + n:off + 2 * n].reshape(4, 13, 17)
            assert validate(arr[1].ravel(), 17)
            assert validate(arr[2].ravel(), 17)
            tables[name] = arr
            continue
        total = int(np.prod(shape))
        seg = u16[off:off + total]
        assert validate(seg, shape[-1]), name
        tables[name] = seg.reshape(shape).copy()

    for name, arr in LITERAL.items():
        tables[name] = arr.reshape(TABLES[name])

    # prediction helper tables (not CDFs): smooth weights (uint8, spec
    # Sm_Weights_Tx_*) and directional derivatives (uint16, spec
    # Dr_Intra_Derivative), located by their leading values
    raw = u16.tobytes()
    i = raw.find(bytes([255, 149, 85, 64]))
    assert i >= 0, "sm_weights not found"
    tables["sm_weights"] = np.frombuffer(
        raw[i:i + 4 + 8 + 16 + 32 + 64], np.uint8).copy()
    j = raw.find(np.array([1023, 0, 0, 547], np.uint16).tobytes())
    assert j >= 0 and j % 2 == 0, "dr_intra_derivative not found"
    tables["dr_intra_derivative"] = np.frombuffer(
        raw[j - 6:j - 6 + 90 * 2], np.uint16).copy()

    # filter-intra 7-tap predictors: int8 [5][8][8], rows sum to 16;
    # located by the first row (-6,10,0,0,0,12,0,0)
    raw8 = u16.tobytes()
    ti = raw8.find(np.array([-6, 10, 0, 0, 0, 12, 0, 0], np.int8).tobytes())
    assert ti >= 0, "filter intra taps not found"
    tables["filter_intra_taps"] = np.frombuffer(
        raw8[ti:ti + 320], np.int8).reshape(5, 8, 8).copy()

    print("pinned:", len(tables))
    for name, shape in TABLES.items():
        if name in tables:
            continue
        cands = find_candidates(u16, shape, lo=42280, hi=48700,
                                allow_zero_rows=False)
        print(f"UNPINNED {name:18s} shape={shape} cands={cands[:8]}"
              f"{' …' if len(cands) > 8 else ''}")

    np.savez("/root/repo/libheif_tpu/codecs/av1/default_cdfs.npz",
             **{k: v for k, v in tables.items()})
    print("saved", len(tables), "tables")


if __name__ == "__main__":
    main()
