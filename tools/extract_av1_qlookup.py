"""Extract the AV1 10/12-bit dequant lookup tables from system libaom.

The AV1 spec's dc_qlookup_10/dc_qlookup_12/ac_qlookup_10/ac_qlookup_12
tables (spec §9.3 "Conversion tables", 256 int16 entries each) are
spec-mandated constants.  Rather than retyping 1024 numbers, locate
them in the system libaom .rodata by anchoring on the 8-bit tables this
repo already carries (same pattern as tools/extract_avc_tables.py for
the AVC CABAC init tables).  libaom lays the six tables out adjacently
(av1/common/quant_common.c): ..._12, ..._10, ..._8 for ac then dc.

Validation: every extracted table must be monotonic non-decreasing,
start at 4, and the 10/12-bit variants are pinned by the bit-exact
oracle difftests (tests/test_av1_conformance.py 10-bit rows).

Usage: python tools/extract_av1_qlookup.py   # writes qlookup_hbd.npz
"""

from __future__ import annotations

import glob
import sys

import numpy as np

sys.path.insert(0, ".")
from libheif_tpu.codecs.av1 import tables as T  # noqa: E402


def main() -> None:
    cands = (glob.glob("/usr/lib/x86_64-linux-gnu/libaom.so.3*") +
             glob.glob("/usr/lib/libaom.so.3*"))
    if not cands:
        raise SystemExit("libaom not found")
    blob = open(cands[0], "rb").read()

    out = {}
    for name, table8 in (("dc", T.DC_QLOOKUP), ("ac", T.AC_QLOOKUP)):
        anchor = blob.find(np.asarray(table8, np.int16).tobytes())
        if anchor < 0:
            raise SystemExit(f"8-bit {name} table not found in libaom")
        for depth, off in ((10, -1), (12, -2)):
            arr = np.frombuffer(blob[anchor + off * 512:
                                     anchor + (off + 1) * 512], np.int16)
            a64 = arr.astype(np.int64)
            assert arr[0] == 4 and np.all(np.diff(a64) >= 0), \
                f"{name}_{depth} failed sanity checks"
            # magnitude scales ~4x per 2 extra bits
            assert a64[-1] > 4 * np.asarray(table8)[-1] * \
                (3 if depth == 12 else 0.9), (name, depth, a64[-1])
            out[f"{name}_qlookup_{depth}"] = arr.copy()

    # film grain gaussian_sequence (spec §7.18.3.1, 2048 entries):
    # int32 in libaom grain_synthesis.c; anchored by its well-known
    # opening values, validated zero-mean/±2047/even
    prefix = np.asarray([56, 568, -180, 172, 124, -84, 172, -64],
                        np.int32).tobytes()
    gi = blob.find(prefix)
    if gi < 0:
        raise SystemExit("gaussian_sequence not found in libaom")
    gauss = np.frombuffer(blob[gi:gi + 2048 * 4], np.int32)
    g = gauss.astype(np.int64)
    assert np.abs(g).max() < 4096 and np.all(g % 2 == 0) and \
        abs(g.mean()) < 50, "gaussian_sequence failed sanity checks"
    out["gaussian_sequence"] = gauss.astype(np.int16)

    np.savez("libheif_tpu/codecs/av1/qlookup_hbd.npz", **out)
    for k, v in out.items():
        print(k, len(v), v[:4].tolist(), "...", v[-2:].tolist())


if __name__ == "__main__":
    main()
