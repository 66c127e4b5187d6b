"""Differential conformance sweep for the AV1 decoder vs libaom.

Encodes controlled streams with libaom (tests/av1_oracle.py), decodes
them with both this package's decoder and libaom's own decoder, and
requires bit-exact planes. Mirrors tests/hevc_difftest.py.

    python tests/av1_difftest.py [filter]
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")
from tests import av1_oracle
from libheif_tpu.codecs.av1.decoder import decode_intra_frame

BASE_OPTS = {
    "cpu-used": "6",
    "enable-filter-intra": "0",
    "enable-intrabc": "0",
    "enable-palette": "0",
    "enable-cfl-intra": "0",
    # lossless allows CfL only at 4x4; keep partitions >= 8x8 until the
    # CfL tables/syntax are conformant
    "min-partition-size": "8",
}


def make_planes(w, h, seed, kind):
    rng = np.random.default_rng(seed)
    cw, ch = (w + 1) // 2, (h + 1) // 2
    if kind == "flat":
        return {"Y": np.full((h, w), 128, np.uint8),
                "U": np.full((ch, cw), 128, np.uint8),
                "V": np.full((ch, cw), 128, np.uint8)}
    if kind == "blocky":
        def p(hh, ww):
            b = rng.integers(0, 256, ((hh + 15) // 16, (ww + 15) // 16))
            return np.kron(b, np.ones((16, 16), np.int64))[:hh, :ww] \
                .astype(np.uint8)
        return {"Y": p(h, w), "U": p(ch, cw), "V": p(ch, cw)}
    return {"Y": rng.integers(0, 256, (h, w), dtype=np.uint8),
            "U": rng.integers(0, 256, (ch, cw), dtype=np.uint8),
            "V": rng.integers(0, 256, (ch, cw), dtype=np.uint8)}


CONFIGS = [
    ("flat-lossless", (64, 64), "flat", {"lossless": "1"}),
    ("blocky-lossless", (64, 64), "blocky", {"lossless": "1"}),
    ("noise-lossless", (64, 64), "noise", {"lossless": "1"}),
    ("blocky-lossless-128", (128, 128), "blocky", {"lossless": "1"}),
    ("noise-lossless-rect", (128, 64), "noise", {"lossless": "1"}),
    ("noise-lossless-192", (192, 192), "noise", {"lossless": "1"}),
    ("blocky-odd-96x48", (96, 48), "blocky", {"lossless": "1"}),
    ("noise-odd-100x60", (100, 60), "noise", {"lossless": "1"}),
    ("noise-sb128", (128, 128), "noise",
     {"lossless": "1", "sb-size": "128"}),
]


def run_config(name, size, kind, opts, seed=3):
    w, h = size
    planes = make_planes(w, h, seed, kind)
    all_opts = dict(BASE_OPTS)
    all_opts.update(opts)
    # usage=0 (good quality): the realtime path ignores several
    # feature-disable options (partition bounds, cfl, …)
    obus = av1_oracle.encode(planes, all_opts, usage=0)
    if obus is None:
        return "ENCODE-FAILED"
    ref = av1_oracle.decode(obus)
    if ref is None:
        return "ORACLE-DECODE-FAILED"
    mine = decode_intra_frame(obus)
    for k_mine, k_ref in (("Y", "Y"), ("U", "U"), ("V", "V")):
        a = mine[k_mine]
        b = ref[k_ref]
        a = a[:b.shape[0], :b.shape[1]]
        if not np.array_equal(a, b):
            d = np.argwhere(a != b)
            return (f"MISMATCH {k_mine}: {len(d)}/{a.size} px, first "
                    f"{d[0].tolist()} mine={a[tuple(d[0])]} "
                    f"aom={b[tuple(d[0])]}")
    return None


def main():
    filt = sys.argv[1] if len(sys.argv) > 1 else ""
    fails = 0
    for name, size, kind, opts in CONFIGS:
        if filt and filt not in name:
            continue
        try:
            err = run_config(name, size, kind, opts)
        except Exception as e:  # noqa: BLE001
            err = f"EXC {type(e).__name__}: {e}"
        print(f"{name:24s} {'ok' if err is None else 'FAIL ' + str(err)}")
        if err:
            fails += 1
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
