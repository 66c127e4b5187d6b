"""Differential conformance for LOSSY AV1 intra decode vs libaom.

Stages feature complexity via aom options: start DCT-only without
in-loop filters, then widen (full tx set, tx64, larger partitions).
Streams whose frame header enables in-loop filtering are skipped until
the filter stages land (the harness reports them separately).

    python tests/av1_lossy_difftest.py [filter]
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")
from tests import av1_oracle
from libheif_tpu.codecs.av1 import obu as O
from libheif_tpu.codecs.av1.decoder import decode_intra_frame

BASE = {
    "cpu-used": "6",
    "enable-filter-intra": "0",
    "enable-intrabc": "0",
    "enable-palette": "0",
    "enable-cfl-intra": "0",
    "enable-cdef": "0",
    "enable-restoration": "0",
    "enable-tx64": "0",
}


def make_planes(w, h, seed, kind):
    rng = np.random.default_rng(seed)
    cw, ch = (w + 1) // 2, (h + 1) // 2
    if kind == "flat":
        return {"Y": np.full((h, w), 128, np.uint8),
                "U": np.full((ch, cw), 120, np.uint8),
                "V": np.full((ch, cw), 136, np.uint8)}
    if kind == "grad":
        yy = (np.arange(h)[:, None] * 2 + np.arange(w)[None, :]) % 256
        return {"Y": yy.astype(np.uint8),
                "U": ((yy[:ch * 2:2, :cw * 2:2] // 2) + 64).astype(np.uint8),
                "V": (128 - yy[:ch * 2:2, :cw * 2:2] // 4).astype(np.uint8)}
    if kind == "photo":
        # smooth 2-D bumps: lots of mid-size tx, angles, adst
        ys, xs = np.mgrid[0:h, 0:w]
        yy = (128 + 90 * np.sin(xs / 7.0) * np.cos(ys / 9.0) +
              20 * np.sin((xs + 2 * ys) / 23.0)).clip(0, 255)
        u = (128 + 60 * np.sin(xs[:ch * 2:2, :cw * 2:2] / 11.0)).clip(0, 255)
        v = (128 + 60 * np.cos(ys[:ch * 2:2, :cw * 2:2] / 13.0)).clip(0, 255)
        return {"Y": yy.astype(np.uint8), "U": u.astype(np.uint8),
                "V": v.astype(np.uint8)}
    # noise
    return {"Y": rng.integers(0, 256, (h, w), np.uint8),
            "U": rng.integers(0, 256, (ch, cw), np.uint8),
            "V": rng.integers(0, 256, (ch, cw), np.uint8)}


def stream_uses_filters(obus: bytes) -> bool:
    seq = None
    for ob in O.split_obus(obus):
        if ob.type == O.OBU_SEQUENCE_HEADER:
            seq = O.parse_sequence_header(ob.payload)
        elif ob.type in (O.OBU_FRAME_HEADER, O.OBU_FRAME):
            fh = O.parse_frame_header(ob.payload, seq)
            return ((fh.cdef.bits > 0 or any(fh.cdef.y_pri) or
                     any(fh.cdef.y_sec)) or
                    any(t != 0 for t in fh.lr_type))
    return False


CONFIGS = [
    # name, size, kind, rc_q (0..63 scale), extra options
    ("flat-dct-q15",    (64, 64),  "flat",  15, {"use-intra-dct-only": "1"}),
    ("grad-dct-q15",    (64, 64),  "grad",  15, {"use-intra-dct-only": "1"}),
    ("grad-dct-q30",    (64, 64),  "grad",  30, {"use-intra-dct-only": "1"}),
    ("photo-dct-q20",   (128, 128), "photo", 20, {"use-intra-dct-only": "1"}),
    ("noise-dct-q25",   (64, 64),  "noise", 25, {"use-intra-dct-only": "1"}),
    ("photo-dct-q45",   (128, 128), "photo", 45, {"use-intra-dct-only": "1"}),
    ("grad-alltx-q15",  (64, 64),  "grad",  15, {}),
    ("photo-alltx-q20", (128, 128), "photo", 20, {}),
    ("photo-alltx-q45", (128, 128), "photo", 45, {}),
    ("noise-alltx-q25", (64, 64), "noise", 25, {}),
    ("photo-tx64-q20",  (128, 128), "photo", 20, {"enable-tx64": "1"}),
    ("photo-odd-q20",   (100, 52), "photo", 20, {}),
    ("photo-sb128-q20", (128, 128), "photo", 20, {"sb-size": "128"}),
    ("photo-reduced-q20", (128, 128), "photo", 20,
     {"reduced-tx-type-set": "1"}),
]


def run(filt=""):
    ok = fail = skip = 0
    for (name, (w, h), kind, q, extra) in CONFIGS:
        if filt and filt not in name:
            continue
        planes = make_planes(w, h, 7, kind)
        opts = dict(BASE)
        opts.update(extra)
        opts["_min_q"] = opts["_max_q"] = str(q)
        obus = av1_oracle.encode(planes, opts, usage=0)
        if obus is None:
            print(f"{name:22s} ENCODE-FAILED")
            fail += 1
            continue
        ref = av1_oracle.decode(obus)
        if ref is None:
            print(f"{name:22s} ORACLE-DECODE-FAILED")
            fail += 1
            continue
        if stream_uses_filters(obus):
            print(f"{name:22s} SKIP (in-loop filters active)")
            skip += 1
            continue
        try:
            mine = decode_intra_frame(obus)
        except Exception as e:
            print(f"{name:22s} DECODE-RAISED {type(e).__name__}: {e}")
            fail += 1
            continue
        bad = []
        for pl in ("Y", "U", "V"):
            if not np.array_equal(mine[pl], ref[pl]):
                d = np.argwhere(mine[pl].astype(int) != ref[pl].astype(int))
                bad.append(f"{pl}:{len(d)}diff first@{tuple(d[0])}")
        if bad:
            print(f"{name:22s} MISMATCH {' '.join(bad)}")
            fail += 1
        else:
            print(f"{name:22s} ok")
            ok += 1
    print(f"\n{ok} ok, {fail} fail, {skip} skipped")
    return fail


if __name__ == "__main__":
    sys.exit(1 if run(sys.argv[1] if len(sys.argv) > 1 else "") else 0)
