"""Differential conformance sweep for the AVC (H.264) intra codec core.

Two directions, both against libavcodec (tests/avc_oracle.py):
  decode: libx264 encodes synthetic content → this package's decoder
          must match avcodec's decode bit-exactly;
  encode: this package's encoder emits a stream → avcodec's decode must
          match the encoder's own reconstruction bit-exactly (and the
          package decoder must agree — three-way check).

Usage:  python tests/avc_difftest.py            # full sweep
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")
from libheif_tpu.codecs.avc.decoder import decode_annexb  # noqa: E402
from libheif_tpu.codecs.avc.encoder import encode_frame   # noqa: E402
from tests import avc_oracle                              # noqa: E402


def make_planes(w, h, seed, kind="noise"):
    rng = np.random.default_rng(seed)
    if kind == "noise":
        y = rng.integers(0, 256, (h, w)).astype(np.uint8)
    elif kind == "grad":
        xx, yy = np.meshgrid(np.arange(w), np.arange(h))
        y = ((xx * 2 + yy * 3 + rng.integers(0, 50, (h, w))) % 256
             ).astype(np.uint8)
    elif kind == "blocks":
        y = (rng.integers(0, 2, ((h + 7) // 8, (w + 7) // 8)) * 255
             ).repeat(8, 0).repeat(8, 1)[:h, :w].astype(np.uint8)
    else:  # smooth
        base = rng.integers(0, 256, (max(1, h // 16), max(1, w // 16)))
        y = np.kron(base, np.ones((16, 16), np.int64))[:h, :w
                                                       ].astype(np.uint8)
    u = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
    v = ((np.arange(w // 2)[None, :] * 5 + np.arange(h // 2)[:, None] * 3)
         % 256).astype(np.uint8)
    return y, u, v


def run_decode_config(name, w, h, qp, tx8, deblock, kind, seed=7):
    """x264 → package decoder vs avcodec. Returns None or error str."""
    y, u, v = make_planes(w, h, seed, kind)
    extra = "" if deblock else "no-deblock=1"
    stream = avc_oracle.encode(y, u, v, qp=qp, cabac=True, tx8=tx8,
                               extra_params=extra)
    if stream is None:
        return f"{name}: x264 encode failed"
    ref = avc_oracle.decode(stream)
    try:
        mine = decode_annexb(stream)
    except Exception as e:  # noqa: BLE001
        return f"{name}: decoder raised {type(e).__name__}: {e}"
    for k in ("Y", "U", "V"):
        if not np.array_equal(mine[k], ref[k]):
            d = np.abs(mine[k].astype(int) - ref[k].astype(int))
            return (f"{name}: plane {k} differs from avcodec "
                    f"(max {d.max()}, n {(d > 0).sum()})")
    return None


def run_encode_config(name, w, h, qp, tx8_policy, deblock, kind, seed=11):
    """package encoder → avcodec + self decode, three-way bit-exact."""
    y, u, v = make_planes(w, h, seed, kind)
    tx8 = tx8_policy != "never"
    sps, pps, sl, recon = encode_frame(y, u, v, qp=qp, tx8=tx8,
                                       tx8_policy=tx8_policy,
                                       deblock=deblock)
    sc = b"\x00\x00\x00\x01"
    stream = sc + sps + sc + pps + sc + sl
    ref = avc_oracle.decode(stream)
    if ref is None:
        return f"{name}: avcodec rejected the stream"
    try:
        mine = decode_annexb(stream)
    except Exception as e:  # noqa: BLE001
        return f"{name}: own decoder raised {type(e).__name__}: {e}"
    for k in ("Y", "U", "V"):
        if not np.array_equal(mine[k], ref[k]):
            d = np.abs(mine[k].astype(int) - ref[k].astype(int))
            return (f"{name}: own decode differs from avcodec on {k} "
                    f"(max {d.max()})")
    if not deblock:
        # encoder recon == decoded output only when deblock is off
        planes = {"Y": recon[0][:h, :w], "U": recon[1][:h // 2, :w // 2],
                  "V": recon[2][:h // 2, :w // 2]}
        for k, pl in planes.items():
            if not np.array_equal(ref[k], pl.astype(np.uint8)):
                return f"{name}: encoder recon differs from avcodec on {k}"
    return None


DECODE_CONFIGS = [
    ("cavlcless-qp26", 96, 80, 26, False, False, "noise"),
    ("tx8-qp26", 96, 80, 26, True, False, "grad"),
    ("tx8-deblock-qp30", 112, 96, 30, True, True, "grad"),
    ("deblock-qp18", 64, 64, 18, False, True, "noise"),
    ("deblock-qp44-smooth", 128, 96, 44, True, True, "smooth"),
    ("blocks-qp34", 80, 64, 34, True, True, "blocks"),
]

ENCODE_CONFIGS = [
    ("enc-4x4-qp26", 96, 80, 26, "never", False, "noise"),
    ("enc-tx8-qp26", 96, 80, 26, "always", False, "grad"),
    ("enc-mixed-qp34", 112, 64, 34, "alternate", False, "noise"),
    ("enc-auto-deblock", 96, 96, 30, "auto", True, "smooth"),
    ("enc-auto-qp12", 64, 64, 12, "auto", False, "grad"),
    ("enc-auto-qp46", 80, 80, 46, "auto", False, "blocks"),
]


def main():
    pat = sys.argv[1] if len(sys.argv) > 1 else ""
    if not avc_oracle.available():
        print("avc oracle not available; skipping")
        return
    n_fail = 0
    for cfg in DECODE_CONFIGS:
        if pat and pat not in cfg[0]:
            continue
        err = run_decode_config(*cfg)
        print(("FAIL " + err) if err else f"ok   {cfg[0]}")
        n_fail += bool(err)
    for cfg in ENCODE_CONFIGS:
        if pat and pat not in cfg[0]:
            continue
        err = run_encode_config(*cfg)
        print(("FAIL " + err) if err else f"ok   {cfg[0]}")
        n_fail += bool(err)
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
