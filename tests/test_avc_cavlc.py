"""AVC CAVLC conformance vs libavcodec (spec 9.1/9.2).

Baseline-profile H.264 is CAVLC-only; the reference decodes it via
openh264 (reference: libheif/plugins/decoder_openh264.cc:477).  Streams
come from in-image x264 with cabac=0 across the partition/feature
matrix; every plane must match libavcodec bit-exactly.
"""

from __future__ import annotations

import numpy as np
import pytest

from tests import avc_oracle
from libheif_tpu.codecs.avc.decoder import (AvcSequenceDecoder,
                                            decode_annexb)
from libheif_tpu.codecs.avc import headers as H

pytestmark = pytest.mark.skipif(not avc_oracle.available(),
                                reason="x264/libavcodec shim missing")


def _content(h, w, kind, rng):
    if kind == "noise":
        return rng.integers(0, 256, (h, w)).astype(np.uint8)
    base = np.kron(rng.integers(0, 256, (h // 16 + 1, w // 16 + 1)),
                   np.ones((16, 16)))[:h, :w]
    return np.clip(base + rng.integers(-12, 12, (h, w)), 0,
                   255).astype(np.uint8)


INTRA_CASES = [
    ("qp26", 64, 64, "photo", 26, False, ""),
    ("qp10-noise", 96, 64, "noise", 10, False, ""),
    ("qp40", 128, 96, "photo", 40, False, ""),
    ("tx8", 96, 96, "photo", 26, True, ""),
    ("i4-only", 64, 64, "photo", 30, False, "8x8dct=0"),
    ("odd-100x52", 100, 52, "photo", 28, False, ""),
]


@pytest.mark.parametrize("name,w,h,kind,qp,tx8,xp", INTRA_CASES,
                         ids=[c[0] for c in INTRA_CASES])
def test_cavlc_intra(name, w, h, kind, qp, tx8, xp):
    rng = np.random.default_rng(3)
    y = _content(h, w, kind, rng)
    u = _content((h + 1) // 2, (w + 1) // 2, kind, rng)
    v = _content((h + 1) // 2, (w + 1) // 2, kind, rng)
    stream = avc_oracle.encode(y, u, v, qp=qp, cabac=False, tx8=tx8,
                               extra_params=xp)
    assert stream is not None
    ref = avc_oracle.decode(stream)
    mine = decode_annexb(stream)
    for k in ref:
        a = np.asarray(ref[k], np.int64)
        b = np.asarray(mine[k], np.int64)
        assert np.array_equal(a, b), (
            f"{k}: {int((a != b).sum())} px differ")


SEQ_CASES = [
    ("default", 96, 128, dict(qp=26, extra_params="cabac=0")),
    ("qp38", 96, 128, dict(qp=38, extra_params="cabac=0")),
    ("qp12", 64, 96, dict(qp=12, extra_params="cabac=0")),
    ("multiref", 96, 128, dict(qp=28, extra_params="cabac=0:ref=3")),
    ("subme7", 96, 128,
     dict(qp=24, extra_params="cabac=0:subme=7:me=umh")),
    ("p4x4", 96, 128, dict(qp=30, extra_params="cabac=0:partitions=all")),
    ("tx8", 96, 128, dict(qp=26, extra_params="cabac=0:8x8dct=1")),
    ("odd-100x52", 52, 100, dict(qp=28, extra_params="cabac=0")),
]


def _seq_frames(h, w, n, rng):
    big = np.kron(rng.integers(0, 256, (h // 8 + 8, w // 8 + 8)),
                  np.ones((8, 8))).astype(np.int64)
    big = np.clip(big + rng.integers(-10, 10, big.shape), 0, 255)
    frames = []
    for i in range(n):
        y = big[i:i + h, 2 * i:2 * i + w].astype(np.uint8)
        u = np.clip(big[i // 2:i // 2 + (h + 1) // 2,
                        i:i + (w + 1) // 2] + 5, 0, 255).astype(np.uint8)
        v = np.clip(big[i // 2 + 3:i // 2 + 3 + (h + 1) // 2,
                        i + 2:i + 2 + (w + 1) // 2], 0,
                    255).astype(np.uint8)
        frames.append((y, u, v))
    return frames


@pytest.mark.parametrize("name,h,w,kw", SEQ_CASES,
                         ids=[c[0] for c in SEQ_CASES])
def test_cavlc_ippp(name, h, w, kw):
    rng = np.random.default_rng(4)
    frames = _seq_frames(h, w, 5, rng)
    stream = avc_oracle.encode_seq(frames, gop=250, **kw)
    assert stream is not None
    refs = avc_oracle.decode_seq(stream)
    dec = AvcSequenceDecoder()
    outs = []
    for nal in H.split_annexb(stream):
        pl = dec.decode_nal(nal)
        if pl is not None:
            outs.append(pl)
    assert len(outs) == len(refs)
    for fi, (ref, mine) in enumerate(zip(refs, outs)):
        for k in ref:
            a = np.asarray(ref[k], np.int64)
            b = np.asarray(mine[k], np.int64)
            assert np.array_equal(a, b), (
                f"frame {fi} {k}: {int((a != b).sum())} px differ")


def test_cavlc_randomized_sweep():
    rng = np.random.default_rng(77)
    for i in range(6):
        h = int(rng.integers(3, 8)) * 16
        w = int(rng.integers(3, 10)) * 16
        qp = int(rng.integers(12, 44))
        kind = "noise" if i % 2 else "photo"
        y = _content(h, w, kind, rng)
        u = _content(h // 2, w // 2, kind, rng)
        v = _content(h // 2, w // 2, kind, rng)
        stream = avc_oracle.encode(y, u, v, qp=qp, cabac=False,
                                   tx8=bool(i % 3 == 0))
        ref = avc_oracle.decode(stream)
        mine = decode_annexb(stream)
        for k in ref:
            assert np.array_equal(np.asarray(ref[k], np.int64),
                                  np.asarray(mine[k], np.int64)), (i, k)
