"""AV1 film grain synthesis conformance vs libaom (spec §7.18.3).

The reference applies grain inside dav1d/aom
(/root/reference/libheif/plugins/decoder_dav1d.cc decodes with grain on
by default); grain-coded AVIF stills must decode bit-exactly with the
noise applied.  Streams use libaom's film-grain-test vectors (fixed
parameter sets covering luma/chroma scaling points, AR lags, overlap,
clip-to-restricted) plus denoise-noise-level estimated grain.
"""

from __future__ import annotations

import numpy as np
import pytest

from tests import av1_oracle
from libheif_tpu.codecs.av1.decoder import decode_intra_frame_ex

pytestmark = pytest.mark.skipif(not av1_oracle.available(),
                                reason="libaom missing")


def _content(h, w, maxp, seed=5):
    rng = np.random.default_rng(seed)
    dt = np.uint8 if maxp <= 256 else np.uint16
    base = np.kron(rng.integers(0, maxp, (h // 16 + 1, w // 16 + 1)),
                   np.ones((16, 16)))[:h, :w]
    return {"Y": np.clip(base + rng.integers(-10, 10, (h, w)), 0,
                         maxp - 1).astype(dt),
            "U": rng.integers(0, maxp, ((h + 1) // 2,
                                        (w + 1) // 2)).astype(dt),
            "V": rng.integers(0, maxp, ((h + 1) // 2,
                                        (w + 1) // 2)).astype(dt)}


def _exact(planes, opts, bits=8):
    obus = av1_oracle.encode(planes, opts, usage=0, bit_depth=bits)
    assert obus is not None, "oracle encode failed"
    ref = av1_oracle.decode(obus)
    assert ref is not None
    mine, seq = decode_intra_frame_ex(obus, engine="host")
    assert seq.bit_depth == bits
    for k in ref:
        a = np.asarray(ref[k], np.int64)
        b = np.asarray(mine[k], np.int64)
        assert np.array_equal(a, b), (
            f"plane {k}: {int((a != b).sum())} px differ "
            f"(max {int(np.abs(a - b).max())})")


@pytest.mark.parametrize("tv", list(range(1, 17)))
def test_film_grain_test_vector(tv):
    _exact(_content(96, 128, 256),
           {"cpu-used": "6", "_min_q": "30", "_max_q": "30",
            "film-grain-test": str(tv)})


@pytest.mark.parametrize("tv", [2, 7, 12])
def test_film_grain_10bit(tv):
    _exact(_content(96, 128, 1024),
           {"cpu-used": "6", "_min_q": "30", "_max_q": "30",
            "film-grain-test": str(tv)}, bits=10)


@pytest.mark.parametrize("size", [(100, 67), (133, 61), (33, 33)])
def test_film_grain_odd_dims(size):
    w, h = size
    _exact(_content(h, w, 256),
           {"cpu-used": "6", "_min_q": "30", "_max_q": "30",
            "film-grain-test": "3"})


def test_film_grain_estimated():
    """denoise-noise-level: real estimated grain params, not a test
    vector (AR coefficients from the content)."""
    _exact(_content(128, 128, 256),
           {"cpu-used": "3", "_min_q": "30", "_max_q": "30",
            "denoise-noise-level": "25"})


def test_film_grain_native_engine_output():
    """Grain is an output-stage pass shared by both engines: the
    native-engine result must carry it too."""
    planes = _content(96, 96, 256)
    obus = av1_oracle.encode(planes,
                             {"cpu-used": "6", "_min_q": "30",
                              "_max_q": "30", "film-grain-test": "2"},
                             usage=0)
    ref = av1_oracle.decode(obus)
    mine, _ = decode_intra_frame_ex(obus, engine="native")
    for k in ref:
        assert np.array_equal(np.asarray(ref[k], np.int64),
                              np.asarray(mine[k], np.int64)), k
