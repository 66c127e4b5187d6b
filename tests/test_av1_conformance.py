"""AV1 conformance: differential tests against libaom (when present).

Two directions, mirroring the HEVC strategy (tests/test_hevc_conformance):
- decode: libaom-encoded streams must decode bit-exactly here
- encode: streams from this package's encoder must decode bit-exactly
  in libaom (lossless still profile)
"""

import numpy as np
import pytest

from tests import av1_oracle

needs_oracle = pytest.mark.skipif(not av1_oracle.available(),
                                  reason="libaom not available")


@needs_oracle
def test_decode_flat_lossless():
    from tests.av1_difftest import run_config
    assert run_config("flat-lossless", (64, 64), "flat",
                      {"lossless": "1"}) is None


@needs_oracle
@pytest.mark.parametrize("w,h", [(64, 64), (128, 64), (64, 128),
                                 (192, 192)])
def test_encode_lossless_conformance(w, h):
    from libheif_tpu.codecs.av1.encoder import Av1IntraEncoder, Av1EncParams
    from libheif_tpu.codecs.av1.decoder import decode_intra_frame
    rng = np.random.default_rng(w * 1000 + h)
    Y = rng.integers(0, 256, (h, w)).astype(np.uint8)
    U = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
    V = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
    stream = Av1IntraEncoder(w, h, Av1EncParams()).encode(Y, U, V)
    mine = decode_intra_frame(stream)
    for k, p in (("Y", Y), ("U", U), ("V", V)):
        assert np.array_equal(mine[k][:p.shape[0], :p.shape[1]], p), \
            f"self-decode {k}"
    ref = av1_oracle.decode(stream)
    assert ref is not None, "libaom rejected the stream"
    for k, p in (("Y", Y), ("U", U), ("V", V)):
        assert np.array_equal(ref[k], p), f"libaom decode {k}"


@needs_oracle
def test_msac_roundtrip():
    import random
    from libheif_tpu.codecs.av1.msac import Msac
    from libheif_tpu.codecs.av1.msac_enc import MsacEncoder
    random.seed(11)
    for _ in range(30):
        cdfs_e = []
        for _ in range(3):
            n = random.randint(2, 12)
            vals = sorted(random.sample(range(1, 32768), n - 1),
                          reverse=True)
            cdfs_e.append(vals + [0, 0])
        cdfs_d = [list(c) for c in cdfs_e]
        seq = [(random.randrange(3), None) for _ in range(60)]
        seq = [(i, random.randrange(len(cdfs_e[i]) - 1)) for i, _ in seq]
        enc = MsacEncoder()
        for i, v in seq:
            enc.encode_symbol(cdfs_e[i], v)
        dec = Msac(enc.done(), True)
        for i, v in seq:
            assert dec.read_symbol(cdfs_d[i]) == v


def test_av1_lossy_difftest_subset():
    """Lossy decode bit-exactness vs libaom (subset; the full sweep is
    tests/av1_lossy_difftest.py)."""
    from tests import av1_lossy_difftest as L
    fails = L.run("photo-alltx-q20")
    fails += L.run("grad-dct-q30")
    fails += L.run("photo-odd-q20")
    assert fails == 0
