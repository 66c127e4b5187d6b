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


@pytest.mark.parametrize("q", [12, 140])
def test_encode_lossy_conformance(q):
    """Lossy encoder streams decode bit-exactly in libaom and achieve
    sane rate-distortion (ref analog: encoder_aom.cc quality path)."""
    from libheif_tpu.codecs.av1.encoder import Av1IntraEncoder, Av1EncParams
    from libheif_tpu.codecs.av1.decoder import decode_intra_frame
    from tests import av1_oracle

    rng = np.random.default_rng(42)
    w, h = 100, 75
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    Y = ((xx * 3 + yy * 2 + rng.integers(0, 30, (h, w))) % 256).astype(np.uint8)
    cw, ch = (w + 1) // 2, (h + 1) // 2
    cx, cy = np.meshgrid(np.arange(cw), np.arange(ch))
    U = ((cx * 2 + cy) % 256).astype(np.uint8)
    V = rng.integers(0, 256, (ch, cw), dtype=np.uint8)

    stream = Av1IntraEncoder(w, h, Av1EncParams(base_q_idx=q)).encode(Y, U, V)
    mine = decode_intra_frame(stream)
    mse = float(np.mean((mine["Y"].astype(np.int32) - Y.astype(np.int32)) ** 2))
    psnr = 99.0 if mse == 0 else 10 * np.log10(255 ** 2 / mse)
    assert psnr > (45 if q <= 20 else 28)

    if av1_oracle.available():
        ref = av1_oracle.decode(stream)
        assert ref is not None
        for k in ("Y", "U", "V"):
            assert np.array_equal(mine[k], ref[k])


def test_avif_context_roundtrip_lossy():
    """Full-container AVIF encode → write → read → decode round-trip."""
    from libheif_tpu.context import HeifContext
    from libheif_tpu.image.pixel_image import (PixelImage, Channel,
                                               Colorspace, Chroma)
    from libheif_tpu.api.types import EncodingOptions

    w, h = 96, 64
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    img = PixelImage(w, h, Colorspace.RGB, Chroma.C444)
    img.set_plane(Channel.R, ((xx * 2) % 256).astype(np.uint8), 8)
    img.set_plane(Channel.G, ((yy * 3) % 256).astype(np.uint8), 8)
    img.set_plane(Channel.B, ((xx + yy) % 256).astype(np.uint8), 8)

    ctx = HeifContext()
    ctx.new_file()
    iid = ctx.encode_image(img, fmt="av1",
                           options=EncodingOptions(quality=85))
    ctx.set_primary_item(iid)
    data = ctx.write()

    ctx2 = HeifContext.read_from_bytes(data)
    out = ctx2.decode_image(colorspace=Colorspace.RGB, chroma=Chroma.C444)
    r = out.plane(Channel.R).astype(np.int32)
    mse = float(np.mean((r - ((xx * 2) % 256).astype(np.int32)) ** 2))
    psnr = 99.0 if mse == 0 else 10 * np.log10(255 ** 2 / mse)
    assert psnr > 30
