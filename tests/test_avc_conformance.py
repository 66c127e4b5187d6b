"""AVC (H.264) codec core conformance vs libavcodec/libx264.

Mirrors the reference's test posture for its AVC plugins (reference:
libheif/plugins/decoder_openh264.cc, encoder_x264.cc boundaries): the
package's from-scratch decoder must reproduce avcodec's decode of real
x264 streams bit-exactly, and avcodec must reproduce the package
encoder's reconstruction bit-exactly.
"""

import numpy as np
import pytest

from tests import avc_oracle
from tests.avc_difftest import (DECODE_CONFIGS, ENCODE_CONFIGS,
                                run_decode_config, run_encode_config)

needs_oracle = pytest.mark.skipif(not avc_oracle.available(),
                                  reason="libavcodec oracle not available")


@needs_oracle
@pytest.mark.parametrize("cfg", DECODE_CONFIGS, ids=[c[0] for c in
                                                     DECODE_CONFIGS])
def test_decode_config(cfg):
    err = run_decode_config(*cfg)
    assert err is None, err


@needs_oracle
@pytest.mark.parametrize("cfg", ENCODE_CONFIGS, ids=[c[0] for c in
                                                     ENCODE_CONFIGS])
def test_encode_config(cfg):
    err = run_encode_config(*cfg)
    assert err is None, err


@needs_oracle
def test_mono_roundtrip():
    """Monochrome (chroma_format_idc 0) decode of an x264 gray stream."""
    rng = np.random.default_rng(5)
    y = rng.integers(0, 256, (64, 80)).astype(np.uint8)
    from libheif_tpu.codecs.avc.encoder import encode_frame
    from libheif_tpu.codecs.avc.decoder import decode_annexb
    sps, pps, sl, recon = encode_frame(y, None, None, qp=28, tx8=True,
                                       deblock=False)
    sc = b"\x00\x00\x00\x01"
    stream = sc + sps + sc + pps + sc + sl
    mine = decode_annexb(stream)
    assert np.array_equal(mine["Y"], recon[0][:64, :80].astype(np.uint8))
    ref = avc_oracle.decode(stream)
    assert ref is not None and np.array_equal(ref["Y"], mine["Y"])


def test_context_avc_roundtrip():
    """avc1 item encode → write → read → decode through the context."""
    from libheif_tpu.context import HeifContext
    from libheif_tpu.image.pixel_image import (PixelImage, Channel,
                                               Colorspace, Chroma)
    rng = np.random.default_rng(3)
    w, h = 96, 64
    img = PixelImage(w, h, Colorspace.YCbCr, Chroma.C420)
    base = rng.integers(0, 256, (h // 8, w // 8))
    img.set_plane(Channel.Y,
                  np.kron(base, np.ones((8, 8), np.int64))[:h, :w
                                                           ].astype(np.uint8),
                  8)
    img.set_plane(Channel.Cb, np.full((h // 2, w // 2), 90, np.uint8), 8)
    img.set_plane(Channel.Cr, np.full((h // 2, w // 2), 170, np.uint8), 8)
    ctx = HeifContext()
    ctx.encode_image(img, "avc")
    blob = ctx.write()
    ctx2 = HeifContext.read_from_bytes(blob)
    out = ctx2.decode_image(ctx2.primary_item_id)
    y0 = np.asarray(img.plane(Channel.Y), np.int64)
    y1 = np.asarray(out.plane(Channel.Y), np.int64)
    mse = float(((y0 - y1) ** 2).mean())
    psnr = 10 * np.log10(255.0 ** 2 / max(mse, 1e-9))
    assert out.width == w and out.height == h
    assert psnr > 30.0, f"avc roundtrip PSNR {psnr:.1f} too low"


def test_avc_odd_size_crop():
    """Non-MB-aligned sizes round the conformance window correctly."""
    from libheif_tpu.codecs.avc.encoder import encode_frame
    from libheif_tpu.codecs.avc.decoder import decode_annexb
    rng = np.random.default_rng(8)
    w, h = 70, 50
    y = rng.integers(0, 256, (h, w)).astype(np.uint8)
    u = rng.integers(0, 256, ((h + 1) // 2, (w + 1) // 2)).astype(np.uint8)
    v = rng.integers(0, 256, ((h + 1) // 2, (w + 1) // 2)).astype(np.uint8)
    sps, pps, sl, recon = encode_frame(y, u, v, qp=20, deblock=False)
    sc = b"\x00\x00\x00\x01"
    mine = decode_annexb(sc + sps + sc + pps + sc + sl)
    assert mine["Y"].shape == (h, w)
    assert np.array_equal(mine["Y"], recon[0][:h, :w].astype(np.uint8))
