"""Mini-format write path tests (ref: mini.cc:1695 can_convert_to_mini,
:1808 create_from_heif_file, file.cc:257-285 mini write)."""

import numpy as np
import pytest

from libheif_tpu import api
from libheif_tpu.image.pixel_image import (PixelImage, Channel, Colorspace,
                                           Chroma)


def _img(w=96, h=80, seed=7, with_alpha=False):
    rng = np.random.default_rng(seed)
    img = PixelImage(w, h, Colorspace.YCbCr, Chroma.C420)
    img.set_plane(Channel.Y, rng.integers(0, 256, (h, w), np.uint8), 8)
    img.set_plane(Channel.Cb, rng.integers(0, 256, (h // 2, w // 2),
                                           np.uint8), 8)
    img.set_plane(Channel.Cr, rng.integers(0, 256, (h // 2, w // 2),
                                           np.uint8), 8)
    if with_alpha:
        a = np.zeros((h, w), np.uint8)
        a[:, : w // 2] = 255
        img.set_plane(Channel.Alpha, a, 8)
    return img


def _psnr(a, b):
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    mse = np.mean((a - b) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)


@pytest.mark.parametrize("fmt", ["hevc", "av1"])
def test_mini_write_roundtrip(fmt):
    ctx = api.heif_context_alloc()
    enc = api.heif_context_get_encoder_for_format(ctx, fmt)
    img = _img()
    api.heif_context_encode_image(ctx, img, enc, None)
    api.heif_context_set_write_mini_format(ctx, 1)
    data = ctx.write()
    assert data == ctx.write()                     # deterministic
    assert data[8:12] == b"mif3"                   # compact format chosen
    assert b"mdat" not in data[:64]

    ctx2 = api.HeifContext.read_from_bytes(data)
    out = ctx2.decode_image(ctx2.primary_item_id)
    assert (out.width, out.height) == (img.width, img.height)
    assert _psnr(img.plane(Channel.Y), out.plane(Channel.Y)) > 30


def test_mini_write_with_alpha_and_exif():
    ctx = api.heif_context_alloc()
    enc = api.heif_context_get_encoder_for_format(ctx, "hevc")
    img = _img(with_alpha=True)
    api.heif_context_encode_image(ctx, img, enc, None)
    exif = b"II*\x00" + b"\x01" * 40
    ctx.add_exif(ctx.primary_item_id, exif)
    api.heif_context_set_write_mini_format(ctx, 1)
    data = ctx.write()
    assert data[8:12] == b"mif3"

    ctx2 = api.HeifContext.read_from_bytes(data)
    mini = ctx2.file.mini
    assert mini is not None and mini.alpha_flag and mini.exif_flag
    out = ctx2.decode_image(ctx2.primary_item_id)
    assert out.has_channel(Channel.Alpha)
    a = np.asarray(out.plane(Channel.Alpha))
    assert float(np.mean(a[:, : img.width // 2])) > 200
    assert float(np.mean(a[:, img.width // 2:])) < 55


def test_mini_write_fallback_for_incompatible_content():
    """unci primary cannot be represented as mini → standard format."""
    ctx = api.heif_context_alloc()
    enc = api.heif_context_get_encoder_for_format(ctx, "unci")
    api.heif_context_encode_image(ctx, _img(), enc, None)
    api.heif_context_set_write_mini_format(ctx, 1)
    data = ctx.write()
    assert data[8:12] != b"mif3"
    ctx2 = api.HeifContext.read_from_bytes(data)
    assert ctx2.file.meta is not None
    out = ctx2.decode_image(ctx2.primary_item_id)
    assert _psnr(_img().plane(Channel.Y), out.plane(Channel.Y)) == 99.0


def test_mini_eligibility_reasons():
    from libheif_tpu.file.mini_write import can_convert_to_mini

    ctx = api.heif_context_alloc()
    enc = api.heif_context_get_encoder_for_format(ctx, "unci")
    api.heif_context_encode_image(ctx, _img(), enc, None)
    ok, reason = can_convert_to_mini(ctx.file)
    assert not ok and "av01 or hvc1" in reason
