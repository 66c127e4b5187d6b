"""Sequence (track) tests — moov/trak round-trip with HEVC samples
(ref behavior: libheif/sequences/*, heif_sequences.h)."""

import numpy as np

from libheif_tpu.context import HeifContext
from libheif_tpu.image.pixel_image import (PixelImage, Channel, Colorspace,
                                           Chroma)


def _frame(i, w=64, h=64):
    img = PixelImage(w, h, Colorspace.YCbCr, Chroma.C420)
    rng = np.random.default_rng(100 + i)
    base = rng.integers(0, 200, (h, w), np.uint8)
    y = (base + 10 * i).astype(np.uint8)
    img.set_plane(Channel.Y, y, 8)
    img.set_plane(Channel.Cb,
                  np.full((h // 2, w // 2), 90 + 20 * i, np.uint8), 8)
    img.set_plane(Channel.Cr,
                  np.full((h // 2, w // 2), 150 - 20 * i, np.uint8), 8)
    return img


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)


def test_visual_track_roundtrip():
    ctx = HeifContext()
    frames = [_frame(i) for i in range(3)]
    tw = ctx.add_visual_track(64, 64, fmt="hevc", timescale=30)
    for f in frames:
        tw.add_frame(f, duration=1)
    data = ctx.write()
    assert data == ctx.write()  # deterministic

    ctx2 = HeifContext.read_from_bytes(data)
    tracks = ctx2.tracks
    assert len(tracks) == 1
    t = tracks[0]
    assert t.handler == "pict" or t.handler == "vide"
    assert len(t.samples) == 3
    assert (t.width, t.height) == (64, 64)
    assert t.timescale == 30
    for i in range(3):
        img = t.decode_sample(i)
        y = img.plane(Channel.Y)
        assert _psnr(y, frames[i].plane(Channel.Y)) > 35
        cb = img.plane(Channel.Cb)
        assert abs(float(np.mean(cb)) - (90 + 20 * i)) < 4


def test_track_sequential_reader():
    ctx = HeifContext()
    tw = ctx.add_visual_track(32, 32, fmt="hevc", timescale=10)
    for i in range(2):
        tw.add_frame(_frame(i, 32, 32), duration=5)
    ctx2 = HeifContext.read_from_bytes(ctx.write())
    t = ctx2.tracks[0]
    imgs = []
    while True:
        img = t.decode_next_image()
        if img is None:
            break
        imgs.append(img)
    assert len(imgs) == 2
    assert t.sample_duration(0) == 5


def test_track_alongside_still_image():
    ctx = HeifContext()
    rng = np.random.default_rng(7)
    still = PixelImage(16, 16, Colorspace.YCbCr, Chroma.C444)
    for ch in (Channel.Y, Channel.Cb, Channel.Cr):
        still.set_plane(ch, rng.integers(0, 256, (16, 16), np.uint8), 8)
    iid = ctx.encode_image(still, fmt="unci")
    tw = ctx.add_visual_track(32, 32, fmt="hevc", timescale=10)
    tw.add_frame(_frame(0, 32, 32), duration=1)
    ctx2 = HeifContext.read_from_bytes(ctx.write())
    # still image intact
    out = ctx2.decode_image(ctx2.primary_item_id)
    assert np.array_equal(out.plane(Channel.Y), still.plane(Channel.Y))
    # track intact
    assert len(ctx2.tracks) == 1
    assert len(ctx2.tracks[0].samples) == 1
