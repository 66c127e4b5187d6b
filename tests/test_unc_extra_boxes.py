"""ISO 23001-17 sensor/metadata boxes (splz/sbpm/snuc/cloc) and the
uncv uncompressed-video sample entry (ref: unc_boxes.h:391-501) —
round-trip + limits tests, plus an uncv video track round-trip.
"""

import math

import numpy as np
import pytest

from libheif_tpu.core.bitstream import ByteReader, ByteWriter
from libheif_tpu.core.limits import SecurityLimits
from libheif_tpu.core.error import HeifError
from libheif_tpu.boxes.box import read_box, Box_Error
from libheif_tpu.boxes.unc import (Box_splz, Box_sbpm, Box_snuc, Box_cloc,
                                   BadPixel)
from libheif_tpu.context import HeifContext
from libheif_tpu.image.pixel_image import (PixelImage, Channel, Colorspace,
                                           Chroma)


def roundtrip(box):
    w = ByteWriter()
    box.write(w)
    parsed = read_box(ByteReader(w.data()), SecurityLimits())
    assert type(parsed) is type(box)
    return parsed


def test_splz_roundtrip():
    b = Box_splz()
    b.component_ids = [0, 1]
    b.pattern_width = 2
    b.pattern_height = 2
    b.polarization_angles = [0.0, 45.0, 90.0, 135.0]
    p = roundtrip(b)
    assert p.component_ids == [0, 1]
    assert (p.pattern_width, p.pattern_height) == (2, 2)
    assert p.polarization_angles == [0.0, 45.0, 90.0, 135.0]
    assert p.dump_fields()


def test_splz_nan_no_filter():
    b = Box_splz()
    b.pattern_width = 1
    b.pattern_height = 1
    b.polarization_angles = [float("nan")]
    p = roundtrip(b)
    assert math.isnan(p.polarization_angles[0])


def test_splz_zero_size_rejected():
    b = Box_splz()
    b.pattern_width = 0
    b.pattern_height = 1
    b.polarization_angles = []
    w = ByteWriter()
    b.write(w)
    parsed = read_box(ByteReader(w.data()), SecurityLimits())
    assert isinstance(parsed, Box_Error) or parsed.pattern_width != 0


def test_sbpm_roundtrip():
    b = Box_sbpm()
    b.component_ids = [0]
    b.correction_applied = True
    b.bad_rows = [5, 9]
    b.bad_columns = [3]
    b.bad_pixels = [BadPixel(1, 2), BadPixel(7, 8)]
    p = roundtrip(b)
    assert p.correction_applied is True
    assert p.bad_rows == [5, 9]
    assert p.bad_columns == [3]
    assert [(x.row, x.column) for x in p.bad_pixels] == [(1, 2), (7, 8)]


def test_sbpm_limit():
    """Security-limit violations are fatal (ref: parse_error_fatality
    box.h:170 — security errors abort the whole parse)."""
    b = Box_sbpm()
    b.bad_rows = list(range(100))
    w = ByteWriter()
    b.write(w)
    limits = SecurityLimits(max_bad_pixels=10)
    with pytest.raises(HeifError):
        read_box(ByteReader(w.data()), limits)


def test_snuc_roundtrip():
    b = Box_snuc()
    b.component_ids = [0, 1, 2]
    b.nuc_is_applied = False
    b.image_width = 2
    b.image_height = 3
    b.nuc_gains = [1.0, 1.5, 0.5, 2.0, 1.0, 1.0]
    b.nuc_offsets = [0.0, -1.0, 2.5, 0.0, 3.0, -0.5]
    p = roundtrip(b)
    assert p.component_ids == [0, 1, 2]
    assert (p.image_width, p.image_height) == (2, 3)
    assert p.nuc_gains == b.nuc_gains
    assert p.nuc_offsets == b.nuc_offsets


def test_cloc_roundtrip_and_range():
    b = Box_cloc()
    b.chroma_location = 4
    p = roundtrip(b)
    assert p.chroma_location == 4
    bad = Box_cloc()
    bad.chroma_location = 7
    w = ByteWriter()
    bad.write(w)
    assert isinstance(read_box(ByteReader(w.data()), SecurityLimits()),
                      Box_Error)


# ---------------------------------------------------------------- uncv

def _frame(i, w=64, h=48):
    img = PixelImage(w, h, Colorspace.YCbCr, Chroma.C420)
    rng = np.random.default_rng(500 + i)
    img.set_plane(Channel.Y, rng.integers(0, 256, (h, w), np.uint8), 8)
    img.set_plane(Channel.Cb,
                  rng.integers(0, 256, (h // 2, w // 2), np.uint8), 8)
    img.set_plane(Channel.Cr,
                  rng.integers(0, 256, (h // 2, w // 2), np.uint8), 8)
    return img


def test_uncv_track_roundtrip():
    """Uncompressed video track: write frames, read back bit-exactly
    (ref: Box_uncv unc_boxes.h:494 + VisualSampleEntry children)."""
    ctx = HeifContext()
    frames = [_frame(i) for i in range(3)]
    tw = ctx.add_visual_track(64, 48, fmt="unc", timescale=30)
    for f in frames:
        tw.add_frame(f, duration=1)
    data = ctx.write()
    assert data == ctx.write()

    ctx2 = HeifContext.read_from_bytes(data)
    assert len(ctx2.tracks) == 1
    t = ctx2.tracks[0]
    assert t.sample_entry_type() == "uncv"
    assert len(t.samples) == 3
    for i in range(3):
        img = t.decode_sample(i)
        for ch in (Channel.Y, Channel.Cb, Channel.Cr):
            np.testing.assert_array_equal(img.plane(ch),
                                          frames[i].plane(ch),
                                          err_msg=f"frame {i} {ch}")


def test_uncv_track_rgb():
    ctx = HeifContext()
    img = PixelImage(32, 16, Colorspace.RGB, Chroma.C444)
    rng = np.random.default_rng(9)
    for ch in (Channel.R, Channel.G, Channel.B):
        img.set_plane(ch, rng.integers(0, 256, (16, 32), np.uint8), 8)
    tw = ctx.add_visual_track(32, 16, fmt="unc")
    tw.add_frame(img, duration=1)
    ctx2 = HeifContext.read_from_bytes(ctx.write())
    out = ctx2.tracks[0].decode_sample(0)
    for ch in (Channel.R, Channel.G, Channel.B):
        np.testing.assert_array_equal(out.plane(ch), img.plane(ch))
