"""Region (rgan), text (txti) item tests — round-trip through the
context layer (ref behavior: libheif/region.cc, text.cc;
API: heif_regions.h, heif_text.h)."""

import numpy as np
import pytest

from libheif_tpu.context import HeifContext
from libheif_tpu.image.pixel_image import (PixelImage, Channel, Colorspace,
                                           Chroma)
from libheif_tpu.items.region_item import RegionItem, RegionGeometry
from libheif_tpu.items.text_item import TextItem


def _make_image(w=64, h=48, seed=0):
    img = PixelImage(w, h, Colorspace.YCbCr, Chroma.C420)
    rng = np.random.default_rng(seed)
    img.set_plane(Channel.Y, rng.integers(0, 256, (h, w), np.uint8), 8)
    img.set_plane(Channel.Cb,
                  rng.integers(0, 256, (h // 2, w // 2), np.uint8), 8)
    img.set_plane(Channel.Cr,
                  rng.integers(0, 256, (h // 2, w // 2), np.uint8), 8)
    return img


def test_region_roundtrip_all_geometries():
    ctx = HeifContext()
    iid = ctx.encode_image(_make_image(), fmt="unci")
    ri = ctx.add_region_item(iid, 640, 480)
    ri.regions.append(RegionGeometry(kind="point", x=10, y=-5))
    ri.regions.append(RegionGeometry(kind="rect", x=1, y=2,
                                     width=100, height=50))
    ri.regions.append(RegionGeometry(kind="ellipse", x=320, y=240,
                                     radius_x=100, radius_y=60))
    ri.regions.append(RegionGeometry(kind="polygon",
                                     points=[(0, 0), (10, 0), (5, 9)]))
    ri.regions.append(RegionGeometry(kind="polyline",
                                     points=[(1, 1), (2, 2)]))
    data = ctx.write()
    assert data == ctx.write()  # deterministic double-write

    ctx2 = HeifContext.read_from_bytes(data)
    regs = ctx2.get_region_items(ctx2.primary_item_id)
    assert len(regs) == 1
    r = regs[0]
    assert (r.reference_width, r.reference_height) == (640, 480)
    assert [g.kind for g in r.regions] == \
        ["point", "rect", "ellipse", "polygon", "polyline"]
    assert (r.regions[0].x, r.regions[0].y) == (10, -5)
    assert r.regions[2].radius_x == 100
    assert r.regions[3].points == [(0, 0), (10, 0), (5, 9)]


def test_region_wide_coordinates_and_inline_mask():
    ctx = HeifContext()
    iid = ctx.encode_image(_make_image(), fmt="unci")
    ri = ctx.add_region_item(iid, 100000, 70000)
    ri.regions.append(RegionGeometry(kind="rect", x=-40000, y=2,
                                     width=99999, height=1))
    ri.regions.append(RegionGeometry(kind="inline_mask", x=0, y=0,
                                     width=8, height=8,
                                     mask_data=bytes(range(8))))
    r = HeifContext.read_from_bytes(ctx.write()).get_region_items(iid)[0]
    assert (r.reference_width, r.reference_height) == (100000, 70000)
    assert (r.regions[0].x, r.regions[0].width) == (-40000, 99999)
    assert r.regions[1].mask_data == bytes(range(8))


def test_region_transform_to_image_space():
    ri = RegionItem(0, 640, 480)
    g = RegionGeometry(kind="rect", x=64, y=48, width=100, height=50)
    out = ri.transform_to_image(g, 64, 48)
    assert (out.x, out.y, out.width, out.height) == (6, 5, 10, 5)


def test_text_item_roundtrip():
    ctx = HeifContext()
    iid = ctx.encode_image(_make_image(), fmt="unci")
    ctx.add_text_item(iid, "hello région ⚡")
    ctx2 = HeifContext.read_from_bytes(ctx.write())
    texts = ctx2.get_text_items(ctx2.primary_item_id)
    assert len(texts) == 1
    assert texts[0].text == "hello région ⚡"


def test_region_item_bad_version():
    from libheif_tpu.core.error import HeifError
    with pytest.raises(HeifError):
        RegionItem.parse(1, bytes([7, 0, 0, 1, 0, 1, 0]))
