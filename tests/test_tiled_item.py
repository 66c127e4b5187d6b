"""'tili' dynamically-tiled item tests.

Model: reference tiled.cc behaviors (offset-table round-trip,
append-tile encode, per-tile streaming decode, field-overflow
rejection) — there is no upstream Catch2 test for tili, so these
cover the behaviors the reference implements at
libheif/image-items/tiled.cc:363-1060.
"""

import numpy as np
import pytest

from libheif_tpu.api import HeifContext, EncodingOptions
from libheif_tpu.boxes.tild import Box_tilC, TiledImageParameters
from libheif_tpu.core.error import HeifError
from libheif_tpu.image.pixel_image import (PixelImage, Channel, Colorspace,
                                           Chroma)
from libheif_tpu.items.tiled_item import TiledHeader


def make_rgb_tile(w, h, seed, smooth=False):
    rng = np.random.default_rng(seed)
    img = PixelImage(w, h, Colorspace.RGB, Chroma.C444)
    if smooth:
        yy, xx = np.mgrid[0:h, 0:w]
        for i, ch in enumerate((Channel.R, Channel.G, Channel.B)):
            base = 127.5 + 120 * np.sin((xx + seed * 4) / 17.0 + i) * \
                np.cos(yy / 23.0 + i * 0.7)
            img.set_plane(ch, np.clip(base, 0, 255).astype(np.uint8), 8)
        return img
    for ch in (Channel.R, Channel.G, Channel.B):
        img.set_plane(ch, rng.integers(0, 256, (h, w)).astype(np.uint8), 8)
    return img


class TestTilCBox:
    def test_roundtrip(self):
        p = TiledImageParameters(image_width=512, image_height=256,
                                 tile_width=64, tile_height=64,
                                 compression_format="hvc1",
                                 offset_field_length=48,
                                 size_field_length=32,
                                 tiles_are_sequential=True,
                                 number_of_extra_dimensions=2,
                                 extra_dimensions=[3, 5])
        box = Box_tilC(p)
        data = box.serialize()

        from libheif_tpu.boxes import read_all_boxes
        [box2] = read_all_boxes(data)
        assert isinstance(box2, Box_tilC)
        q = box2.params
        assert (q.tile_width, q.tile_height) == (64, 64)
        assert q.compression_format == "hvc1"
        assert q.offset_field_length == 48
        assert q.size_field_length == 32
        assert q.tiles_are_sequential
        assert q.extra_dimensions == [3, 5]

    def test_tile_counts(self):
        p = TiledImageParameters(image_width=100, image_height=50,
                                 tile_width=32, tile_height=32)
        assert p.tiles_h() == 4 and p.tiles_v() == 2
        assert p.number_of_tiles() == 8


class TestTiledHeader:
    def test_serialize_parse_roundtrip(self):
        p = TiledImageParameters(image_width=128, image_height=64,
                                 tile_width=32, tile_height=32,
                                 offset_field_length=40,
                                 size_field_length=24)
        hdr = TiledHeader(p)
        offsets = {}
        off = hdr.table_size()
        for ty in range(2):
            for tx in range(4):
                size = 100 + 13 * (ty * 4 + tx)
                hdr.set_tile_range(tx, ty, off, size)
                offsets[(tx, ty)] = (off, size)
                off += size
        raw = hdr.serialize()
        assert len(raw) == 8 * (5 + 3)

        # parse back entry-wise
        for idx in range(8):
            e = raw[idx * 8:(idx + 1) * 8]
            o = int.from_bytes(e[:5], "big")
            s = int.from_bytes(e[5:], "big")
            tx, ty = idx % 4, idx // 4
            assert (o, s) == offsets[(tx, ty)]

    def test_field_overflow_rejected(self):
        p = TiledImageParameters(image_width=64, image_height=32,
                                 tile_width=32, tile_height=32,
                                 offset_field_length=32,
                                 size_field_length=24)
        hdr = TiledHeader(p)
        with pytest.raises(HeifError):
            hdr.set_tile_range(0, 0, 1 << 33, 10)       # offset too wide
        with pytest.raises(HeifError):
            hdr.set_tile_range(0, 0, 100, 1 << 25)      # size too wide


class TestTiliRoundtrip:
    def _roundtrip(self, fmt, tw=32, th=32, cols=3, rows=2, smooth=False,
                   **ctx_kw):
        ctx = HeifContext()
        tili_id = ctx.add_tiled_image(tw * cols, th * rows, tw, th,
                                      fmt=fmt, **ctx_kw)
        tiles = {}
        for ty in range(rows):
            for tx in range(cols):
                img = make_rgb_tile(tw, th, seed=ty * 10 + tx,
                                    smooth=smooth)
                tiles[(tx, ty)] = img
                ctx.add_image_tile_to_tiled(tili_id, tx, ty, img)
        data = ctx.write()

        ctx2 = HeifContext.read_from_bytes(data)
        item_id = ctx2.primary_item_id
        tiling = ctx2.get_image_tiling(item_id)
        assert (tiling.num_columns, tiling.num_rows) == (cols, rows)
        assert (tiling.tile_width, tiling.tile_height) == (tw, th)
        assert (tiling.image_width, tiling.image_height) == (tw * cols,
                                                             th * rows)
        return ctx2, item_id, tiles

    def test_unci_tiles_bit_exact(self):
        ctx2, item_id, tiles = self._roundtrip("unci")
        for (tx, ty), src in tiles.items():
            out = ctx2.decode_tile(item_id, tx, ty,
                                   colorspace=Colorspace.RGB)
            for ch in (Channel.R, Channel.G, Channel.B):
                np.testing.assert_array_equal(
                    np.asarray(out.plane(ch)), np.asarray(src.plane(ch)),
                    err_msg=f"tile ({tx},{ty}) channel {ch}")

    def test_full_decode_rejected(self):
        ctx2, item_id, _ = self._roundtrip("unci", cols=2, rows=1)
        with pytest.raises(HeifError):
            ctx2.decode_image(item_id)

    def test_sparse_tile_not_available(self):
        ctx = HeifContext()
        tili_id = ctx.add_tiled_image(64, 64, 32, 32, fmt="unci")
        ctx.add_image_tile_to_tiled(tili_id, 0, 0, make_rgb_tile(32, 32, 1))
        # tiles (1,0), (0,1), (1,1) never written
        data = ctx.write()
        ctx2 = HeifContext.read_from_bytes(data)
        out = ctx2.decode_tile(ctx2.primary_item_id, 0, 0)
        assert out.width == 32
        with pytest.raises(HeifError):
            ctx2.decode_tile(ctx2.primary_item_id, 1, 1)

    def test_hevc_tiles_psnr(self):
        ctx2, item_id, tiles = self._roundtrip("hevc", tw=64, th=64,
                                               cols=2, rows=1, smooth=True)
        src = tiles[(1, 0)]
        out = ctx2.decode_tile(item_id, 1, 0, colorspace=Colorspace.RGB)
        a = np.stack([np.asarray(src.plane(c)).astype(np.float64)
                      for c in (Channel.R, Channel.G, Channel.B)])
        b = np.stack([np.asarray(out.plane(c)).astype(np.float64)
                      for c in (Channel.R, Channel.G, Channel.B)])
        mse = np.mean((a - b) ** 2)
        psnr = 10 * np.log10(255.0 ** 2 / max(mse, 1e-9))
        assert psnr > 25.0, f"PSNR {psnr:.1f} too low for random noise q-default"

    def test_offset_field_width_variants(self):
        for off_len, sz_len in ((32, 24), (40, 0), (64, 32)):
            if sz_len == 0:
                continue    # size==0 requires sequential scan; not stored
            ctx2, item_id, tiles = self._roundtrip(
                "unci", cols=2, rows=1,
                offset_field_length=off_len, size_field_length=sz_len)
            out = ctx2.decode_tile(item_id, 1, 0)
            np.testing.assert_array_equal(
                np.asarray(out.plane(Channel.R)),
                np.asarray(tiles[(1, 0)].plane(Channel.R)))
