"""Streaming reader protocol tests (ref: heif_reader v2
heif_context.h:164-231, FileLayout::read file_layout.cc:38).

The key property: opening a file through a reader fetches only the
structural boxes, and decoding one tile requests only that tile's
byte ranges — never the whole mdat.
"""

import numpy as np
import pytest

from libheif_tpu import api
from libheif_tpu.io.reader import (FileReader, GrowStatus, MemoryReader,
                                   CallbackReader, StreamReader)
from libheif_tpu.image.pixel_image import (PixelImage, Channel, Colorspace,
                                           Chroma)


class RangeTrackingReader(StreamReader):
    """MemoryReader that records every requested/read range."""

    def __init__(self, data):
        self._data = data
        self.requested = []
        self.read_ranges = []

    def file_size(self):
        return len(self._data)

    def request_range(self, start, end):
        self.requested.append((start, end))
        return GrowStatus.SIZE_REACHED if end <= len(self._data) \
            else GrowStatus.SIZE_BEYOND_EOF

    def read(self, start, size):
        self.read_ranges.append((start, start + size))
        return self._data[start:start + size]

    def bytes_fetched(self):
        return sum(e - s for s, e in self.read_ranges)


def _rgb_image(w, h, seed=5):
    rng = np.random.default_rng(seed)
    img = PixelImage(w, h, Colorspace.RGB, Chroma.C444)
    for ch in (Channel.R, Channel.G, Channel.B):
        img.set_plane(ch, rng.integers(0, 256, (h, w), np.uint8), 8)
    return img


def _tiled_unci_file(w=256, h=256, tiles=4):
    ctx = api.heif_context_alloc()
    from libheif_tpu.option_types import EncodingOptions
    opts = EncodingOptions(tile_cols=tiles, tile_rows=tiles)
    ctx.encode_image(_rgb_image(w, h), "unci", opts)
    return ctx.write()


def test_reader_open_fetches_only_structural_boxes():
    data = _tiled_unci_file()
    tr = RangeTrackingReader(data)
    ctx = api.HeifContext.read_from_reader(tr)
    assert ctx.primary_item_id
    # mdat payload must not have been fetched during open
    assert tr.bytes_fetched() < len(data) // 4, \
        f"open fetched {tr.bytes_fetched()} of {len(data)} bytes"


def test_single_tile_decode_requests_partial_ranges():
    data = _tiled_unci_file(256, 256, 4)   # 16 tiles of 64x64
    tr = RangeTrackingReader(data)
    ctx = api.HeifContext.read_from_reader(tr)
    opened = tr.bytes_fetched()
    img = ctx.decode_tile(ctx.primary_item_id, 1, 2)
    assert (img.width, img.height) == (64, 64)
    tile_bytes = tr.bytes_fetched() - opened
    mdat_size = 256 * 256 * 3
    # a single tile is 1/16 of the pixel data; allow 2x slack
    assert tile_bytes < mdat_size / 8, \
        f"tile decode fetched {tile_bytes} bytes of {mdat_size} mdat"
    # pixels match the full-decode result
    full = api.HeifContext.read_from_bytes(data)
    ref = full.decode_image(full.primary_item_id)
    np.testing.assert_array_equal(
        np.asarray(img.plane(Channel.R)),
        np.asarray(ref.plane(Channel.R))[128:192, 64:128])


def test_full_decode_through_reader_matches_buffer_decode():
    data = _tiled_unci_file(128, 128, 2)
    ctx_r = api.HeifContext.read_from_reader(MemoryReader(data))
    ctx_b = api.HeifContext.read_from_bytes(data)
    a = ctx_r.decode_image(ctx_r.primary_item_id)
    b = ctx_b.decode_image(ctx_b.primary_item_id)
    for ch in (Channel.R, Channel.G, Channel.B):
        np.testing.assert_array_equal(np.asarray(a.plane(ch)),
                                      np.asarray(b.plane(ch)))


def test_file_reader_and_callback_reader(tmp_path):
    data = _tiled_unci_file(64, 64, 1)
    p = tmp_path / "t.heif"
    p.write_bytes(data)

    ctx = api.HeifContext.read_from_reader(FileReader(str(p)))
    img = ctx.decode_image(ctx.primary_item_id)
    assert (img.width, img.height) == (64, 64)

    calls = []
    cb = CallbackReader(
        read=lambda start, size: data[start:start + size],
        file_size=lambda: len(data),
        request_range=lambda s, e: (
            calls.append((s, e)),
            GrowStatus.SIZE_REACHED if e <= len(data)
            else GrowStatus.SIZE_BEYOND_EOF)[1])
    ctx2 = api.HeifContext.read_from_reader(cb)
    img2 = ctx2.decode_image(ctx2.primary_item_id)
    assert calls and (img2.width, img2.height) == (64, 64)


def test_reader_truncated_and_growing_files():
    data = _tiled_unci_file(64, 64, 1)
    # truncated mid-mdat: open succeeds (structural boxes first),
    # decode raises cleanly
    tr = RangeTrackingReader(data[: len(data) - 400])
    with pytest.raises(Exception):
        ctx = api.HeifContext.read_from_reader(tr)
        ctx.decode_image(ctx.primary_item_id)

    # growing file: wait_for_file_size reports TIMEOUT-free growth
    class GrowingReader(MemoryReader):
        def __init__(self, full, visible):
            super().__init__(full)
            self.visible = visible

        def file_size(self):
            return self.visible

        def request_range(self, start, end):
            if end <= self.visible:
                return GrowStatus.SIZE_REACHED
            return GrowStatus.SIZE_BEYOND_EOF

    gr = GrowingReader(data, visible=len(data))
    ctx = api.HeifContext.read_from_reader(gr)
    assert ctx.decode_image(ctx.primary_item_id).width == 64
