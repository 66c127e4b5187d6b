"""Multi-host input plane (parallel/host_sharding.py): per-host
byte-range fetch from iloc offset tables + sharded device decode on the
virtual mesh must be bit-exact vs the ordinary context decode."""

import sys

import numpy as np
import pytest

sys.path.insert(0, "tools")

from libheif_tpu.parallel.host_sharding import (
    grid_tile_ranges, shard_tiles, HostShardReader,
    decode_grid_host_sharded)
from libheif_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def grid_file(tmp_path_factory):
    import heif_enc
    from libheif_tpu import io as hio
    d = tmp_path_factory.mktemp("hostshard")
    yy, xx = np.mgrid[0:192, 0:256]
    arr = np.dstack([(xx * 3) % 256, (yy * 5) % 256,
                     ((xx + yy) // 2) % 256]).astype(np.uint8)
    p = d / "in.png"
    p.write_bytes(hio.write_png(arr))
    out = str(d / "g.heic")
    assert heif_enc.main([str(p), "-o", out, "--cut-tiles", "64",
                          "-c", "hevc", "-q", "60"]) == 0
    return out


def test_tile_ranges_cover_coded_data(grid_file):
    from libheif_tpu.file import HeifFile
    hf = HeifFile.from_file(grid_file)
    ranges = grid_tile_ranges(hf, hf.primary_item_id)
    assert len(ranges) == 12
    raw = open(grid_file, "rb").read()
    for r in ranges:
        assert raw[r.offset:r.offset + r.size] == hf.get_item_data(
            r.item_id)


def test_shard_tiles_partition():
    shards = shard_tiles(12, 4)
    assert [len(s) for s in shards] == [3, 3, 3, 3]
    assert sorted(i for s in shards for i in s) == list(range(12))
    shards = shard_tiles(10, 4)
    assert sum(len(s) for s in shards) == 10


def test_reader_rejects_out_of_shard(grid_file):
    from libheif_tpu.file import HeifFile
    hf = HeifFile.from_file(grid_file)
    ranges = grid_tile_ranges(hf, hf.primary_item_id)
    reader = HostShardReader(grid_file, ranges[:3])
    reader.fetch_all()
    with pytest.raises(KeyError):
        reader.tile_bytes(5)


@pytest.mark.parametrize("n_hosts", [2, 4])
def test_host_sharded_decode_matches_context(grid_file, n_hosts):
    from libheif_tpu.api import HeifContext
    from libheif_tpu.codecs.hevc.decoder import crop_to_conformance
    from libheif_tpu.image.pixel_image import Channel
    mesh = make_mesh(n_hosts)
    planes, grid, sps = decode_grid_host_sharded(grid_file,
                                                 n_hosts=n_hosts,
                                                 mesh=mesh)
    ctx = HeifContext.read_from_file(grid_file)
    ref = ctx.decode_image(ctx.primary_item_id)
    tw, th = sps.cropped_size
    y_out = np.zeros((grid.output_height, grid.output_width), np.uint8)
    for idx, pl in enumerate(planes):
        ty, tx = divmod(idx, grid.columns)
        y, cb, cr = crop_to_conformance(sps, *pl)
        x0, y0 = tx * tw, ty * th
        w = min(tw, grid.output_width - x0)
        h = min(th, grid.output_height - y0)
        y_out[y0:y0 + h, x0:x0 + w] = y[:h, :w].astype(np.uint8)
    np.testing.assert_array_equal(y_out, ref.plane(Channel.Y))
