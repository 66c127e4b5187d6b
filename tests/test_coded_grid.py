"""Batched + mesh-sharded HEVC grid decode (parallel/coded_grid.py).

The TPU analog of the reference's threaded grid decode
(reference: libheif/image-items/grid.cc:285-453): all tiles reconstruct
in one device program, optionally sharded over the virtual 8-device
mesh.  Must be bit-exact vs the serial per-tile loop.
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, "tools")

from libheif_tpu.items.item import DecodingOptions
from libheif_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def hevc_grid(tmp_path_factory):
    import heif_enc
    from libheif_tpu import io as hio
    d = tmp_path_factory.mktemp("codedgrid")
    yy, xx = np.mgrid[0:192, 0:256]
    arr = np.dstack([(xx * 3) % 256, (yy * 5) % 256,
                     ((xx + yy) // 2) % 256]).astype(np.uint8)
    p = d / "in.png"
    p.write_bytes(hio.write_png(arr))
    out = str(d / "g.heic")
    rc = heif_enc.main([str(p), "-o", out, "--cut-tiles", "64",
                        "-c", "hevc", "-q", "60"])
    assert rc == 0
    return out


def _decode(path, options=None):
    from libheif_tpu.api import HeifContext
    ctx = HeifContext.read_from_file(path)
    return ctx.decode_image(ctx.primary_item_id, options=options)


def test_grid_is_grid(hevc_grid):
    from libheif_tpu.api import HeifContext
    ctx = HeifContext.read_from_file(hevc_grid)
    assert ctx.get_image_info(ctx.primary_item_id)["type"] == "grid"


def test_batched_matches_serial(hevc_grid):
    serial = _decode(hevc_grid)
    batched = _decode(hevc_grid,
                      DecodingOptions(prefer_device_grid=True))
    for ch in serial.planes:
        np.testing.assert_array_equal(batched.planes[ch],
                                      serial.planes[ch], err_msg=str(ch))


@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_sharded_matches_serial(hevc_grid, n_dev):
    """shard_map over the mesh, incl. tile counts not divisible by the
    device count (12 tiles over 8 devices pads to 16)."""
    serial = _decode(hevc_grid)
    sharded = _decode(hevc_grid, DecodingOptions(
        prefer_device_grid=True, mesh=make_mesh(n_dev)))
    for ch in serial.planes:
        np.testing.assert_array_equal(sharded.planes[ch],
                                      serial.planes[ch],
                                      err_msg=f"{n_dev}dev {ch}")


def test_env_var_engages_fast_path(hevc_grid, monkeypatch):
    monkeypatch.setenv("LIBHEIF_TPU_HEVC_ENGINE", "device")
    serial = _decode(hevc_grid)
    monkeypatch.delenv("LIBHEIF_TPU_HEVC_ENGINE")
    ref = _decode(hevc_grid)
    for ch in ref.planes:
        np.testing.assert_array_equal(serial.planes[ch], ref.planes[ch])


def test_parse_tiles_threaded(hevc_grid):
    """Thread-pool entropy decode returns the same syntax as serial."""
    from libheif_tpu.api import HeifContext
    from libheif_tpu.parallel.coded_grid import parse_tiles, parse_tile
    ctx = HeifContext.read_from_file(hevc_grid)
    pid = ctx.primary_item_id
    item = ctx.get_item(pid)
    tiles = [ctx.get_item(t) for t in item.tile_item_ids()]
    pairs = [(t.config_box(), t.coded_data()) for t in tiles]
    pooled = parse_tiles(pairs)
    single = [parse_tile(c, d) for c, d in pairs]
    assert len(pooled) == len(single)
    for (s1, syn1, raw1), (s2, syn2, raw2) in zip(pooled, single):
        assert (s1.pic_width, s1.pic_height) == (s2.pic_width, s2.pic_height)
        if raw1 is not None and raw2 is not None:
            np.testing.assert_array_equal(raw1[0], raw2[0])
            np.testing.assert_array_equal(raw1[1], raw2[1])


@pytest.fixture(scope="module")
def av1_grid(tmp_path_factory):
    import heif_enc
    from libheif_tpu import io as hio
    d = tmp_path_factory.mktemp("av1grid")
    yy, xx = np.mgrid[0:128, 0:192]
    arr = np.dstack([(xx * 3) % 256, (yy * 5) % 256,
                     ((xx + yy) // 2) % 256]).astype(np.uint8)
    p = d / "in.png"
    p.write_bytes(hio.write_png(arr))
    out = str(d / "g.avif")
    rc = heif_enc.main([str(p), "-o", out, "--cut-tiles", "64",
                        "-c", "av1"])
    assert rc == 0
    return out


def test_av1_batched_matches_serial(av1_grid):
    """All-av01 grid through the AV1 device engine as one program."""
    serial = _decode(av1_grid)
    batched = _decode(av1_grid, DecodingOptions(prefer_device_grid=True))
    for ch in serial.planes:
        np.testing.assert_array_equal(batched.planes[ch],
                                      serial.planes[ch], err_msg=str(ch))


def test_threaded_default_matches_single_thread(hevc_grid):
    """The default grid path fans tile decodes over a thread pool
    (items/derived.py); must be bit-exact vs 1-thread decode and
    deterministic across repeats (race test)."""
    single = _decode(hevc_grid, DecodingOptions(max_decoding_threads=1))
    for _ in range(3):
        multi = _decode(hevc_grid, DecodingOptions(max_decoding_threads=4))
        for ch in single.planes:
            np.testing.assert_array_equal(multi.planes[ch],
                                          single.planes[ch],
                                          err_msg=str(ch))


def test_auto_device_heuristic_cpu_stays_host(hevc_grid, monkeypatch):
    """On a CPU backend the heuristic must NOT engage the device grid
    path (the host engines win there)."""
    from libheif_tpu.items import derived
    assert derived._auto_device_grid(1024) is False  # cpu backend
    monkeypatch.setenv("LIBHEIF_TPU_AUTO_DEVICE_GRID", "1")
    assert derived._auto_device_grid(4) is True
    monkeypatch.setenv("LIBHEIF_TPU_AUTO_DEVICE_GRID", "0")
    assert derived._auto_device_grid(1024) is False
