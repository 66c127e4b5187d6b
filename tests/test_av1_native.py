"""Difftests for the native C++ AV1 engine (native/src/av1_native.cc).

The pure-Python TileDecoder (codecs/av1/tile.py) is the conformance
anchor (itself difftested bit-exactly against libaom in
test_av1_conformance.py / av1_difftest.py).  Here every stream is
decoded by BOTH engines and the planes must match exactly — including
streams that exercise CDEF, loop restoration, palette, CfL,
filter-intra, all transform sets, 128-superblocks, and multi-tile
layouts (reference boundary: libheif/plugins/decoder_dav1d.cc,
decoder_aom.cc — the work the reference outsources).
"""

from __future__ import annotations

import numpy as np
import pytest

from tests import av1_oracle
from libheif_tpu.codecs.av1.decoder import (decode_intra_frame, parse_obus,
                                            _build_tile_decoder,
                                            finish_frame)
from libheif_tpu.codecs.av1.native_decode import (decode_frame_native,
                                                 native_available)

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native library unavailable")


def _both(obus: bytes):
    seq, fh, tiles = parse_obus(obus)
    nat = decode_frame_native(seq, fh, tiles)
    assert nat is not None, "native engine rejected a supported stream"
    seq, fh, dec = _build_tile_decoder(seq, fh, tiles)
    dec.run_jobs()
    host = finish_frame(seq, fh, dec)
    assert set(host) == set(nat)
    for k in host:
        assert np.array_equal(host[k], nat[k]), (
            f"plane {k}: {int((host[k] != nat[k]).sum())} px differ, "
            f"max {int(np.abs(host[k].astype(int) - nat[k].astype(int)).max())}")
    return nat


def _planes(w, h, seed, kind):
    from tests.av1_lossy_difftest import make_planes
    return make_planes(w, h, seed, kind)


BASE = {"cpu-used": "6"}

# every row widens the feature surface; all in-loop filters stay ON
# unless disabled explicitly
MATRIX = [
    ("lossless-noise", (64, 64), "noise", {"lossless": "1"}),
    ("lossless-sb128", (128, 128), "blockyish", {"lossless": "1",
                                                 "sb-size": "128"}),
    ("q20-photo-filters", (128, 128), "photo", {"_min_q": "20",
                                                "_max_q": "20"}),
    ("q45-photo", (128, 128), "photo", {"_min_q": "45", "_max_q": "45"}),
    ("q25-noise-odd", (100, 52), "noise", {"_min_q": "25",
                                           "_max_q": "25"}),
    ("q20-grad-tx64", (128, 128), "grad", {"_min_q": "20", "_max_q": "20",
                                           "enable-tx64": "1"}),
    ("q20-photo-sb128", (128, 128), "photo", {"_min_q": "20",
                                              "_max_q": "20",
                                              "sb-size": "128"}),
    ("q30-screen-palette", (64, 64), "blockyish",
     {"_min_q": "30", "_max_q": "30", "tune-content": "screen",
      "enable-palette": "1"}),
    ("q20-filter-intra", (64, 64), "photo",
     {"_min_q": "20", "_max_q": "20", "enable-filter-intra": "1"}),
    ("q20-cfl", (64, 64), "photo",
     {"_min_q": "20", "_max_q": "20", "enable-cfl-intra": "1"}),
    ("q20-tiles", (256, 128), "photo",
     {"_min_q": "20", "_max_q": "20", "tile-columns": "1",
      "tile-rows": "1"}),
    ("q20-reduced-tx", (64, 64), "photo",
     {"_min_q": "20", "_max_q": "20", "reduced-tx-type-set": "1"}),
]


def _make(kind, w, h, seed=7):
    if kind == "blockyish":
        rng = np.random.default_rng(seed)
        cw, ch = (w + 1) // 2, (h + 1) // 2

        def p(hh, ww):
            b = rng.integers(0, 256, ((hh + 15) // 16, (ww + 15) // 16))
            return np.kron(b, np.ones((16, 16), np.int64))[:hh, :ww] \
                .astype(np.uint8)
        return {"Y": p(h, w), "U": p(ch, cw), "V": p(ch, cw)}
    return _planes(w, h, seed, kind)


@pytest.mark.skipif(not av1_oracle.available(), reason="libaom missing")
@pytest.mark.parametrize("name,size,kind,opts",
                         MATRIX, ids=[m[0] for m in MATRIX])
def test_native_matches_host_aom_streams(name, size, kind, opts):
    w, h = size
    planes = _make(kind, w, h)
    all_opts = dict(BASE)
    all_opts.update(opts)
    obus = av1_oracle.encode(planes, all_opts, usage=0)
    assert obus is not None
    _both(obus)


def test_native_matches_host_own_encoder():
    """Oracle-free difftest on this package's own encoder output."""
    from libheif_tpu.codecs.av1.encoder import Av1IntraEncoder, Av1EncParams
    rng = np.random.default_rng(11)
    w, h = 96, 64
    Y = rng.integers(0, 256, (h, w), np.uint8)
    U = rng.integers(0, 256, (h // 2, w // 2), np.uint8)
    V = rng.integers(0, 256, (h // 2, w // 2), np.uint8)
    for q in (0, 40):
        params = Av1EncParams() if q == 0 else Av1EncParams(base_q_idx=q)
        stream = Av1IntraEncoder(w, h, params).encode(Y, U, V)
        _both(stream)


def test_native_example_avif():
    """End-to-end: example.avif through the native engine equals the
    Python engine (both bit-exact vs libaom, test_av1_conformance)."""
    import os
    path = "/root/reference/examples/example.avif"
    if not os.path.exists(path):
        pytest.skip("example.avif unavailable")
    from libheif_tpu.context import HeifContext
    ctx = HeifContext.read_from_file(path)
    item = ctx.items[ctx.primary_item_id]
    stream = (item.config_box().config_obus or b"") + item.coded_data()
    _both(stream)


def test_native_is_default_engine():
    """engine=None routes through the native engine when available."""
    from libheif_tpu.codecs.av1.encoder import Av1IntraEncoder, Av1EncParams
    rng = np.random.default_rng(3)
    w, h = 64, 64
    Y = rng.integers(0, 256, (h, w), np.uint8)
    U = rng.integers(0, 256, (h // 2, w // 2), np.uint8)
    V = rng.integers(0, 256, (h // 2, w // 2), np.uint8)
    stream = Av1IntraEncoder(w, h, Av1EncParams()).encode(Y, U, V)
    auto = decode_intra_frame(stream)
    nat = decode_intra_frame(stream, engine="native")
    for k in auto:
        assert np.array_equal(auto[k], nat[k])
