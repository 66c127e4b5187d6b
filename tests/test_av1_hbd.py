"""AV1 high-bit-depth (10/12-bit) conformance vs libaom.

The reference decodes any depth dav1d/aom hand it
(/root/reference/libheif/plugins/decoder_dav1d.cc:353 frame.p.bpc,
decoder_aom.cc reads aom_image bit_depth); these tests pin the same
behavior: libaom-encoded 10/12-bit streams decode bit-exactly in BOTH
engines across the intra tool surface (CfL, palette, filter-intra,
intrabc, CDEF, loop restoration, tiles, sb128).
"""

from __future__ import annotations

import numpy as np
import pytest

from tests import av1_oracle
from libheif_tpu.codecs.av1.decoder import decode_intra_frame_ex

pytestmark = pytest.mark.skipif(not av1_oracle.available(),
                                reason="libaom missing")


def make_planes(w, h, seed, kind, bits):
    rng = np.random.default_rng(seed)
    maxp = 1 << bits
    cw, ch = (w + 1) // 2, (h + 1) // 2
    if kind == "photo":
        def p(hh, ww):
            base = rng.integers(0, maxp,
                                (max(1, hh // 16) + 1, max(1, ww // 16) + 1))
            rep = np.kron(base, np.ones((16, 16), np.int64))[:hh, :ww]
            return np.clip(rep + rng.integers(-maxp // 25, maxp // 25,
                                              (hh, ww)),
                           0, maxp - 1).astype(np.uint16)
    elif kind == "screen":
        def p(hh, ww):
            base = rng.integers(0, maxp,
                                (max(1, hh // 32) + 1, max(1, ww // 32) + 1))
            return np.kron(base,
                           np.ones((32, 32), np.int64))[:hh, :ww] \
                .astype(np.uint16)
    else:
        def p(hh, ww):
            return rng.integers(0, maxp, (hh, ww)).astype(np.uint16)
    return {"Y": p(h, w), "U": p(ch, cw), "V": p(ch, cw)}


def _exact(opts, size, kind, bits, seed=9, engines=("host", "native")):
    planes = make_planes(*size, seed, kind, bits)
    all_opts = {"cpu-used": opts.get("cpu-used", "6")}
    all_opts.update(opts)
    obus = av1_oracle.encode(planes, all_opts, usage=0, bit_depth=bits)
    assert obus is not None, "oracle encode failed"
    ref = av1_oracle.decode(obus)
    assert ref is not None
    _, seq = decode_intra_frame_ex(obus, engine="host")
    assert seq.bit_depth == bits
    for engine in engines:
        mine, _ = decode_intra_frame_ex(obus, engine=engine)
        for k in ref:
            a = np.asarray(ref[k], np.int64)
            b = np.asarray(mine[k], np.int64)
            assert np.array_equal(a, b), (
                f"{engine} {bits}-bit plane {k}: "
                f"{int((a != b).sum())} px differ (max "
                f"{int(np.abs(a - b).max())})")


CASES = [
    ("10bit-lossless", {"lossless": "1"}, (64, 64), "noise", 10),
    ("10bit-q30", {"_min_q": "30", "_max_q": "30"}, (128, 96), "photo", 10),
    ("10bit-cdef-lr", {"_min_q": "55", "_max_q": "55", "cpu-used": "0"},
     (192, 128), "photo", 10),
    ("10bit-sharp-q12", {"_min_q": "12", "_max_q": "12", "cpu-used": "3"},
     (96, 96), "noise", 10),
    ("10bit-sb128", {"_min_q": "30", "_max_q": "30", "sb-size": "128"},
     (256, 128), "photo", 10),
    ("10bit-fi-palette", {"_min_q": "45", "_max_q": "45", "cpu-used": "3",
                          "enable-filter-intra": "1", "enable-palette": "1",
                          "min-partition-size": "4"},
     (100, 60), "screen", 10),
    ("10bit-cfl-odd", {"_min_q": "30", "_max_q": "30", "cpu-used": "3"},
     (88, 137), "photo", 10),
    ("10bit-intrabc", {"_min_q": "40", "_max_q": "40", "cpu-used": "5",
                       "enable-intrabc": "1", "tune-content": "screen"},
     (128, 96), "screen", 10),
    ("10bit-tiles", {"_min_q": "55", "_max_q": "55", "tile-columns": "1",
                     "tile-rows": "1"}, (260, 133), "photo", 10),
    ("10bit-q0", {"_min_q": "0", "_max_q": "0", "cpu-used": "0"},
     (64, 64), "noise", 10),
    ("10bit-q63", {"_min_q": "63", "_max_q": "63", "cpu-used": "0"},
     (160, 96), "photo", 10),
    ("12bit-q30", {"_min_q": "30", "_max_q": "30", "cpu-used": "3"},
     (96, 64), "photo", 12),
    ("12bit-lossless", {"lossless": "1"}, (64, 64), "noise", 12),
    ("12bit-cdef-lr", {"_min_q": "55", "_max_q": "55", "cpu-used": "0"},
     (128, 96), "photo", 12),
]


@pytest.mark.parametrize("name,opts,size,kind,bits", CASES,
                         ids=[c[0] for c in CASES])
def test_hbd_case(name, opts, size, kind, bits):
    _exact(opts, size, kind, bits)


def test_hbd_randomized_sweep():
    """Randomized 10-bit config sweep (host engine; native covered by
    the fixed cases)."""
    rng = np.random.default_rng(123)
    for i in range(12):
        w = int(rng.integers(48, 200))
        h = int(rng.integers(48, 200))
        q = int(rng.integers(0, 64))
        cpu = int(rng.integers(0, 7))
        kind = ["photo", "noise", "screen"][i % 3]
        _exact({"_min_q": str(q), "_max_q": str(q), "cpu-used": str(cpu)},
               (w, h), kind, 10, seed=1000 + i, engines=("native",))


def test_ten_bit_avif_container_roundtrip():
    """10-bit AVIF through the container: decode keeps uint16 planes."""
    from libheif_tpu import api
    from libheif_tpu.image.pixel_image import Channel, Colorspace
    from libheif_tpu.boxes.codec_cfg import Box_av1C
    planes = make_planes(120, 90, 3, "photo", 10)
    obus = av1_oracle.encode(planes, {"cpu-used": "6", "_min_q": "20",
                                      "_max_q": "20"},
                             usage=0, bit_depth=10)
    assert obus is not None
    ctx = api.HeifContext()
    cfg = Box_av1C()
    item_id = ctx.add_compressed_image_item(
        "av01", obus, 120, 90, config_box=cfg) \
        if hasattr(ctx, "add_compressed_image_item") else None
    if item_id is None:
        # fall back: decode through the registry decoder directly
        from libheif_tpu.codecs.registry import get_decoder
        dec = get_decoder("av1")
        img = dec.decode_single_image(None, obus)
        assert img.bit_depth(Channel.Y) == 10
        assert img.plane(Channel.Y).dtype == np.uint16
        return
    img = ctx.decode_image(item_id, colorspace=Colorspace.YCbCr)
    assert img.bit_depth(Channel.Y) == 10
