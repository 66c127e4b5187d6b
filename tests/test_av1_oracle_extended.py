"""Extended AV1 oracle conformance: the feature surface the round-3
bug hunt exposed (reference boundary: libheif plugins decoder_aom.cc /
decoder_dav1d.cc).

Every case here decodes an aom-encoded stream with BOTH engines and
requires bit-exact planes vs libaom.  Each row pins a specific fixed
bug:

- sb128 multi-superblock streams (partition-context bit 5)
- lossless 4x4 / CfL / filter-intra (chroma filt-type neighbors,
  cfl_sign + filter_intra_mode default CDFs, CfL rounded average)
- filter-intra tx-type mapping (fimode_to_intradir)
- chroma-primary-only CDEF direction (dav1d y_pri||uv_pri rule)
- Wiener/sgrproj loop restoration (inverse_recenter parity, sgr xq
  complement, box-filter pass-1 normalization, stripe-shifted units)
"""

from __future__ import annotations

import numpy as np
import pytest

from tests import av1_oracle
from tests.av1_lossy_difftest import make_planes
from libheif_tpu.codecs.av1.decoder import decode_intra_frame

pytestmark = pytest.mark.skipif(not av1_oracle.available(),
                                reason="libaom missing")


def _exact(opts, size, kind, seed=5, engines=("host", "native")):
    planes = make_planes(*size, seed, kind)
    obus = av1_oracle.encode(planes, opts, usage=0)
    assert obus is not None, "oracle encode failed"
    ref = av1_oracle.decode(obus)
    assert ref is not None
    for engine in engines:
        mine = decode_intra_frame(obus, engine=engine)
        for k in ref:
            assert np.array_equal(mine[k], ref[k]), (
                f"{engine} plane {k}: "
                f"{int((mine[k] != ref[k]).sum())} px differ")


CASES = [
    ("sb128-512x256", {"_min_q": "30", "_max_q": "30", "sb-size": "128"},
     (512, 256), "photo"),
    ("sb128-512x533", {"_min_q": "30", "_max_q": "30", "sb-size": "128"},
     (512, 533), "photo"),
    ("sb128-tiles", {"_min_q": "55", "_max_q": "55", "sb-size": "128",
                     "tile-columns": "2", "tile-rows": "2"},
     (800, 533), "photo"),
    ("lossless-defaults", {"lossless": "1"}, (260, 64), "noise"),
    ("lossless-4x4", {"lossless": "1", "min-partition-size": "4",
                      "enable-filter-intra": "0", "enable-intrabc": "0",
                      "enable-palette": "0", "enable-cfl-intra": "0"},
     (128, 64), "noise"),
    ("lossless-cfl", {"lossless": "1", "enable-cfl-intra": "1",
                      "enable-filter-intra": "0", "enable-intrabc": "0",
                      "enable-palette": "0", "min-partition-size": "8"},
     (260, 64), "noise"),
    ("lossless-filter-intra", {"lossless": "1", "enable-filter-intra": "1",
                               "enable-intrabc": "0", "enable-palette": "0",
                               "enable-cfl-intra": "0",
                               "min-partition-size": "8"},
     (260, 64), "noise"),
    ("cpu3-full-tools", {"cpu-used": "3", "_min_q": "20", "_max_q": "20",
                         "sb-size": "64", "tile-columns": "2",
                         "tile-rows": "2"}, (800, 533), "noise"),
    ("lr-wiener-multiunit", {"cpu-used": "0", "_min_q": "30",
                             "_max_q": "30"}, (512, 512), "photo"),
    ("lr-sgrproj", {"cpu-used": "0", "_min_q": "45", "_max_q": "45"},
     (512, 512), "photo"),
    ("lr-wiener-128", {"cpu-used": "3", "_min_q": "12", "_max_q": "12",
                       "sb-size": "64", "enable-cdef": "0"},
     (128, 128), "photo"),
]


@pytest.mark.parametrize("name,opts,size,kind", CASES,
                         ids=[c[0] for c in CASES])
def test_oracle_extended(name, opts, size, kind):
    base = {"cpu-used": opts.get("cpu-used", "6")}
    base.update(opts)
    _exact(base, size, kind)


@pytest.mark.xfail(strict=False, reason="open conformance gap: streams "
                   "combining filter-intra with 1:4 partitions (16x4/4x16 "
                   "blocks) still desync vs libaom; see ROADMAP")
def test_oracle_1to4_filter_intra_open():
    _exact({"cpu-used": "3", "_min_q": "45", "_max_q": "45"}, (64, 44),
           "noise")


@pytest.mark.xfail(strict=False, reason="open conformance gap: rare 1-px "
                   "residuals on some photo streams at odd dims")
def test_oracle_odd_dims_photo_open():
    _exact({"cpu-used": "3", "_min_q": "30", "_max_q": "30"}, (108, 76),
           "photo")
