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


def test_oracle_1to4_filter_intra():
    """Fixed round 4: filter_intra_use default CDFs for the extended
    rectangular sizes (4X16/16X4/8X32/32X8, BLOCK_SIZES_ALL 16-19) were
    misplaced at indices 11-14, desyncing every 1:4-partition
    filter-intra stream."""
    _exact({"cpu-used": "3", "_min_q": "45", "_max_q": "45"}, (64, 44),
           "noise")


def test_oracle_1to4_filter_intra_minimal():
    """16x32 VERT_4 minimal repro of the filter_intra_use CDF layout."""
    _exact({"cpu-used": "3", "_min_q": "45", "_max_q": "45",
            "min-partition-size": "4", "enable-filter-intra": "1"},
           (16, 32), "noise", seed=1)


def test_oracle_odd_dims_photo():
    """Fixed round 4: spec 7.14.2 skips deblock edges at/beyond the
    visible frame boundary, so the 8px alignment padding stays
    unfiltered and CDEF taps read raw recon padding there."""
    _exact({"cpu-used": "3", "_min_q": "30", "_max_q": "30"}, (108, 76),
           "photo")


def test_oracle_uv_tx_1to4_shape():
    """Fixed round 4: chroma max tx is max_txsize_rect of the chroma
    plane block (4:1 shapes like TX_4X16 kept); a 2:1 aspect clamp
    desynced every 1:4-shaped chroma block (8x32 luma at 420)."""
    _exact({"cpu-used": "3", "_min_q": "45", "_max_q": "45"}, (88, 137),
           "noise", seed=33)


def test_oracle_luma_only_lr_uv_shift():
    """Fixed round 4: lr_uv_shift is only coded when a CHROMA plane
    uses restoration (spec 5.9.20 usesChromaLr)."""
    _exact({"cpu-used": "0", "_min_q": "30", "_max_q": "30",
            "min-partition-size": "4"}, (119, 38), "noise", seed=92)


def test_oracle_zero_base_lf_level_intra_delta():
    """Fixed round 4: aom's loop-filter init applies
    ref_deltas[INTRA_FRAME] with NO base==0 early-out, so lf=[0,14]
    streams still filter vertical edges at level 1."""
    _exact({"cpu-used": "0", "_min_q": "30", "_max_q": "30",
            "min-partition-size": "4", "enable-filter-intra": "1"},
           (81, 71), "photo", seed=57)
