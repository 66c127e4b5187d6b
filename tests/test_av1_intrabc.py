"""AV1 intra block copy (intrabc) oracle conformance.

Screen-content keyframes encoded by libaom with intrabc enabled must
decode bit-exactly (reference boundary: libheif plugins
decoder_aom.cc / decoder_dav1d.cc).  Each case pins a fixed bug:

- dv prediction (setup_ref_mv_list scan order, REF_CAT_LEVEL
  weighting, av1_find_ref_dv fallback) and the empirically pinned
  default intrabc CDF
- var-tx tree reads + inter tx-type sets for intrabc residuals
- sub-8 chroma UV palette maps: the <4 dims extend by +2 rows/cols
  onscreen too (spec 5.11.50), not by replication
- tx-size context takes BLOCK dims from inter (intrabc) neighbors
  (aom get_tx_size_context), not their var-tx leaf dims
- skipped intrabc blocks reset the above/left level + dc-sign entropy
  contexts (aom av1_reset_entropy_context)
"""

from __future__ import annotations

import numpy as np
import pytest

from tests import av1_oracle
from libheif_tpu.codecs.av1.decoder import decode_intra_frame

pytestmark = pytest.mark.skipif(not av1_oracle.available(),
                                reason="libaom missing")


def _screen_planes(w, h, ts, seed, gray=False):
    """Tiled glyph content: self-similar, drives aom to pick intrabc."""
    rng = np.random.default_rng(seed)
    if gray:
        glyphs = rng.integers(0, 256, (8, ts, ts)).astype(np.uint8)
    else:
        glyphs = rng.integers(0, 2, (8, ts, ts)).astype(np.uint8) * 255
    rows = []
    for r in range(h // ts):
        rows.append(np.concatenate(
            [glyphs[rng.integers(0, 8)] for _ in range(w // ts)], axis=1))
    y = np.concatenate(rows, axis=0)
    if gray:
        u = np.full((h // 2, w // 2), 128, np.uint8)
        v = u
    else:
        uu = (y[::2, ::2] // 2 + 64)[:h // 2, :w // 2]
        u = uu.astype(np.uint8)
        v = (255 - uu).astype(np.uint8)
    return {"Y": y, "U": u, "V": v}


def _exact(w, h, ts, seed, q, cpu, gray):
    planes = _screen_planes(w, h, ts, seed, gray)
    obus = av1_oracle.encode(
        planes, {"tune-content": "screen", "_min_q": q, "_max_q": q,
                 "cpu-used": cpu}, usage=0)
    assert obus is not None, "oracle encode failed"
    ref = av1_oracle.decode(obus)
    assert ref is not None
    for engine in ("host", "native"):
        mine = decode_intra_frame(obus, engine=engine)
        for k in ref:
            assert np.array_equal(mine[k], ref[k]), (
                f"{engine} plane {k}: "
                f"{int((mine[k] != ref[k]).sum())} px differ")


CASES = [
    # core paths: skip blocks, residual var-tx, dv prediction
    ("base-192", 192, 192, 16, 3, "40", "1", False),
    # derived-chroma texture: sub-8 UV palette map dims (16x4 blocks)
    ("uv-palette-sub8", 192, 192, 16, 1, "40", "1", False),
    # gray glyphs, q40: tx-size ctx with intrabc neighbors +
    # entropy-context reset on skipped intrabc blocks
    ("gray-nonsquare", 256, 192, 16, 5, "40", "1", True),
    # gray glyphs, heavy residual (q20) at cpu-used 0
    ("gray-dense-q20", 256, 256, 16, 7, "20", "0", True),
    # lossless: chroma TUs pinned to TX_4X4 (WHT), MV_BORDER clamp
    ("lossless", 128, 256, 8, 97, "0", "6", True),
]


@pytest.mark.parametrize("name,w,h,ts,seed,q,cpu,gray", CASES,
                         ids=[c[0] for c in CASES])
def test_intrabc_oracle(name, w, h, ts, seed, q, cpu, gray):
    _exact(w, h, ts, seed, q, cpu, gray)
