"""AV1 device (TPU/jnp) reconstruction engine — bit-exactness tests.

The device engine (codecs/av1/device_recon.py) must match the host job
replay (tile.py run_jobs) bit-for-bit; the host replay is difftested
against libaom (test_av1_conformance).  Small streams keep the jit
compiles fast; the full matrix incl. example.avif runs under
LIBHEIF_TPU_FULL_SWEEP=1 (tests/test_full_sweeps.py).
"""

import os

import numpy as np
import pytest

from libheif_tpu.codecs.av1.decoder import decode_intra_frame
from libheif_tpu.codecs.av1.encoder import Av1IntraEncoder, Av1EncParams
from tests import av1_oracle


def _self_stream(w, h, seed):
    rng = np.random.default_rng(seed)
    y = rng.integers(0, 256, (h, w)).astype(np.uint8)
    u = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
    v = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
    return Av1IntraEncoder(w, h, Av1EncParams()).encode(y, u, v)


@pytest.mark.parametrize("w,h,seed", [(64, 64, 1), (96, 48, 2),
                                      (128, 64, 3)])
def test_device_matches_host_lossless(w, h, seed):
    stream = _self_stream(w, h, seed)
    host = decode_intra_frame(stream, engine="host")
    dev = decode_intra_frame(stream, engine="device")
    for k in host:
        np.testing.assert_array_equal(dev[k], host[k], err_msg=k)


@pytest.mark.parametrize("kind,q,extra", [
    ("grad", 15, {"use-intra-dct-only": "1"}),
    ("photo", 20, {}),                 # all tx types + directional modes
    ("noise", 25, {}),
])
def test_device_matches_host_aom(kind, q, extra):
    if not av1_oracle.available():
        pytest.skip("libaom not available")
    from tests import av1_lossy_difftest as L
    planes = L.make_planes(64, 64, 7, kind)
    opts = dict(L.BASE)
    opts.update(extra)
    opts["_min_q"] = opts["_max_q"] = str(q)
    obus = av1_oracle.encode(planes, opts, usage=0)
    assert obus is not None
    host = decode_intra_frame(obus, engine="host")
    dev = decode_intra_frame(obus, engine="device")
    for k in host:
        np.testing.assert_array_equal(dev[k], host[k],
                                      err_msg=f"{kind} {k}")


@pytest.mark.skipif(
    os.environ.get("LIBHEIF_TPU_FULL_SWEEP", "") in ("", "0"),
    reason="large jit compile; set LIBHEIF_TPU_FULL_SWEEP=1")
def test_device_example_avif():
    """Real libaom stream (CfL + palette + every tx family)."""
    path = "/root/reference/examples/example.avif"
    if not os.path.exists(path):
        pytest.skip("example.avif not available")
    from libheif_tpu.file import HeifFile
    from libheif_tpu.boxes.codec_cfg import Box_av1C
    hf = HeifFile.from_file(path)
    pid = hf.primary_item_id
    cfg = hf.get_property(pid, Box_av1C)
    stream = (cfg.config_obus or b"") + hf.get_item_data(pid)
    host = decode_intra_frame(stream, engine="host")
    dev = decode_intra_frame(stream, engine="device")
    for k in host:
        np.testing.assert_array_equal(dev[k], host[k], err_msg=k)
