"""Full oracle difftest sweeps, promoted into the suite behind an env
flag (VERDICT r1 item 10): the per-commit subset lives in
test_hevc_conformance / test_av1_conformance; set
LIBHEIF_TPU_FULL_SWEEP=1 to run EVERY config of every sweep here
(several minutes).  Each config encodes with this package's encoder,
decodes with (a) this package and (b) the system oracle
(libde265/libaom/libavcodec), and requires bit-exact planes.
"""

import os

import pytest

FULL = os.environ.get("LIBHEIF_TPU_FULL_SWEEP", "") not in ("", "0")

needs_flag = pytest.mark.skipif(
    not FULL, reason="set LIBHEIF_TPU_FULL_SWEEP=1 for the full sweeps")


def _hevc_configs():
    from tests.hevc_difftest import CONFIGS
    return CONFIGS


@needs_flag
@pytest.mark.parametrize("cfg", _hevc_configs(),
                         ids=[c[0] for c in _hevc_configs()])
def test_hevc_full_sweep(cfg):
    from tests import hevc_oracle
    if not hevc_oracle.available():
        pytest.skip("libde265 not available")
    from tests.hevc_difftest import run_config
    name, kw, size, smooth = cfg
    err = run_config(name, kw, size, smooth)
    assert err is None, err


def _av1_configs():
    from tests.av1_difftest import CONFIGS
    return CONFIGS


@needs_flag
@pytest.mark.parametrize("cfg", _av1_configs(),
                         ids=[c[0] for c in _av1_configs()])
def test_av1_full_sweep(cfg):
    from tests import av1_oracle
    if not av1_oracle.available():
        pytest.skip("libaom not available")
    from tests.av1_difftest import run_config
    name, size, kind, opts = cfg[:4]
    err = run_config(name, size, kind, opts)
    assert err is None, err


def _av1_lossy_configs():
    from tests.av1_lossy_difftest import CONFIGS
    return CONFIGS


@needs_flag
@pytest.mark.parametrize("cfg", _av1_lossy_configs(),
                         ids=[str(c[0]) for c in _av1_lossy_configs()])
def test_av1_lossy_full_sweep(cfg):
    import numpy as np
    from tests import av1_oracle
    if not av1_oracle.available():
        pytest.skip("libaom not available")
    from tests import av1_lossy_difftest as L
    from libheif_tpu.codecs.av1.decoder import decode_intra_frame
    name, (w, h), kind, q, extra = cfg
    planes = L.make_planes(w, h, 7, kind)
    opts = dict(L.BASE)
    opts.update(extra)
    opts["_min_q"] = opts["_max_q"] = str(q)
    obus = av1_oracle.encode(planes, opts, usage=0)
    assert obus is not None, "aom encode failed"
    ref = av1_oracle.decode(obus)
    assert ref is not None, "aom decode failed"
    if L.stream_uses_filters(obus):
        pytest.skip("in-loop filters active (covered by filter difftests)")
    mine = decode_intra_frame(obus)
    for pl in ("Y", "U", "V"):
        np.testing.assert_array_equal(mine[pl], ref[pl],
                                      err_msg=f"{name} {pl}")


@needs_flag
def test_hevc_device_full_sweep():
    """Device engine over the whole encoder matrix (vs python engine)."""
    import numpy as np
    from tests.hevc_difftest import make_image, CONFIGS
    from libheif_tpu.codecs.hevc.encoder import IntraEncoder, EncParams
    from libheif_tpu.codecs.hevc import headers as H
    from libheif_tpu.codecs.hevc.decoder import decode_intra_picture
    for name, kw, size, smooth in CONFIGS:
        w, h = size
        img = make_image(w, h, 7, smooth)
        enc = IntraEncoder(w, h, EncParams(**kw))
        slice_nal, cfg_nals = enc.encode(img)
        sps = H.parse_sps(cfg_nals[0])
        pps = H.parse_pps(cfg_nals[1])
        ref = decode_intra_picture(sps, pps, [slice_nal], engine="python")
        dev = decode_intra_picture(sps, pps, [slice_nal], engine="device")
        for pi, (a, b) in enumerate(zip(ref, dev)):
            assert np.array_equal(a, b), f"{name} plane {pi}"


# ---------------------------------------------------------------------------
# Per-run random samples (VERDICT r3 item 10): the default suite always
# runs ONE randomly chosen config from each gated sweep family, so sweep
# regressions surface between CI full-sweep runs.  The seed derives from
# the wall-clock hour — stable within a run, varying across runs.
# ---------------------------------------------------------------------------

def _sample_seed():
    import time
    return int(time.time()) // 3600


def _pick(configs):
    import random
    return configs[random.Random(_sample_seed()).randrange(len(configs))]


sampled = pytest.mark.skipif(
    FULL, reason="full sweep already runs every config")


@sampled
def test_hevc_sweep_sample():
    from tests import hevc_oracle
    if not hevc_oracle.available():
        pytest.skip("libde265 not available")
    from tests.hevc_difftest import run_config
    name, kw, size, smooth = _pick(_hevc_configs())
    err = run_config(name, kw, size, smooth)
    assert err is None, f"sampled config {name}: {err}"


@sampled
def test_av1_sweep_sample():
    from tests import av1_oracle
    if not av1_oracle.available():
        pytest.skip("libaom not available")
    from tests.av1_difftest import run_config
    cfg = _pick(_av1_configs())
    name, size, kind, opts = cfg[:4]
    err = run_config(name, size, kind, opts)
    assert err is None, f"sampled config {name}: {err}"


@sampled
def test_av1_lossy_sweep_sample():
    import numpy as np
    from tests import av1_oracle
    if not av1_oracle.available():
        pytest.skip("libaom not available")
    from tests import av1_lossy_difftest as L
    from libheif_tpu.codecs.av1.decoder import decode_intra_frame
    name, (w, h), kind, q, extra = _pick(_av1_lossy_configs())
    planes = L.make_planes(w, h, 7, kind)
    opts = dict(L.BASE)
    opts.update(extra)
    opts["_min_q"] = opts["_max_q"] = str(q)
    obus = av1_oracle.encode(planes, opts, usage=0)
    assert obus is not None, "aom encode failed"
    ref = av1_oracle.decode(obus)
    assert ref is not None, "aom decode failed"
    if L.stream_uses_filters(obus):
        pytest.skip("in-loop filters active (covered by filter difftests)")
    mine = decode_intra_frame(obus)
    for pl in ("Y", "U", "V"):
        np.testing.assert_array_equal(
            mine[pl], ref[pl], err_msg=f"sampled {name} {pl}")


@sampled
def test_hevc_device_sweep_sample():
    import numpy as np
    from tests.hevc_difftest import make_image, CONFIGS
    from libheif_tpu.codecs.hevc.encoder import IntraEncoder, EncParams
    from libheif_tpu.codecs.hevc import headers as H
    from libheif_tpu.codecs.hevc.decoder import decode_intra_picture
    name, kw, size, smooth = _pick(list(CONFIGS))
    w, h = size
    img = make_image(w, h, 7, smooth)
    enc = IntraEncoder(w, h, EncParams(**kw))
    slice_nal, cfg_nals = enc.encode(img)
    sps = H.parse_sps(cfg_nals[0])
    pps = H.parse_pps(cfg_nals[1])
    ref = decode_intra_picture(sps, pps, [slice_nal], engine="python")
    dev = decode_intra_picture(sps, pps, [slice_nal], engine="device")
    for pi, (a, b) in enumerate(zip(ref, dev)):
        assert np.array_equal(a, b), f"sampled {name} plane {pi}"
