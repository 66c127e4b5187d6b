"""HEVC B-frame tests: low-delay B (GPB) and reordered IBP streams
bit-exact vs libde265, output reordering, and B tracks with ctts
(ref behavior: libheif/sequences/track_visual.cc:175 decode order →
output order via the plugin DPB; decoder.h:132-149 push/pull)."""

import numpy as np
import pytest

from libheif_tpu.context import HeifContext
from libheif_tpu.image.pixel_image import (PixelImage, Channel, Colorspace,
                                           Chroma)
from libheif_tpu.codecs.hevc.encoder import EncParams
from libheif_tpu.codecs.hevc.inter_enc import SequenceEncoder
from libheif_tpu.codecs.hevc.decoder import SequenceDecoder
from libheif_tpu.codecs.hevc import headers as H

import hevc_oracle


def _frames(seed, w, h, n, noise=0):
    """Panning + optional noise content (forces MC with residual)."""
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (h + 4 * n, w + 4 * n), np.int32)
    out = []
    for i in range(n):
        img = PixelImage(w, h, Colorspace.YCbCr, Chroma.C420)
        y = base[3 * i:3 * i + h, 2 * i:2 * i + w]
        if noise:
            y = y + rng.integers(-noise, noise + 1, y.shape)
        img.set_plane(Channel.Y, np.clip(y, 0, 255).astype(np.uint8), 8)
        img.set_plane(Channel.Cb,
                      np.clip(base[i:i + h // 2, i:i + w // 2] // 2 + 60,
                              0, 255).astype(np.uint8), 8)
        img.set_plane(Channel.Cr,
                      np.full((h // 2, w // 2), 128 + 5 * i, np.uint8), 8)
        out.append(img)
    return out


def _encode(frames, gop_struct, qp=30, deblock=True):
    w, h = frames[0].width, frames[0].height
    enc = SequenceEncoder(w, h, EncParams(qp=qp, deblock=deblock),
                          gop_struct=gop_struct)
    samples = []
    for f in frames:
        samples += enc.push_frame(f)
    samples += enc.flush()
    return enc, samples


def _parse_cfg(enc):
    sps = pps = None
    for nal in enc.config_nals:
        t = H.nal_type(nal)
        if t == 33:
            sps = H.parse_sps(nal)
        elif t == 34:
            pps = H.parse_pps(nal)
    return sps, pps


def _decode_ours(enc, samples):
    """Decode-order (poc, planes) list via the package decoder."""
    sps, pps = _parse_cfg(enc)
    dec = SequenceDecoder(sps, pps)
    return [dec.decode_nal(s.data) for s in samples]


def _assert_bitexact(enc, samples):
    """Both decoders, frame-for-frame in decode order."""
    if not hevc_oracle.available():
        pytest.skip("libde265 not available")
    ours = _decode_ours(enc, samples)
    nals = list(enc.config_nals) + [s.data for s in samples]
    ref = hevc_oracle.decode_nals_seq(nals)
    assert ref is not None and len(ref) == len(ours)
    for k, ((_poc, planes), rf) in enumerate(zip(ours, ref)):
        for name, pl in zip(("Y", "Cb", "Cr"), planes):
            assert np.array_equal(pl.astype(np.uint8), rf[name]), \
                f"frame {k} plane {name} mismatch"


@pytest.mark.parametrize("deblock", [True, False])
def test_lowdelay_b_bitexact(deblock):
    """GPB (low-delay B): every non-IDR frame is a B slice with both
    lists holding the previous picture — exercises inter_pred_idc,
    uni-L1 and bi-prediction, B merge lists, B CABAC init."""
    frames = _frames(11, 96, 64, 5, noise=6)
    enc, samples = _encode(frames, "ldb", deblock=deblock)
    assert len(samples) == 5
    assert [s.is_sync for s in samples] == [True] + [False] * 4
    assert all(s.cts_offset == 0 for s in samples)
    _assert_bitexact(enc, samples)


@pytest.mark.parametrize("qp", [22, 34])
def test_ibp_reordered_bitexact(qp):
    """IBP: decode order I0 P2 B1 P4 B3 with the B frames referencing
    past AND future pictures (TRAIL_N non-ref), POCs out of decode
    order — exercises RPS num_positive, L1 future refs, bi-prediction
    across anchors, combined-bi merge candidates."""
    frames = _frames(23, 96, 64, 6, noise=4)
    enc, samples = _encode(frames, "ibp", qp=qp)
    assert len(samples) == 6
    assert [s.is_sync for s in samples] == [True] + [False] * 5
    # I, P+1, B-1, P+1, B-1, trailing P
    assert [s.cts_offset for s in samples] == [0, 1, -1, 1, -1, 0]
    ours = _decode_ours(enc, samples)
    assert [poc for poc, _ in ours] == [0, 2, 1, 4, 3, 5]
    _assert_bitexact(enc, samples)


def test_ibp_session_output_reorder():
    """The sequence session re-emits frames in POC (display) order with
    one frame of latency, as the reference pulls them from the plugin
    (track_visual.cc:175)."""
    from libheif_tpu.codecs.hevc.decoder import HevcSequenceSession
    from libheif_tpu.boxes.codec_cfg import hvcC_from_sps, parse_hevc_sps

    frames = _frames(5, 64, 64, 5)
    enc, samples = _encode(frames, "ibp")
    cfg = hvcC_from_sps(parse_hevc_sps(enc.config_nals[0]))
    for n in enc.config_nals:
        cfg.add_nal(n)
    session = HevcSequenceSession(cfg)
    outs = []
    for s in samples:
        session.push_sample(len(s.data).to_bytes(4, "big") + s.data)
        while True:
            img = session.pull()
            if img is None:
                break
            outs.append(img)
    session.flush()
    while True:
        img = session.pull()
        if img is None:
            break
        outs.append(img)
    assert len(outs) == 5
    # display order: each output frame must match the source ordering
    for i, (img, src) in enumerate(zip(outs, frames)):
        err = np.mean(np.abs(
            img.plane(Channel.Y).astype(int) -
            src.plane(Channel.Y).astype(int)))
        assert err < 12, f"frame {i} out of order (mean err {err})"


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)


def test_track_roundtrip_ibp_ctts():
    """Full container round-trip of a B-frame track: ctts box with
    signed (v1) composition offsets, sync table, display-order
    decode_sample, random access restart."""
    from libheif_tpu.sequences.track import TrackOptions

    W = Hh = 64
    frames = _frames(31, W, Hh, 6, noise=3)
    ctx = HeifContext()
    opts = TrackOptions(timescale=30, inter_frames="ibp")
    tw = ctx.add_visual_track(W, Hh, fmt="hevc", options=opts)
    for f in frames:
        tw.add_frame(f, duration=1)
    data = ctx.write()

    ctx2 = HeifContext.read_from_bytes(data)
    t = ctx2.tracks[0]
    assert len(t.samples) == 6
    assert [s.is_sync for s in t.samples] == [True] + [False] * 5
    # pts must be a permutation restoring display order
    pts = [s.pts for s in t.samples]
    assert sorted(pts) == list(range(6))
    assert pts == [0, 2, 1, 4, 3, 5]
    # sequential decode returns frames in display order
    for i in range(6):
        img = t.decode_sample(i)
        assert _psnr(img.plane(Channel.Y),
                     frames[i].plane(Channel.Y)) > 31, f"frame {i}"
    # random access: backwards seek restarts from the sync sample
    img2 = t.decode_sample(2)
    assert _psnr(img2.plane(Channel.Y), frames[2].plane(Channel.Y)) > 31


def test_ldb_track_roundtrip():
    """Low-delay B track: no ctts (zero offsets), decode order ==
    display order."""
    from libheif_tpu.sequences.track import TrackOptions

    W = Hh = 64
    frames = _frames(37, W, Hh, 4)
    ctx = HeifContext()
    opts = TrackOptions(timescale=30, inter_frames="ldb")
    tw = ctx.add_visual_track(W, Hh, fmt="hevc", options=opts)
    for f in frames:
        tw.add_frame(f, duration=1)
    ctx2 = HeifContext.read_from_bytes(ctx.write())
    t = ctx2.tracks[0]
    assert len(t.samples) == 4
    assert [s.pts for s in t.samples] == list(range(4))
    for i in range(4):
        img = t.decode_sample(i)
        assert _psnr(img.plane(Channel.Y),
                     frames[i].plane(Channel.Y)) > 31


def test_randomized_bframe_sweep():
    """Randomized content/qp sweep over both GOP structures, bit-exact
    vs libde265 (the B analog of the round-4 P-frame matrix)."""
    if not hevc_oracle.available():
        pytest.skip("libde265 not available")
    rng = np.random.default_rng(77)
    for trial in range(6):
        gop = ("ldb", "ibp", "bpyr")[trial % 3]
        qp = int(rng.integers(20, 40))
        noise = int(rng.integers(0, 9))
        n = 4 + trial % 3 + (3 if gop == "bpyr" else 0)
        frames = _frames(100 + trial, 64, 64, n, noise=noise)
        enc, samples = _encode(frames, gop, qp=qp)
        _assert_bitexact(enc, samples)


def test_bpyr_hierarchical_bitexact():
    """Hierarchical B pyramid (GOP 4, reorder depth 2): the mid-B is a
    TRAIL_R reference for the outer droppable Bs, RPS entries retain
    unreferenced-but-needed pictures (used=0), and both full GOPs plus
    the trailing flush decode bit-exactly vs libde265."""
    frames = _frames(19, 96, 64, 9, noise=5)
    enc, samples = _encode(frames, "bpyr")
    assert len(samples) == 9
    assert [s.cts_offset for s in samples] == \
        [0, 3, 0, -2, -1, 3, 0, -2, -1]
    ours = _decode_ours(enc, samples)
    assert [poc for poc, _ in ours] == [0, 4, 2, 1, 3, 8, 6, 5, 7]
    _assert_bitexact(enc, samples)


def test_bpyr_track_roundtrip():
    """bpyr track: deeper ctts offsets, display-order decode."""
    from libheif_tpu.sequences.track import TrackOptions

    W = Hh = 64
    frames = _frames(41, W, Hh, 6, noise=3)
    ctx = HeifContext()
    tw = ctx.add_visual_track(W, Hh, fmt="hevc",
                              options=TrackOptions(timescale=30,
                                                   inter_frames="bpyr"))
    for f in frames:
        tw.add_frame(f, duration=1)
    ctx2 = HeifContext.read_from_bytes(ctx.write())
    t = ctx2.tracks[0]
    assert len(t.samples) == 6
    pts = [s.pts for s in t.samples]
    assert sorted(pts) == list(range(6))
    for i in range(6):
        img = t.decode_sample(i)
        assert _psnr(img.plane(Channel.Y),
                     frames[i].plane(Channel.Y)) > 31, f"frame {i}"
