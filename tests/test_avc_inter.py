"""AVC inter (P-slice) decode conformance + avc1 video-track muxing.

The decoder handles the constrained P toolset (P_Skip, P_L0_16x16,
multi-ref, intra MBs in P frames, inter deblocking) and must reproduce
libavcodec's decode of real x264 IPPP streams bit-exactly — the
reference gets this from its openh264 plugin for any avc1 track
(reference: libheif/plugins/decoder_openh264.cc,
sequences/track_visual.cc:175)."""

import numpy as np
import pytest

import avc_oracle
from libheif_tpu.codecs.avc import headers as H
from libheif_tpu.codecs.avc.decoder import AvcSequenceDecoder
from libheif_tpu.core.error import HeifError

pytestmark = pytest.mark.skipif(not avc_oracle.available(),
                                reason="libavcodec oracle not available")

BASE = "partitions=i4x4:me=dia:subme=1:trellis=0"


def _frames(seed, W, Hh, N, noise=6):
    rng = np.random.default_rng(seed)
    base = np.kron(rng.integers(0, 256, ((Hh + 48) // 8 + 1,
                                         (W + 48) // 8 + 1)),
                   np.ones((8, 8))).astype(np.int32)
    out = []
    for i in range(N):
        y = np.clip(base[3 * i:3 * i + Hh, 2 * i:2 * i + W] +
                    rng.integers(-noise, noise + 1, (Hh, W)),
                    0, 255).astype(np.uint8)
        u = np.clip(base[i:i + (Hh + 1) // 2, i:i + (W + 1) // 2] // 2 +
                    60, 0, 255).astype(np.uint8)
        v = np.clip(255 - base[i:i + (Hh + 1) // 2,
                               i:i + (W + 1) // 2] // 2,
                    0, 255).astype(np.uint8)
        out.append((y, u, v))
    return out


def _assert_stream_bitexact(stream):
    ref = avc_oracle.decode_seq(stream)
    assert ref is not None and len(ref) > 1
    ours = AvcSequenceDecoder().decode_stream(H.split_annexb(stream))
    assert len(ours) == len(ref)
    for k, (o, r) in enumerate(zip(ours, ref)):
        for pl in ("Y", "U", "V"):
            assert np.array_equal(o[pl], r[pl]), f"frame {k} plane {pl}"


@pytest.mark.parametrize("name,dims,n,qp,gop,extra", [
    ("nodeblock", (96, 64), 4, 28, 250, BASE + ":no-deblock=1"),
    ("deblock", (96, 64), 4, 28, 250, BASE),
    ("subme5", (96, 64), 5, 26, 250,
     "partitions=i4x4:me=hex:subme=5:trellis=0"),
    ("qp40", (96, 64), 4, 40, 250, BASE),
    ("gop2-idr-refresh", (96, 64), 6, 28, 2, BASE),
    ("cropped-dims", (100, 52), 4, 24, 250, BASE),
    ("two-refs", (96, 64), 5, 28, 250, BASE + ":ref=2"),
    ("p8x8-subparts", (96, 64), 5, 26, 250,
     "partitions=p8x8,i4x4:me=hex:subme=5:trellis=0"),
    ("p4x4-subparts", (96, 64), 5, 26, 250,
     "partitions=p8x8,p4x4,i4x4:me=hex:subme=6:trellis=0"),
    ("all-parts-umh", (96, 64), 6, 24, 250,
     "partitions=all:me=umh:subme=7:trellis=0"),
    ("x264-defaults", (112, 80), 6, 26, 250, ""),
    ("inter-tx8", (96, 64), 5, 26, 250,
     "partitions=p8x8,i4x4:8x8dct=1:me=hex:subme=5"),
])
def test_x264_ippp_bitexact(name, dims, n, qp, gop, extra):
    """x264-generated IPPP streams decode bit-exactly vs libavcodec."""
    W, Hh = dims
    frames = _frames(hash(name) % 1000, W, Hh, n)
    stream = avc_oracle.encode_seq(frames, qp=qp, gop=gop,
                                   extra_params=extra)
    assert stream is not None
    _assert_stream_bitexact(stream)


def test_randomized_p_sweep():
    """Randomized tool/qp/partition/ref sweep (the config that exposed
    the sub-partition ref_idx context bug is class-covered here)."""
    rng = np.random.default_rng(42)
    part_sets = ["partitions=i4x4", "partitions=p8x8,i4x4",
                 "partitions=all", ""]
    for trial in range(6):
        qp = int(rng.integers(18, 42))
        noise = int(rng.integers(2, 12))
        parts = part_sets[trial % len(part_sets)]
        refs = f"ref={1 + trial % 3}"
        tx8 = f"8x8dct={trial % 2}"
        extra = ":".join(x for x in
                         [parts, "me=dia:subme=2", refs, tx8,
                          "trellis=0"] if x)
        frames = _frames(500 + trial, 80, 48, 4, noise=noise)
        stream = avc_oracle.encode_seq(frames, qp=qp,
                                       extra_params=extra)
        assert stream is not None
        _assert_stream_bitexact(stream)


def test_weighted_pred_rejected():
    """Weighted prediction is rejected with a clean error (scope
    boundary, documented)."""
    frames = _frames(7, 96, 64, 4, noise=20)
    # fading content forces x264's weightp to engage
    fading = [(np.clip(y.astype(int) - 30 * i, 0, 255).astype(np.uint8),
               u, v) for i, (y, u, v) in enumerate(frames)]
    stream = avc_oracle.encode_seq(
        fading, qp=20, extra_params="weightp=2:partitions=i4x4:subme=5")
    assert stream is not None
    try:
        _assert_stream_bitexact(stream)
    except HeifError:
        pass  # expected when weighted tables actually appear


def test_avc1_track_mux_roundtrip(tmp_path):
    """Mux a real x264 IPPP stream into an avc1 track via the raw
    sample API, reload, and decode every frame bit-exactly vs the
    oracle's decode of the same stream (the reference decodes such
    tracks through its plugin; heif_track_add_raw_sequence_sample)."""
    from libheif_tpu.context import HeifContext
    from libheif_tpu.sequences.track import RawSequenceSample
    from libheif_tpu.boxes.codec_cfg import Box_avcC
    from libheif_tpu.image.pixel_image import Channel

    W, Hh, N = 96, 64, 5
    frames = _frames(11, W, Hh, N)
    stream = avc_oracle.encode_seq(frames, qp=26, extra_params=BASE)
    assert stream is not None
    ref = avc_oracle.decode_seq(stream)
    assert ref is not None and len(ref) == N

    nals = H.split_annexb(stream)
    cfg = Box_avcC()
    samples = []
    for nal in nals:
        t = H.nal_type(nal)
        if t == H.NAL_SPS:
            cfg.sps_list.append(nal)
            sps = H.parse_sps(nal)
            cfg.avc_profile = sps.profile_idc
            cfg.avc_level = sps.level_idc
        elif t == H.NAL_PPS:
            cfg.pps_list.append(nal)
        elif t in (H.NAL_SLICE_IDR, H.NAL_SLICE_NON_IDR):
            data = len(nal).to_bytes(4, "big") + nal
            samples.append(RawSequenceSample(
                data=data, duration=1,
                is_sync=(t == H.NAL_SLICE_IDR)))

    ctx = HeifContext()
    tw = ctx.add_visual_track(W, Hh, fmt="avc", timescale=30)
    tw.config_box = cfg
    for s in samples:
        tw.add_raw_sample(s)
    data = ctx.write()

    ctx2 = HeifContext.read_from_bytes(data)
    t = ctx2.tracks[0]
    assert len(t.samples) == N
    assert [s.is_sync for s in t.samples] == [True] + [False] * (N - 1)
    for i in range(N):
        img = t.decode_sample(i)
        assert np.array_equal(np.asarray(img.plane(Channel.Y)),
                              ref[i]["Y"]), f"frame {i}"
        assert np.array_equal(np.asarray(img.plane(Channel.Cb)),
                              ref[i]["U"])
    # random access back to an earlier frame (restart from the IDR)
    img2 = t.decode_sample(2)
    assert np.array_equal(np.asarray(img2.plane(Channel.Y)), ref[2]["Y"])


def test_own_ippp_encoder_three_way():
    """Our AVC IPPP encoder: streams decode bit-identically in
    libavcodec AND our own sequence decoder (the same three-way
    discipline as the HEVC inter encoder)."""
    from libheif_tpu.image.pixel_image import (PixelImage, Channel,
                                               Colorspace, Chroma)
    from libheif_tpu.codecs.avc.encoder import AvcSequenceEncodeSession

    rng = np.random.default_rng(4)
    W, Hh, N = 96, 64, 4
    base = np.kron(rng.integers(0, 256, ((Hh + 32) // 8, (W + 32) // 8)),
                   np.ones((8, 8))).astype(np.int32)

    def frame(i):
        img = PixelImage(W, Hh, Colorspace.YCbCr, Chroma.C420)
        img.set_plane(Channel.Y, np.clip(
            base[2 * i:2 * i + Hh, 3 * i:3 * i + W] +
            rng.integers(-4, 5, (Hh, W)), 0, 255).astype(np.uint8), 8)
        img.set_plane(Channel.Cb, np.clip(
            base[i:i + Hh // 2, i:i + W // 2] // 2 + 60,
            0, 255).astype(np.uint8), 8)
        img.set_plane(Channel.Cr,
                      np.full((Hh // 2, W // 2), 130, np.uint8), 8)
        return img

    frames = [frame(i) for i in range(N)]
    sess = AvcSequenceEncodeSession(W, Hh, qp=28)
    nals = []
    syncs = []
    for f in frames:
        data, _cfg, is_sync = sess.encode_frame(f)
        nals.append(data[4:])
        syncs.append(is_sync)
    assert syncs == [True] + [False] * (N - 1)
    annexb = b"".join(b"\x00\x00\x01" + n
                      for n in [sess.sps_nal, sess.pps_nal] + nals)
    ref = avc_oracle.decode_seq(annexb)
    assert ref is not None and len(ref) == N
    ours = AvcSequenceDecoder().decode_stream(
        [sess.sps_nal, sess.pps_nal] + nals)
    for k in range(N):
        for pl in ("Y", "U", "V"):
            assert np.array_equal(ours[k][pl], ref[k][pl]), (k, pl)
    # quality/compression sanity: P frames code the panning delta
    from libheif_tpu.image.pixel_image import Channel as Ch
    err = np.mean(np.abs(ours[2]["Y"].astype(int) -
                         np.asarray(frames[2].plane(Ch.Y)).astype(int)))
    assert err < 6


def test_avc_inter_track_roundtrip():
    """fmt='avc' track with inter_frames: IPPP samples through the
    container, decoded back in display order."""
    from libheif_tpu.context import HeifContext
    from libheif_tpu.sequences.track import TrackOptions
    from libheif_tpu.image.pixel_image import (PixelImage, Channel,
                                               Colorspace, Chroma)

    rng = np.random.default_rng(8)
    W = Hh = 64
    base = np.kron(rng.integers(0, 256, (12, 12)),
                   np.ones((8, 8))).astype(np.int32)

    def frame(i):
        img = PixelImage(W, Hh, Colorspace.YCbCr, Chroma.C420)
        img.set_plane(Channel.Y, np.clip(
            base[i:i + Hh, 2 * i:2 * i + W], 0, 255).astype(np.uint8), 8)
        img.set_plane(Channel.Cb,
                      np.full((32, 32), 100 + 8 * i, np.uint8), 8)
        img.set_plane(Channel.Cr, np.full((32, 32), 140, np.uint8), 8)
        return img

    frames = [frame(i) for i in range(4)]
    ctx = HeifContext()
    tw = ctx.add_visual_track(W, Hh, fmt="avc",
                              options=TrackOptions(timescale=30,
                                                   inter_frames=True))
    for f in frames:
        tw.add_frame(f, duration=1)
    ctx2 = HeifContext.read_from_bytes(ctx.write())
    t = ctx2.tracks[0]
    assert [s.is_sync for s in t.samples] == [True, False, False, False]
    for i in range(4):
        img = t.decode_sample(i)
        err = np.mean(np.abs(
            np.asarray(img.plane(Channel.Y)).astype(int) -
            np.asarray(frames[i].plane(Channel.Y)).astype(int)))
        assert err < 6, (i, err)
