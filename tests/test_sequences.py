"""Sequence (track) tests — moov/trak round-trip with HEVC samples
(ref behavior: libheif/sequences/*, heif_sequences.h)."""

import numpy as np

from libheif_tpu.context import HeifContext
from libheif_tpu.image.pixel_image import (PixelImage, Channel, Colorspace,
                                           Chroma)


def _frame(i, w=64, h=64):
    img = PixelImage(w, h, Colorspace.YCbCr, Chroma.C420)
    rng = np.random.default_rng(100 + i)
    base = rng.integers(0, 200, (h, w), np.uint8)
    y = (base + 10 * i).astype(np.uint8)
    img.set_plane(Channel.Y, y, 8)
    img.set_plane(Channel.Cb,
                  np.full((h // 2, w // 2), 90 + 20 * i, np.uint8), 8)
    img.set_plane(Channel.Cr,
                  np.full((h // 2, w // 2), 150 - 20 * i, np.uint8), 8)
    return img


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)


def test_visual_track_roundtrip():
    ctx = HeifContext()
    frames = [_frame(i) for i in range(3)]
    tw = ctx.add_visual_track(64, 64, fmt="hevc", timescale=30)
    for f in frames:
        tw.add_frame(f, duration=1)
    data = ctx.write()
    assert data == ctx.write()  # deterministic

    ctx2 = HeifContext.read_from_bytes(data)
    tracks = ctx2.tracks
    assert len(tracks) == 1
    t = tracks[0]
    assert t.handler == "pict" or t.handler == "vide"
    assert len(t.samples) == 3
    assert (t.width, t.height) == (64, 64)
    assert t.timescale == 30
    for i in range(3):
        img = t.decode_sample(i)
        y = img.plane(Channel.Y)
        assert _psnr(y, frames[i].plane(Channel.Y)) > 35
        cb = img.plane(Channel.Cb)
        assert abs(float(np.mean(cb)) - (90 + 20 * i)) < 4


def test_track_sequential_reader():
    ctx = HeifContext()
    tw = ctx.add_visual_track(32, 32, fmt="hevc", timescale=10)
    for i in range(2):
        tw.add_frame(_frame(i, 32, 32), duration=5)
    ctx2 = HeifContext.read_from_bytes(ctx.write())
    t = ctx2.tracks[0]
    imgs = []
    while True:
        img = t.decode_next_image()
        if img is None:
            break
        imgs.append(img)
    assert len(imgs) == 2
    assert t.sample_duration(0) == 5


def test_track_alongside_still_image():
    ctx = HeifContext()
    rng = np.random.default_rng(7)
    still = PixelImage(16, 16, Colorspace.YCbCr, Chroma.C444)
    for ch in (Channel.Y, Channel.Cb, Channel.Cr):
        still.set_plane(ch, rng.integers(0, 256, (16, 16), np.uint8), 8)
    iid = ctx.encode_image(still, fmt="unci")
    tw = ctx.add_visual_track(32, 32, fmt="hevc", timescale=10)
    tw.add_frame(_frame(0, 32, 32), duration=1)
    ctx2 = HeifContext.read_from_bytes(ctx.write())
    # still image intact
    out = ctx2.decode_image(ctx2.primary_item_id)
    assert np.array_equal(out.plane(Channel.Y), still.plane(Channel.Y))
    # track intact
    assert len(ctx2.tracks) == 1
    assert len(ctx2.tracks[0].samples) == 1


def test_tai_timestamps_and_gimi_roundtrip():
    """Per-sample TAI timestamps ('stai' aux info), GIMI sample content
    ids ('suid'), taic clock info, and the track-level GIMI content id
    (ref: track.cc:463-554, heif_tai_timestamps.h)."""
    from libheif_tpu.sequences.track import TrackOptions
    from libheif_tpu.boxes.meta import TaiClockInfo, TaiTimestampPacket

    ctx = HeifContext()
    opts = TrackOptions(
        timescale=30,
        with_tai_timestamps=1,
        tai_clock_info=TaiClockInfo(time_uncertainty=500,
                                    clock_resolution=1000,
                                    clock_drift_rate=-2, clock_type=2),
        with_gimi_content_ids=1,
        gimi_track_content_id="urn:uuid:track-level-id")
    tw = ctx.add_visual_track(64, 64, fmt="hevc", options=opts)
    base_ns = 2_145_916_800_000_000_000
    for i in range(3):
        tw.add_frame(_frame(i), duration=1,
                     tai=TaiTimestampPacket(tai_timestamp=base_ns + i,
                                            synchronization_state=True),
                     gimi_content_id=f"urn:uuid:sample-{i}")
    data = ctx.write()

    ctx2 = HeifContext.read_from_bytes(data)
    t = ctx2.tracks[0]
    assert t.sample_aux_info_types() == [("stai", 0), ("suid", 0)]
    for i in range(3):
        ts = t.sample_tai_timestamp(i)
        assert ts is not None and ts.tai_timestamp == base_ns + i
        assert ts.synchronization_state
        assert t.sample_gimi_content_id(i) == f"urn:uuid:sample-{i}"
    clock = t.tai_clock_info()
    assert clock is not None
    assert clock.time_uncertainty == 500
    assert clock.clock_resolution == 1000
    assert clock.clock_drift_rate == -2
    assert clock.clock_type == 2
    assert t.gimi_track_content_id() == "urn:uuid:track-level-id"
    # decoded frames carry the per-sample metadata
    img = t.decode_sample(1)
    assert img.tai_timestamp.tai_timestamp == base_ns + 1
    assert img.gimi_sample_content_id == "urn:uuid:sample-1"


def test_optional_tai_nonpresent_samples():
    from libheif_tpu.sequences.track import TrackOptions
    from libheif_tpu.boxes.meta import TaiTimestampPacket

    ctx = HeifContext()
    opts = TrackOptions(timescale=10, with_tai_timestamps=2)  # optional
    tw = ctx.add_visual_track(32, 32, fmt="hevc", options=opts)
    tw.add_frame(_frame(0, 32, 32), duration=1,
                 tai=TaiTimestampPacket(tai_timestamp=77))
    tw.add_frame(_frame(1, 32, 32), duration=1)   # no timestamp
    ctx2 = HeifContext.read_from_bytes(ctx.write())
    t = ctx2.tracks[0]
    assert t.sample_tai_timestamp(0).tai_timestamp == 77
    assert t.sample_tai_timestamp(1) is None


def test_uri_metadata_track():
    """(ref: heif_context_add_uri_metadata_sequence_track,
    Track_Metadata track_metadata.{h,cc})."""
    ctx = HeifContext()
    vt = ctx.add_visual_track(32, 32, fmt="hevc", timescale=10)
    vt.add_frame(_frame(0, 32, 32), duration=5)
    mt = ctx.add_uri_metadata_track("urn:test:telemetry", timescale=10)
    mt.add_metadata_sample(b"gps=1.5,2.5", duration=5)
    mt.add_reference_to_track("cdsc", vt.track_id)
    ctx2 = HeifContext.read_from_bytes(ctx.write())
    metas = [t for t in ctx2.tracks if t.handler == "meta"]
    assert len(metas) == 1
    mt2 = metas[0]
    assert mt2.uri() == "urn:test:telemetry"
    assert mt2.metadata_sample(0) == b"gps=1.5,2.5"
    assert mt2.references_of_type("cdsc") == [vt.track_id]
    # reverse lookup: which tracks refer to the visual track
    vis = [t for t in ctx2.tracks if t.handler != "meta"][0]
    referring = [t.track_id for t in ctx2.tracks
                 if vis.track_id in t.references_of_type("cdsc")]
    assert referring == [mt2.track_id]


def test_alpha_aux_track_merge():
    """Alpha carried in a separate aux track referenced via tref 'auxl'
    (ref: track_visual.cc:295)."""
    from libheif_tpu.sequences.track import AUX_TYPE_ALPHA_MPEGB

    ctx = HeifContext()
    vt = ctx.add_visual_track(64, 64, fmt="hevc", timescale=10)
    at = ctx.add_visual_track(64, 64, fmt="hevc", timescale=10,
                              handler="auxv",
                              aux_type_urn=AUX_TYPE_ALPHA_MPEGB)
    at.add_reference_to_track("auxl", vt.track_id)
    alpha_planes = []
    for i in range(2):
        vt.add_frame(_frame(i), duration=1)
        a = PixelImage(64, 64, Colorspace.Monochrome, Chroma.Monochrome)
        plane = np.full((64, 64), 30 + 100 * i, np.uint8)
        a.set_plane(Channel.Y, plane, 8)
        alpha_planes.append(plane)
        at.add_frame(a, duration=1)
    ctx2 = HeifContext.read_from_bytes(ctx.write())
    # only the master track is user-facing; aux is wired behind it
    masters = [t for t in ctx2.tracks
               if getattr(t, "alpha_track", None) is not None]
    assert len(masters) == 1
    t = masters[0]
    assert t.alpha_track.is_alpha_aux()
    img = t.decode_next_image()
    assert img.has_channel(Channel.Alpha)
    assert abs(float(np.mean(np.asarray(img.plane(Channel.Alpha)))) - 30) < 3


def test_sequence_repetitions_and_timescale():
    """Edit-list repeat mode → num_repetitions
    (ref: track.cc:1084-1134, heif_context_set_number_of_sequence_repetitions)."""
    ctx = HeifContext()
    ctx.set_sequence_timescale(30)
    ctx.set_number_of_sequence_repetitions(5)
    tw = ctx.add_visual_track(32, 32, fmt="hevc", timescale=30)
    for i in range(2):
        tw.add_frame(_frame(i, 32, 32), duration=3)
    data = ctx.write()
    ctx2 = HeifContext.read_from_bytes(data)
    assert ctx2.has_sequence()
    assert ctx2.sequence_timescale() == 30
    assert ctx2.sequence_duration() == 30  # 2 samples * 3 ticks * 5 reps
    t = ctx2.tracks[0]
    assert t.num_repetitions == 5


def test_raw_sequence_samples():
    """(ref: heif_track_get_next_raw_sequence_sample,
    heif_track_add_raw_sequence_sample)."""
    from libheif_tpu.sequences.track import RawSequenceSample

    ctx = HeifContext()
    tw = ctx.add_visual_track(32, 32, fmt="hevc", timescale=10)
    tw.add_frame(_frame(0, 32, 32), duration=4)
    ctx2 = HeifContext.read_from_bytes(ctx.write())
    t = ctx2.tracks[0]
    raw = t.get_next_raw_sample()
    assert raw is not None and raw.duration == 4 and len(raw.data) > 0
    assert t.get_next_raw_sample() is None
    # feed the raw sample into a new track unchanged
    ctx3 = HeifContext()
    tw3 = ctx3.add_visual_track(32, 32, fmt="hevc", timescale=10)
    tw3.config_box = t._config_box() if hasattr(t, "_config_box") else None
    tw3.add_raw_sample(RawSequenceSample(data=raw.data, duration=4))
    ctx4 = HeifContext.read_from_bytes(ctx3.write())
    assert ctx4.tracks[0].sample_data(0) == raw.data


def test_visual_track_inter_frames():
    """IPPP track: P samples reference the previous picture; only the
    IDR is a sync sample; random access restarts from the sync point
    (ref: track_visual.cc:175 + decoder.h:132-149 push/pull)."""
    from libheif_tpu.sequences.track import TrackOptions
    rng = np.random.default_rng(3)
    W = H = 64
    base = np.kron(rng.integers(0, 256, (24, 24)),
                   np.ones((8, 8))).astype(np.uint8)

    def frame(i):
        y = base[i:i + H, 2 * i:2 * i + W].copy()
        cb = base[i // 2:i // 2 + H // 2, i:i + W // 2].copy()
        cr = 255 - cb
        img = PixelImage(W, H, Colorspace.YCbCr, Chroma.C420)
        img.set_plane(Channel.Y, y, 8)
        img.set_plane(Channel.Cb, cb, 8)
        img.set_plane(Channel.Cr, cr, 8)
        return img

    frames = [frame(i) for i in range(5)]
    ctx = HeifContext()
    opts = TrackOptions(timescale=30, inter_frames=True)
    tw = ctx.add_visual_track(W, H, fmt="hevc", options=opts)
    for f in frames:
        tw.add_frame(f, duration=1)
    data = ctx.write()

    ctx2 = HeifContext.read_from_bytes(data)
    t = ctx2.tracks[0]
    assert [s.is_sync for s in t.samples] == [True] + [False] * 4
    for i in range(5):
        img = t.decode_sample(i)
        assert _psnr(img.plane(Channel.Y), frames[i].plane(Channel.Y)) > 33
    # random access backwards then forwards (session restart from sync)
    img3 = t.decode_sample(3)
    img1 = t.decode_sample(1)
    img4 = t.decode_sample(4)
    assert _psnr(img1.plane(Channel.Y), frames[1].plane(Channel.Y)) > 33
    assert _psnr(img4.plane(Channel.Y), frames[4].plane(Channel.Y)) > 33

    # inter coding must actually pay off vs all-intra
    ctx3 = HeifContext()
    tw3 = ctx3.add_visual_track(W, H, fmt="hevc", timescale=30)
    for f in frames:
        tw3.add_frame(f, duration=1)
    assert len(data) < len(ctx3.write()) * 0.7
