"""HEVC inter (P-slice) conformance: IPPP sequences from the package's
own SequenceEncoder, decoded by both libde265 and this package's
SequenceDecoder, compared bit-for-bit.

Covers: skip / merge / AMVP coding, quarter-pel luma + eighth-pel
chroma MC, inter deblocking boundary strengths, varied CTB/CU sizes
and QPs.  (Reference boundary: libheif/codecs/decoder.h:132-149
sequence push/pull through libde265,
sequences/track_visual.cc:175.)
"""

from __future__ import annotations

import numpy as np
import pytest

from tests import hevc_oracle
from libheif_tpu.codecs.hevc.inter_enc import SequenceEncoder
from libheif_tpu.codecs.hevc.encoder import EncParams
from libheif_tpu.codecs.hevc.decoder import SequenceDecoder
from libheif_tpu.codecs.hevc.headers import nal_type
from libheif_tpu.image.pixel_image import (PixelImage, Channel,
                                           Colorspace, Chroma)

pytestmark = pytest.mark.skipif(not hevc_oracle.available(),
                                reason="libde265 missing")


def _run_case(W, H, qp, deblock, moves, noise, kind="photo", seed=5,
              search=3, frac=True, ctb_log2=5, cu_log2=4, tmvp=False,
              gop="ipp"):
    rng = np.random.default_rng(seed)
    if kind == "photo":
        canvas = rng.integers(0, 64, ((H * 3) // 8,
                                      (W * 3) // 8)).astype(np.float64)
        canvas = np.kron(canvas, np.ones((8, 8)))
        canvas = (canvas + np.arange(canvas.shape[1])[None, :] * 0.5) % 256
        base = canvas.astype(np.uint8)
    else:
        base = rng.integers(0, 256, (H * 3, W * 3)).astype(np.uint8)

    def make_frame(dx, dy, nz):
        y = base[dy:dy + H, dx:dx + W].copy()
        if nz:
            y = np.clip(y.astype(int) +
                        rng.integers(-nz, nz + 1, y.shape),
                        0, 255).astype(np.uint8)
        cb = base[dy // 2:dy // 2 + H // 2, dx // 2:dx // 2 + W // 2].copy()
        cr = base[dy // 2 + 7:dy // 2 + 7 + H // 2,
                  dx // 2 + 3:dx // 2 + 3 + W // 2].copy()
        img = PixelImage(W, H, Colorspace.YCbCr, Chroma.C420)
        img.set_plane(Channel.Y, y, 8)
        img.set_plane(Channel.Cb, cb, 8)
        img.set_plane(Channel.Cr, cr, 8)
        return img

    p = EncParams(qp=qp, deblock=deblock, ctb_log2=ctb_log2,
                  cu_log2=cu_log2, temporal_mvp=tmvp)
    enc = SequenceEncoder(W, H, p, search=search, frac=frac,
                          gop_struct=gop)
    nals = []
    if gop == "ipp":
        for i, (dx, dy) in enumerate(moves):
            nal, cfg = enc.encode_frame(make_frame(dx, dy,
                                                   noise if i else 0))
            if i == 0:
                nals.extend(cfg)
            nals.append(nal)
    else:
        samples = []
        for i, (dx, dy) in enumerate(moves):
            samples += enc.push_frame(make_frame(dx, dy,
                                                 noise if i else 0))
        if hasattr(enc, "flush"):
            samples += enc.flush()
        nals = list(enc.config_nals) + [s.data for s in samples]
    frames = hevc_oracle.decode_nals_seq(nals)
    assert frames is not None and len(frames) == len(moves)
    dec = SequenceDecoder(enc.sps, enc.pps)
    n = 0
    for nal in nals:
        if nal_type(nal) in (32, 33, 34):
            continue
        poc, planes = dec.decode_nal(nal)
        ref = frames[n]
        n += 1
        for k, nm in enumerate(("Y", "Cb", "Cr")):
            a = np.asarray(planes[k])
            b = np.asarray(ref[nm])
            assert np.array_equal(a, b), (
                f"poc {poc} plane {nm}: "
                f"{int((a != b).sum())} px differ vs libde265")


CASES = [
    ("static-skip", dict(W=64, H=64, qp=30, deblock=False,
                         moves=[(0, 0)] * 4, noise=0)),
    ("pan-deblock", dict(W=96, H=64, qp=30, deblock=True,
                         moves=[(0, 0), (3, 1), (6, 2), (9, 3)], noise=2)),
    ("pan-qp22", dict(W=64, H=96, qp=22, deblock=True,
                      moves=[(0, 0), (1, 0), (2, 1)], noise=4)),
    ("noise-qp38", dict(W=64, H=64, qp=38, deblock=True,
                        moves=[(0, 0), (2, 2), (4, 4)], noise=8,
                        kind="noise")),
    ("bigmotion", dict(W=128, H=64, qp=30, deblock=True,
                       moves=[(0, 0), (16, 7), (33, 15)], noise=3,
                       search=8)),
    ("ctb16-cu8", dict(W=64, H=64, qp=30, deblock=True,
                       moves=[(0, 0), (2, 1), (4, 3)], noise=3,
                       ctb_log2=4, cu_log2=3)),
    ("ctb32-cu32", dict(W=64, H=64, qp=33, deblock=True,
                        moves=[(0, 0), (5, 2)], noise=3, cu_log2=5)),
    ("intpel-only", dict(W=96, H=96, qp=28, deblock=True,
                         moves=[(0, 0), (3, 2), (6, 4)], noise=2,
                         frac=False)),
    ("long-gop", dict(W=64, H=64, qp=32, deblock=True,
                      moves=[(0, 0), (1, 1), (2, 1), (3, 2), (4, 2),
                             (5, 3), (6, 3), (7, 4)], noise=2)),
    # temporal MV prediction (spec 8.5.3.2.8; x265-class encoders
    # enable TMVP by default — ref: decoder_libde265.cc full support)
    ("tmvp-pan", dict(W=96, H=64, qp=30, deblock=True,
                      moves=[(0, 0), (3, 1), (6, 2), (9, 3)], noise=2,
                      tmvp=True)),
    ("tmvp-long", dict(W=64, H=64, qp=32, deblock=True,
                       moves=[(0, 0), (1, 1), (2, 1), (3, 2), (4, 2),
                              (5, 3), (6, 3), (7, 4)], noise=2,
                       tmvp=True)),
    ("tmvp-noise", dict(W=64, H=64, qp=38, deblock=True,
                        moves=[(0, 0), (2, 2), (4, 4)], noise=8,
                        kind="noise", tmvp=True)),
    ("tmvp-ldb", dict(W=64, H=64, qp=30, deblock=True,
                      moves=[(0, 0), (2, 1), (4, 2), (6, 3)], noise=2,
                      tmvp=True, gop="ldb")),
    ("tmvp-ibp", dict(W=96, H=64, qp=30, deblock=True,
                      moves=[(0, 0), (2, 1), (4, 2), (6, 3), (8, 4)],
                      noise=2, tmvp=True, gop="ibp")),
    ("tmvp-bpyr", dict(W=64, H=64, qp=30, deblock=True,
                       moves=[(0, 0), (1, 1), (3, 2), (5, 3), (7, 4),
                              (9, 5), (11, 6), (13, 7), (15, 8)],
                       noise=2, tmvp=True, gop="bpyr")),
]


@pytest.mark.parametrize("name,kw", CASES, ids=[c[0] for c in CASES])
def test_inter_sequence_oracle(name, kw):
    _run_case(**kw)


def test_inter_seed_sweep():
    """Randomized content/motion sweep at a fixed config."""
    rng = np.random.default_rng(11)
    for seed in range(4):
        moves = [(0, 0)]
        x = y = 0
        for _ in range(3):
            x += int(rng.integers(0, 7))
            y += int(rng.integers(0, 5))
            moves.append((x, y))
        _run_case(W=64, H=64, qp=int(rng.integers(24, 40)), deblock=True,
                  moves=moves, noise=int(rng.integers(0, 6)), seed=seed,
                  kind="noise" if seed % 2 else "photo",
                  tmvp=bool(seed % 2),
                  gop=["ipp", "ldb", "ibp", "bpyr"][seed % 4])


def test_multi_reference_p_bitexact():
    """2-reference P frames: RPS with two negative pics, num_ref_idx
    override, ref_idx_l0 truncated-unary coding and per-ref AMVP POC
    scaling — bit-exact vs libde265.  Alternating content makes the
    encoder genuinely pick ref 1 for most CUs."""
    import numpy as np
    from libheif_tpu.image.pixel_image import (PixelImage, Channel,
                                               Colorspace, Chroma)
    from libheif_tpu.codecs.hevc.encoder import EncParams
    from libheif_tpu.codecs.hevc.inter_enc import SequenceEncoder
    from libheif_tpu.codecs.hevc.decoder import SequenceDecoder
    from libheif_tpu.codecs.hevc import headers as H
    import hevc_oracle
    import pytest
    if not hevc_oracle.available():
        pytest.skip("libde265 not available")

    rng = np.random.default_rng(77)
    W, Hh, N = 96, 64, 6
    base = rng.integers(0, 256, (Hh + 48, W + 48), np.int32)

    def frame(i):
        img = PixelImage(W, Hh, Colorspace.YCbCr, Chroma.C420)
        shift = (i % 2) * 8 + i
        img.set_plane(Channel.Y, np.clip(
            base[shift:shift + Hh, shift:shift + W] +
            rng.integers(-4, 5, (Hh, W)), 0, 255).astype(np.uint8), 8)
        img.set_plane(Channel.Cb, np.clip(
            base[i:i + Hh // 2, i:i + W // 2] // 2 + 50,
            0, 255).astype(np.uint8), 8)
        img.set_plane(Channel.Cr,
                      np.full((Hh // 2, W // 2), 135, np.uint8), 8)
        return img

    enc = SequenceEncoder(W, Hh, EncParams(qp=30, deblock=True),
                          gop_struct="ipp", n_refs=2)
    samples = []
    for i in range(N):
        samples += enc.push_frame(frame(i))
    nals = list(enc.config_nals) + [s.data for s in samples]
    ref = hevc_oracle.decode_nals_seq(nals)
    assert ref is not None and len(ref) == N
    sps = pps = None
    for nal in enc.config_nals:
        t = H.nal_type(nal)
        if t == 33:
            sps = H.parse_sps(nal)
        elif t == 34:
            pps = H.parse_pps(nal)
    dec = SequenceDecoder(sps, pps)
    for k, s in enumerate(samples):
        _poc, planes = dec.decode_nal(s.data)
        for name, pl in zip(("Y", "Cb", "Cr"), planes):
            assert np.array_equal(pl.astype(np.uint8), ref[k][name]), \
                (k, name)
