"""Differential conformance sweep for the HEVC intra encoder/decoder.

For each parameter configuration: encode a random YCbCr image, decode
the stream with (a) this package's decoder and (b) libde265 via the
direct-NAL oracle (tests/hevc_oracle.py), and require all three planes
to match bit-exactly.  Usage:

    python tests/hevc_difftest.py            # full sweep
    python tests/hevc_difftest.py nxn        # only configs whose name contains 'nxn'
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")
from libheif_tpu.codecs.hevc.encoder import IntraEncoder, EncParams
from libheif_tpu.codecs.hevc import headers as H
from libheif_tpu.codecs.hevc.decoder import decode_intra_picture
from libheif_tpu.image.pixel_image import PixelImage, Channel, Colorspace, Chroma
from tests import hevc_oracle


def make_image(w, h, seed, smooth=False, bit_depth=8):
    rng = np.random.default_rng(seed)
    img = PixelImage(w, h, Colorspace.YCbCr, Chroma.C420)
    maxp = 1 << bit_depth
    dt = np.uint8 if bit_depth <= 8 else np.uint16
    if smooth:
        # low-frequency content exercises cbf=0 / DC-only paths
        def plane(hh, ww):
            base = rng.integers(0, maxp, (max(1, hh // 8), max(1, ww // 8)))
            rep = np.kron(base, np.ones((8, 8), np.int64))[:hh, :ww]
            return rep.astype(dt)
    else:
        def plane(hh, ww):
            return rng.integers(0, maxp, (hh, ww)).astype(dt)
    img.set_plane(Channel.Y, plane(h, w), bit_depth)
    img.set_plane(Channel.Cb, plane((h + 1) // 2, (w + 1) // 2), bit_depth)
    img.set_plane(Channel.Cr, plane((h + 1) // 2, (w + 1) // 2), bit_depth)
    return img


CONFIGS = [
    ("dc-qp30", dict(qp=30, mode="dc"), (64, 64), False),
    ("auto-qp26", dict(qp=26), (64, 64), False),
    ("auto-qp12", dict(qp=12), (96, 64), False),
    ("auto-qp40-smooth", dict(qp=40), (64, 64), True),
    ("planar-qp20", dict(qp=20, mode="planar"), (64, 64), False),
    ("ang10", dict(qp=24, mode=10), (64, 64), False),
    ("ang26", dict(qp=24, mode=26), (64, 64), False),
    ("cu8", dict(qp=26, cu_log2=3), (64, 64), False),
    ("signhide", dict(qp=26, sign_hiding=True), (64, 64), False),
    ("signhide-qp35", dict(qp=35, sign_hiding=True), (96, 96), False),
    ("dqp", dict(qp=26, cu_qp_delta=True), (64, 64), False),
    ("dqp-signhide", dict(qp=30, cu_qp_delta=True, sign_hiding=True),
     (64, 64), False),
    ("nxn", dict(qp=26, cu_log2=3, nxn=True), (64, 64), False),
    ("nxn-qp35", dict(qp=35, cu_log2=3, nxn=True), (64, 64), False),
    ("nxn-smooth", dict(qp=32, cu_log2=3, nxn=True), (64, 64), True),
    ("nxn-dqp-sh", dict(qp=28, cu_log2=3, nxn=True, cu_qp_delta=True,
                        sign_hiding=True), (96, 64), False),
    ("big-ctb-auto", dict(qp=26, ctb_log2=5, cu_log2=5), (128, 128), False),
    # features used by x265 streams (example.heic)
    ("strongsmooth", dict(qp=32, ctb_log2=5, cu_log2=5,
                          strong_smoothing=True), (96, 96), True),
    ("rqt1", dict(qp=26, cu_log2=4, rqt_depth=1), (64, 64), False),
    ("rqt1-cu32", dict(qp=30, cu_log2=5, rqt_depth=1), (96, 64), False),
    ("ctb64", dict(qp=26, ctb_log2=6, cu_log2=6), (128, 128), False),
    ("ctb64-smooth", dict(qp=35, ctb_log2=6, cu_log2=6,
                          strong_smoothing=True), (128, 128), True),
    ("deblock", dict(qp=30, deblock=True), (64, 64), False),
    ("deblock-smooth", dict(qp=37, deblock=True), (96, 96), True),
    ("sao", dict(qp=30, sao=True), (96, 96), False),
    ("sao-smooth", dict(qp=37, sao=True), (128, 96), True),
    ("wpp", dict(qp=26, wpp=True), (96, 96), False),
    ("wpp-ctb64", dict(qp=30, ctb_log2=6, cu_log2=5, wpp=True),
     (192, 192), False),
    ("dqp-qg32", dict(qp=28, ctb_log2=6, cu_log2=4, cu_qp_delta=True,
                      diff_qg_depth=1), (128, 128), False),
    ("x265like", dict(qp=24, ctb_log2=6, cu_log2=4, rqt_depth=1,
                      strong_smoothing=True, sign_hiding=True,
                      cu_qp_delta=True, diff_qg_depth=1, deblock=True,
                      sao=True, wpp=True), (192, 128), False),
    ("x265like-smooth", dict(qp=35, ctb_log2=6, cu_log2=5, rqt_depth=1,
                             strong_smoothing=True, sign_hiding=True,
                             cu_qp_delta=True, diff_qg_depth=1,
                             deblock=True, sao=True, wpp=True),
     (192, 128), True),
    ("chromamodes", dict(qp=26, chroma_modes=True), (96, 96), False),
    ("varcu", dict(qp=26, ctb_log2=6, cu_log2=6, var_cu=True),
     (128, 128), False),
    ("varcu-ctb32", dict(qp=30, ctb_log2=5, cu_log2=5, var_cu=True,
                         nxn=True), (128, 96), False),
    ("x265full", dict(qp=24, ctb_log2=6, cu_log2=6, var_cu=True, nxn=True,
                      rqt_depth=1, strong_smoothing=True, sign_hiding=True,
                      cu_qp_delta=True, diff_qg_depth=1, deblock=True,
                      sao=True, wpp=True, chroma_modes=True),
     (192, 192), False),
    ("x265full-smooth", dict(qp=35, ctb_log2=6, cu_log2=6, var_cu=True,
                             nxn=True, rqt_depth=1, strong_smoothing=True,
                             sign_hiding=True, cu_qp_delta=True,
                             diff_qg_depth=1, deblock=True, sao=True,
                             wpp=True, chroma_modes=True), (192, 128), True),
    # multi-CU QGs + smooth content → deltas coded mid-QG; big |delta|
    ("dqp-big", dict(qp=32, ctb_log2=6, cu_log2=4, cu_qp_delta=True,
                     diff_qg_depth=1,
                     qp_delta_pattern=(0, 3, -4, 7, -6, 2, 9, -9, 5)),
     (128, 128), True),
    ("dqp-big-varcu", dict(qp=30, ctb_log2=6, cu_log2=6, var_cu=True,
                           cu_qp_delta=True, diff_qg_depth=2,
                           qp_delta_pattern=(1, -5, 8, 0, -3, 6, -8)),
     (192, 128), True),
    # Main10: 10-bit streams across the feature set (libde265 decodes
    # Main10; ref: plugins/decoder_libde265.cc:123 reads bpp from the
    # decoded image)
    ("10bit-auto-qp26", dict(qp=26, bit_depth=10), (64, 64), False),
    ("10bit-auto-qp8", dict(qp=8, bit_depth=10), (96, 64), False),
    ("10bit-smooth-qp40", dict(qp=40, bit_depth=10), (64, 64), True),
    ("10bit-nxn", dict(qp=26, cu_log2=3, nxn=True, bit_depth=10),
     (64, 64), False),
    ("10bit-deblock", dict(qp=30, deblock=True, bit_depth=10),
     (96, 96), True),
    ("10bit-sao", dict(qp=34, sao=True, bit_depth=10), (96, 96), True),
    ("10bit-dqp-sh", dict(qp=30, cu_qp_delta=True, sign_hiding=True,
                          bit_depth=10), (64, 64), False),
    ("10bit-wpp", dict(qp=26, wpp=True, bit_depth=10), (96, 96), False),
    ("10bit-x265full", dict(qp=24, ctb_log2=6, cu_log2=6, var_cu=True,
                            nxn=True, rqt_depth=1, strong_smoothing=True,
                            sign_hiding=True, cu_qp_delta=True,
                            diff_qg_depth=1, deblock=True, sao=True,
                            wpp=True, chroma_modes=True, bit_depth=10),
     (192, 128), True),
    # scaling lists (spec 7.3.4/8.6.3): default and explicit custom
    # matrices (x265 --scaling-list; decoder_libde265.cc full support)
    ("slists-default", dict(qp=26, scaling_lists="default"),
     (96, 64), False),
    ("slists-custom", dict(qp=26, scaling_lists="custom"),
     (96, 64), False),
    ("slists-custom-smooth", dict(qp=34, scaling_lists="custom"),
     (96, 64), True),
    ("slists-rqt-sao", dict(qp=30, rqt_depth=1, sao=True, deblock=True,
                            scaling_lists="custom"), (96, 64), False),
    ("slists-10bit", dict(qp=26, bit_depth=10, scaling_lists="custom"),
     (96, 64), False),
    ("slists-ctb64", dict(qp=28, ctb_log2=6, cu_log2=6,
                          scaling_lists="custom"), (128, 128), False),
]


def run_config(name, kw, size, smooth, seed=7):
    w, h = size
    img = make_image(w, h, seed, smooth, bit_depth=kw.get("bit_depth", 8))
    enc = IntraEncoder(w, h, EncParams(**kw))
    slice_nal, cfg_nals = enc.encode(img)
    sps = H.parse_sps(cfg_nals[0])
    pps = H.parse_pps(cfg_nals[1])

    # my decoder
    y, cb, cr = decode_intra_picture(sps, pps, [slice_nal])
    mine = {"Y": y, "Cb": cb, "Cr": cr}

    # encoder's own recon must equal decoder output (closed loop);
    # only valid without in-loop filters (encoder recon is pre-filter)
    for pl, idx in (("Y", 0), ("Cb", 1), ("Cr", 2)):
        if kw.get("deblock") or kw.get("sao"):
            break
        if not np.array_equal(mine[pl], enc.recon[idx]):
            d = np.argwhere(mine[pl] != enc.recon[idx])
            return (f"SELF-MISMATCH {pl}: {len(d)} px, first at "
                    f"{d[0].tolist()} dec={mine[pl][tuple(d[0])]} "
                    f"encrecon={enc.recon[idx][tuple(d[0])]}")

    # oracle
    if hevc_oracle.available():
        ref = hevc_oracle.decode_nals(cfg_nals + [slice_nal])
        if ref is None:
            return "ORACLE-DECODE-FAILED"
        for pl in ("Y", "Cb", "Cr"):
            a, b = mine[pl], ref[pl]
            if a.shape != b.shape:
                return f"SHAPE {pl}: {a.shape} vs {b.shape}"
            if not np.array_equal(a, b):
                d = np.argwhere(a != b)
                return (f"ORACLE-MISMATCH {pl}: {len(d)} px, first at "
                        f"{d[0].tolist()} mine={a[tuple(d[0])]} "
                        f"de265={b[tuple(d[0])]}")
    return None


def main():
    filt = sys.argv[1] if len(sys.argv) > 1 else ""
    fails = 0
    for name, kw, size, smooth in CONFIGS:
        if filt and filt not in name:
            continue
        try:
            err = run_config(name, kw, size, smooth)
        except Exception as e:  # noqa: BLE001
            err = f"EXC {type(e).__name__}: {e}"
        status = "ok" if err is None else f"FAIL {err}"
        print(f"{name:20s} {status}")
        if err:
            fails += 1
    print("oracle:", "libde265" if hevc_oracle.available() else "UNAVAILABLE")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
