"""Full benchmark table for BASELINE.md (reference harness:
/root/reference/examples/benchmark.cc:26 compute_psnr + heif-enc
--benchmark; the reference publishes no absolute numbers, so these are
the project's own measured rows).

Rows (BASELINE.json targets):
  1. unci YCbCr420→RGB fused decode (headline, also in bench.py)
  2. HEIC decode of examples/example.heic — native host engine and TPU
     device engine (both bit-exact vs libde265)
  3. AVIF decode of examples/example.avif (host, bit-exact vs libaom)
  4. HEIC lossy encode RD at q≈50 (PSNR + bpp, closed loop)
  5. Tiled grid decode: batched device program over hvc1 tiles, MP/s

Usage: python tools/benchmark_all.py [--json out.json] [--skip-device]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EXAMPLES = "/root/reference/examples"


def _psnr(a: np.ndarray, b: np.ndarray, maxv: int = 255) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 10 * np.log10(maxv * maxv / mse)


def _hevc_stream(path):
    from libheif_tpu.file import HeifFile
    from libheif_tpu.boxes.codec_cfg import Box_hvcC
    from libheif_tpu.codecs.hevc.decoder import extract_stream
    hf = HeifFile.from_file(path)
    pid = hf.primary_item_id
    return extract_stream(hf.get_property(pid, Box_hvcC),
                          hf.get_item_data(pid))


def bench_heic_decode(results, skip_device=False):
    path = os.path.join(EXAMPLES, "example.heic")
    if not os.path.exists(path):
        return
    from libheif_tpu.codecs.hevc.decoder import decode_intra_picture
    sps, pps, slices = _hevc_stream(path)
    mp = sps.pic_width * sps.pic_height / 1e6

    # host native engine
    decode_intra_picture(sps, pps, slices, engine="native")  # warm
    best = float("inf")
    for _ in range(6):       # threaded engine: more reps ride out
        t0 = time.perf_counter()          # scheduler jitter
        decode_intra_picture(sps, pps, slices, engine="native")
        best = min(best, time.perf_counter() - t0)
    results["heic_decode_native_mps"] = round(mp / best, 2)

    # same-run libde265 reference (box CPU speed drifts; the honest
    # comparison is measured back-to-back)
    try:
        sys.path.insert(0, os.path.join(os.path.dirname(__file__),
                                        "..", "tests"))
        import hevc_oracle
        if hevc_oracle.available():
            cfg_nals = None
            from libheif_tpu.file import HeifFile
            from libheif_tpu.boxes.codec_cfg import Box_hvcC
            hf = HeifFile.from_file(path)
            cfg = hf.get_property(hf.primary_item_id, Box_hvcC)
            nals = cfg.get_header_nals() + slices
            hevc_oracle.decode_nals(nals)
            b = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                hevc_oracle.decode_nals(nals)
                b = min(b, time.perf_counter() - t0)
            results["heic_decode_libde265_mps"] = round(mp / b, 2)
    except Exception:   # noqa: BLE001 — reference row is best-effort
        pass

    if not skip_device:
        ref = decode_intra_picture(sps, pps, slices, engine="native")
        t0 = time.perf_counter()
        dev = decode_intra_picture(sps, pps, slices, engine="device")
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            dev = decode_intra_picture(sps, pps, slices, engine="device")
            best = min(best, time.perf_counter() - t0)
        results["heic_decode_device_mps"] = round(mp / best, 2)
        results["heic_decode_device_compile_s"] = round(compile_s, 1)
        results["heic_decode_device_bitexact"] = bool(
            all(np.array_equal(a, b) for a, b in zip(ref, dev)))


def bench_avif_decode(results):
    path = os.path.join(EXAMPLES, "example.avif")
    if not os.path.exists(path):
        return
    from libheif_tpu.api import HeifContext
    ctx = HeifContext.read_from_file(path)
    pid = ctx.primary_item_id
    img = ctx.decode_image(pid)       # warm / parse caches
    mp = img.width * img.height / 1e6
    best = float("inf")
    for _ in range(2):
        ctx2 = HeifContext.read_from_file(path)
        t0 = time.perf_counter()
        ctx2.decode_image(ctx2.primary_item_id)
        best = min(best, time.perf_counter() - t0)
    results["avif_decode_host_mps"] = round(mp / best, 2)

    # codec-core throughput of the native C++ engine alone (the number
    # comparable to BASELINE's libaom/dav1d single-image rows)
    from libheif_tpu.codecs.av1.decoder import decode_intra_frame
    obus = ctx.items[pid].coded_data()
    decode_intra_frame(obus, engine="native")  # warm
    best = float("inf")
    for _ in range(6):       # threaded engine: more reps ride out
        t0 = time.perf_counter()          # scheduler jitter
        decode_intra_frame(obus, engine="native")
        best = min(best, time.perf_counter() - t0)
    results["avif_decode_native_mps"] = round(mp / best, 2)

    try:
        sys.path.insert(0, os.path.join(os.path.dirname(__file__),
                                        "..", "tests"))
        import av1_oracle
        if av1_oracle.available():
            av1_oracle.decode(obus)
            b = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                av1_oracle.decode(obus)
                b = min(b, time.perf_counter() - t0)
            results["avif_decode_libaom_mps"] = round(mp / b, 2)
    except Exception:   # noqa: BLE001
        pass


def bench_heic_encode_rd(results):
    """Encode example.heic's decoded image at q≈50 and report RD."""
    path = os.path.join(EXAMPLES, "example.heic")
    if not os.path.exists(path):
        return
    from libheif_tpu.codecs.hevc.decoder import decode_intra_picture
    from libheif_tpu.codecs.hevc.encoder import IntraEncoder, EncParams
    from libheif_tpu.image.pixel_image import (PixelImage, Channel,
                                               Colorspace, Chroma)
    sps, pps, slices = _hevc_stream(path)
    y, cb, cr = decode_intra_picture(sps, pps, slices, engine="native")
    # crop to an 8-multiple frame for the encoder
    h = y.shape[0] // 8 * 8
    w = y.shape[1] // 8 * 8
    img = PixelImage(w, h, Colorspace.YCbCr, Chroma.C420)
    img.set_plane(Channel.Y, y[:h, :w].astype(np.uint8), 8)
    img.set_plane(Channel.Cb, cb[:h // 2, :w // 2].astype(np.uint8), 8)
    img.set_plane(Channel.Cr, cr[:h // 2, :w // 2].astype(np.uint8), 8)
    qp = 32   # ≈ heif quality 50 on x265's quality→QP mapping
    t0 = time.perf_counter()
    enc = IntraEncoder(w, h, EncParams(qp=qp))
    slice_nal, cfg_nals = enc.encode(img)
    enc_s = time.perf_counter() - t0
    bits = 8 * (len(slice_nal) + sum(len(n) for n in cfg_nals))
    from libheif_tpu.codecs.hevc import headers as Hh
    dec = decode_intra_picture(Hh.parse_sps(cfg_nals[0]),
                               Hh.parse_pps(cfg_nals[1]),
                               [slice_nal], engine="native")
    results["heic_encode_qp32_psnr_y_db"] = round(
        _psnr(dec[0][:h, :w], y[:h, :w]), 2)
    results["heic_encode_qp32_bpp"] = round(bits / (w * h), 3)
    results["heic_encode_mps"] = round(w * h / 1e6 / enc_s, 3)


def bench_grid_device(results, n_tiles=16, mesh_devices=1):
    """Batched device decode of an hvc1 tile grid (one 512x512 coded
    tile replicated — identical decode work per tile)."""
    from libheif_tpu.codecs.hevc.encoder import IntraEncoder, EncParams
    from libheif_tpu.codecs.hevc import headers as Hh
    from libheif_tpu.image.pixel_image import (PixelImage, Channel,
                                               Colorspace, Chroma)
    from libheif_tpu.parallel.coded_grid import parse_tile, \
        decode_tiles_device
    from libheif_tpu.boxes.codec_cfg import Box_hvcC

    rng = np.random.default_rng(3)
    # smooth-ish content: realistic TU-size mix rather than all-4x4
    base = rng.integers(0, 256, (64, 64)).astype(np.float64)
    up = np.kron(base, np.ones((8, 8)))[:512, :512]
    noise = rng.integers(-6, 7, (512, 512))
    ych = np.clip(up + noise, 0, 255).astype(np.uint8)
    img = PixelImage(512, 512, Colorspace.YCbCr, Chroma.C420)
    img.set_plane(Channel.Y, ych, 8)
    img.set_plane(Channel.Cb, ych[::2, ::2], 8)
    img.set_plane(Channel.Cr, ych[1::2, 1::2], 8)
    enc = IntraEncoder(512, 512, EncParams(qp=30, ctb_log2=6, cu_log2=6,
                                           var_cu=True, rqt_depth=1))
    slice_nal, cfg_nals = enc.encode(img)
    cfg = Box_hvcC()
    cfg.length_size = 4
    for nal in cfg_nals:
        cfg.add_nal(nal)
    data = len(slice_nal).to_bytes(4, "big") + slice_nal

    t0 = time.perf_counter()
    parsed = [parse_tile(cfg, data) for _ in range(n_tiles)]
    parse_s = time.perf_counter() - t0
    syns = [p[1] for p in parsed]
    raws = [p[2] for p in parsed]
    if any(r is None for r in raws):
        raws = None

    mesh = None
    if mesh_devices > 1:
        from libheif_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(mesh_devices)

    decode_tiles_device(syns, raw_tus=raws, mesh=mesh)   # compile
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        decode_tiles_device(syns, raw_tus=raws, mesh=mesh)
        best = min(best, time.perf_counter() - t0)
    mp = n_tiles * 512 * 512 / 1e6
    key = f"grid_device_{n_tiles}tiles"
    if mesh_devices > 1:
        key += f"_{mesh_devices}dev"
    results[key + "_mps"] = round(mp / best, 2)
    results[key + "_parse_s"] = round(parse_s, 2)


def _encode_bench_tile(qp=30):
    """One realistic 512x512 coded hvc1 tile (shared by the grid
    benches)."""
    from libheif_tpu.codecs.hevc.encoder import IntraEncoder, EncParams
    from libheif_tpu.image.pixel_image import (PixelImage, Channel,
                                               Colorspace, Chroma)
    from libheif_tpu.boxes.codec_cfg import Box_hvcC
    rng = np.random.default_rng(3)
    base = rng.integers(0, 256, (64, 64)).astype(np.float64)
    up = np.kron(base, np.ones((8, 8)))[:512, :512]
    ych = np.clip(up + rng.integers(-6, 7, (512, 512)), 0,
                  255).astype(np.uint8)
    img = PixelImage(512, 512, Colorspace.YCbCr, Chroma.C420)
    img.set_plane(Channel.Y, ych, 8)
    img.set_plane(Channel.Cb, ych[::2, ::2], 8)
    img.set_plane(Channel.Cr, ych[1::2, 1::2], 8)
    enc = IntraEncoder(512, 512, EncParams(qp=qp, ctb_log2=6, cu_log2=6,
                                           var_cu=True, rqt_depth=1))
    slice_nal, cfg_nals = enc.encode(img)
    cfg = Box_hvcC()
    cfg.length_size = 4
    for nal in cfg_nals:
        cfg.add_nal(nal)
    data = len(slice_nal).to_bytes(4, "big") + slice_nal
    return cfg, data


def bench_grid_scaling(results, counts=(16, 64, 256), budget_left=None):
    """Host (threaded native) vs device (batched wavefront) coded-grid
    decode at growing tile counts + the crossover point (VERDICT r3:
    device win at scale).  Device timing keeps outputs on device and
    fetches a checksum scalar (axon relay methodology, see bench.py)."""
    import jax
    import jax.numpy as jnp
    from libheif_tpu.parallel.coded_grid import parse_tile
    from libheif_tpu.codecs.hevc.device_recon import (
        build_plan, _build_program, _plan_meta, _plan_arrays)
    from libheif_tpu.codecs.hevc.decoder import extract_stream, \
        decode_intra_picture
    from concurrent.futures import ThreadPoolExecutor

    cfg, data = _encode_bench_tile()
    sps, syn, raw = parse_tile(cfg, data)
    spsf, ppsf, slicesf = extract_stream(cfg, data)
    mp1 = 512 * 512 / 1e6
    crossover = None
    for n in counts:
        if budget_left is not None and budget_left() < 60:
            break
        # host: n independent tile decodes over the thread pool
        nw = min(os.cpu_count() or 1, 8)
        with ThreadPoolExecutor(max_workers=nw) as ex:
            list(ex.map(lambda _: decode_intra_picture(
                spsf, ppsf, slicesf, engine="native"), range(min(n, 4))))
        t0 = time.perf_counter()
        with ThreadPoolExecutor(max_workers=nw) as ex:
            list(ex.map(lambda _: decode_intra_picture(
                spsf, ppsf, slicesf, engine="native"), range(n)))
        host_s = time.perf_counter() - t0
        host_mps = n * mp1 / host_s

        # device: one batched program over n replicated parsed tiles
        plan = build_plan([syn] * n,
                          raw_tus=None if raw is None else [raw] * n)
        prog = _build_program(_plan_meta(plan))
        arrays = _plan_arrays(plan)

        def chk(a):
            y, cb, cr = prog(a)
            return (y[:, 0, 0].astype(jnp.int32).sum() +
                    cb[:, 0, 0].astype(jnp.int32).sum())
        fn = jax.jit(chk)
        dev_in = jax.device_put(arrays)
        t0 = time.perf_counter()
        int(fn(dev_in))                      # compile + run
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            int(fn(dev_in))
            best = min(best, time.perf_counter() - t0)
        dev_mps = n * mp1 / best
        results[f"grid_host_{n}tiles_mps"] = round(host_mps, 2)
        results[f"grid_device_{n}tiles_mps"] = round(dev_mps, 2)
        results[f"grid_device_{n}tiles_compile_s"] = round(compile_s, 1)
        if crossover is None and dev_mps > host_mps:
            crossover = n
    results["grid_device_crossover"] = crossover


def bench_gigapixel(results, chunk=256, n_chunks=4, budget_left=None):
    """Synthetic >=1 GP coded grid decoded in device chunks: 4096 x
    0.25MP tiles = 1.024 GP, streamed as 16 x 256-tile programs (one
    compile, reused).  Reports MP/s/chip (VERDICT r3 gigapixel row)."""
    import jax
    import jax.numpy as jnp
    from libheif_tpu.parallel.coded_grid import parse_tile
    from libheif_tpu.codecs.hevc.device_recon import (
        build_plan, _build_program, _plan_meta, _plan_arrays)

    cfg, data = _encode_bench_tile()
    sps, syn, raw = parse_tile(cfg, data)
    plan = build_plan([syn] * chunk,
                      raw_tus=None if raw is None else [raw] * chunk)
    prog = _build_program(_plan_meta(plan))
    arrays = _plan_arrays(plan)

    def chk(a):
        y, cb, cr = prog(a)
        return y[:, 0, 0].astype(jnp.int32).sum()
    fn = jax.jit(chk)
    dev_in = jax.device_put(arrays)
    int(fn(dev_in))                          # compile
    t0 = time.perf_counter()
    acc = 0
    for _ in range(n_chunks):
        acc += int(fn(dev_in))
    total_s = time.perf_counter() - t0
    mp = chunk * n_chunks * 512 * 512 / 1e6
    results["gigapixel_equiv_mp"] = round(mp * (4096 // (chunk * n_chunks)
                                                if chunk * n_chunks < 4096
                                                else 1), 0)
    results["gigapixel_device_mps_per_chip"] = round(mp / total_s, 2)
    results["gigapixel_extrapolated_s_per_gp"] = round(
        1024.0 / (mp / total_s), 2)


def bench_j2k_htj2k(results, mp_side=512):
    """Classic EBCOT vs HT-J2K block coding on the same content
    (lossless 5/3): encode/decode throughput and size ratio.  The HT
    cleanup pass is the reference's OpenJPH boundary
    (plugins/encoder_openjph.cc)."""
    from libheif_tpu.codecs.j2k.encoder import encode_codestream
    from libheif_tpu.codecs.j2k.decoder import decode_codestream
    rng = np.random.default_rng(7)
    base = rng.integers(0, 256, (mp_side // 8, mp_side // 8)).astype(
        np.float64)
    img = np.clip(np.kron(base, np.ones((8, 8)))
                  + rng.integers(-12, 13, (mp_side, mp_side)),
                  0, 255).astype(np.int32)
    mp = mp_side * mp_side / 1e6
    for name, ht in (("j2k", False), ("htj2k", True)):
        t0 = time.perf_counter()
        data = encode_codestream([img], depth=8, levels=5,
                                 reversible=True, htj2k=ht)
        enc_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        planes, _ = decode_codestream(data)
        dec_s = time.perf_counter() - t0
        assert (planes[0] == img).all()
        results[f"{name}_lossless_enc_mps"] = round(mp / enc_s, 3)
        results[f"{name}_lossless_dec_mps"] = round(mp / dec_s, 3)
        results[f"{name}_lossless_bpp"] = round(len(data) * 8 / (mp * 1e6),
                                                3)

    # same-run OpenJPEG oracle (classic J2K via PIL's openjpeg binding;
    # reference boundary: plugins/decoder_openjpeg.cc /
    # encoder_openjpeg.cc)
    try:
        import io
        from PIL import Image, features
        if features.check("jpg_2000"):
            im = Image.fromarray(img.astype(np.uint8))
            b = float("inf")
            buf = None
            for _ in range(2):
                t0 = time.perf_counter()
                buf = io.BytesIO()
                im.save(buf, "JPEG2000", irreversible=False)
                b = min(b, time.perf_counter() - t0)
            results["j2k_openjpeg_enc_mps"] = round(mp / b, 3)
            raw = buf.getvalue()
            b = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                Image.open(io.BytesIO(raw)).load()
                b = min(b, time.perf_counter() - t0)
            results["j2k_openjpeg_dec_mps"] = round(mp / b, 3)
    except Exception:   # noqa: BLE001 — oracle rows are best-effort
        pass


def bench_jpeg_decode(results, side=1024):
    """JPEG baseline decode throughput of the native scan+IDCT engine
    (the libjpeg plugin boundary, plugins/decoder_libjpeg.cc) with a
    same-run libjpeg(-turbo via PIL) oracle column.  Ours stops at
    YCbCr planes (the reference plugin's raw-output boundary); PIL's
    number includes its own upsample/interleave."""
    try:
        from PIL import Image
    except ImportError:
        return
    import io
    from libheif_tpu.codecs.jpeg.decoder import decode_jpeg
    rng = np.random.default_rng(3)
    base = rng.integers(0, 256, (side // 8, side // 8, 3)).astype(
        np.float64)
    img = np.clip(np.kron(base, np.ones((8, 8, 1)))
                  + rng.integers(-10, 11, (side, side, 3)),
                  0, 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG", quality=85)
    data = buf.getvalue()
    mp = side * side / 1e6
    decode_jpeg(data)
    best = float("inf")
    for _ in range(6):
        t0 = time.perf_counter()
        decode_jpeg(data)
        best = min(best, time.perf_counter() - t0)
    results["jpeg_decode_native_mps"] = round(mp / best, 1)
    b = float("inf")
    for _ in range(6):
        t0 = time.perf_counter()
        im = Image.open(io.BytesIO(data))
        im.load()
        b = min(b, time.perf_counter() - t0)
    results["jpeg_decode_libjpeg_mps"] = round(mp / b, 1)

    # encode: native FDCT+quant + C Huffman emitter vs PIL same-run
    from libheif_tpu.image.pixel_image import (PixelImage, Channel,
                                               Colorspace, Chroma)
    from libheif_tpu.codecs.jpeg.encoder import encode_jpeg
    pil = Image.fromarray(img).convert("YCbCr")
    a = np.asarray(pil)
    pimg = PixelImage(side, side, Colorspace.YCbCr, Chroma.C420)
    pimg.set_plane(Channel.Y, a[:, :, 0].copy(), 8)
    pimg.set_plane(Channel.Cb, a[::2, ::2, 1].copy(), 8)
    pimg.set_plane(Channel.Cr, a[::2, ::2, 2].copy(), 8)
    encode_jpeg(pimg, quality=85)
    best = float("inf")
    for _ in range(6):
        t0 = time.perf_counter()
        encode_jpeg(pimg, quality=85)
        best = min(best, time.perf_counter() - t0)
    results["jpeg_encode_native_mps"] = round(mp / best, 1)
    src = Image.fromarray(img)
    b = float("inf")
    for _ in range(6):
        t0 = time.perf_counter()
        buf2 = io.BytesIO()
        src.save(buf2, "JPEG", quality=85)
        b = min(b, time.perf_counter() - t0)
    results["jpeg_encode_libjpeg_mps"] = round(mp / b, 1)


def bench_avc_decode(results, side=768):
    """AVC native-engine intra decode throughput (the openh264 plugin
    boundary, plugins/decoder_openh264.cc): our own encoder emits the
    stream, the native C engine decodes it."""
    from libheif_tpu.codecs.avc.encoder import encode_frame
    from libheif_tpu.codecs.avc.decoder import decode_annexb
    rng = np.random.default_rng(7)
    base = rng.integers(0, 256, (side // 16, side // 16)).astype(np.float64)
    y = np.clip(np.kron(base, np.ones((16, 16)))
                + rng.integers(-12, 13, (side, side)), 0, 255
                ).astype(np.uint8)
    u = np.clip(128 + rng.integers(-30, 31, (side // 2, side // 2)), 0,
                255).astype(np.uint8)
    v = np.clip(128 + rng.integers(-30, 31, (side // 2, side // 2)), 0,
                255).astype(np.uint8)
    t0 = time.perf_counter()
    sps, pps, sl, recon = encode_frame(y, u, v, qp=30, tx8=True,
                                       deblock=False)
    enc_s = time.perf_counter() - t0
    sc = b"\x00\x00\x00\x01"
    stream = sc + sps + sc + pps + sc + sl
    mp = side * side / 1e6
    results["avc_encode_native_mps"] = round(mp / enc_s, 2)
    decode_annexb(stream)    # warm
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        out = decode_annexb(stream)
        best = min(best, time.perf_counter() - t0)
    assert np.array_equal(out["Y"], recon[0][:side, :side].astype(np.uint8))
    results["avc_decode_native_mps"] = round(mp / best, 2)

    # same-run oracle columns: x264 intra encode and libavcodec decode
    # of the same content/stream (reference boundaries:
    # plugins/encoder_x264.cc, plugins/decoder_openh264.cc)
    try:
        sys.path.insert(0, os.path.join(os.path.dirname(__file__),
                                        "..", "tests"))
        import avc_oracle
        if avc_oracle.available():
            b = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                x264_stream = avc_oracle.encode(y, u, v, qp=30, cabac=True,
                                                tx8=True)
                b = min(b, time.perf_counter() - t0)
            if x264_stream is not None:
                results["avc_encode_x264_mps"] = round(mp / b, 2)
            avc_oracle.decode(stream)
            b = float("inf")
            for _ in range(4):
                t0 = time.perf_counter()
                avc_oracle.decode(stream)
                b = min(b, time.perf_counter() - t0)
            results["avc_decode_avcodec_mps"] = round(mp / b, 2)
    except Exception:   # noqa: BLE001 — oracle rows are best-effort
        pass


def bench_hbd_decode(results, side=256):
    """High-bit-depth rows (VERDICT r4 item 1): 10-bit HEVC (Python
    engine — the native port is intra-8-bit) with same-run libde265,
    and 10-bit AV1 on the native engine with same-run libaom."""
    import sys as _s
    import os as _o
    _s.path.insert(0, _o.path.join(_o.path.dirname(
        _o.path.abspath(__file__)), "..", "tests"))
    from libheif_tpu.image.pixel_image import (PixelImage, Channel,
                                               Colorspace, Chroma)
    rng = np.random.default_rng(5)
    mp = side * side / 1e6

    # HEVC Main10
    try:
        import hevc_oracle
        from libheif_tpu.codecs.hevc.encoder import IntraEncoder, EncParams
        from libheif_tpu.codecs.hevc import headers as HH
        from libheif_tpu.codecs.hevc.decoder import decode_intra_picture
        img = PixelImage(side, side, Colorspace.YCbCr, Chroma.C420)
        base = np.kron(rng.integers(0, 1024, (side // 8, side // 8)),
                       np.ones((8, 8)))
        img.set_plane(Channel.Y, np.clip(
            base + rng.integers(-30, 30, (side, side)), 0,
            1023).astype(np.uint16), 10)
        img.set_plane(Channel.Cb, rng.integers(
            0, 1024, (side // 2, side // 2)).astype(np.uint16), 10)
        img.set_plane(Channel.Cr, rng.integers(
            0, 1024, (side // 2, side // 2)).astype(np.uint16), 10)
        enc = IntraEncoder(side, side, EncParams(qp=30, bit_depth=10,
                                                 deblock=True))
        nal, cfg = enc.encode(img)
        sps = HH.parse_sps(cfg[0])
        pps = HH.parse_pps(cfg[1])
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            decode_intra_picture(sps, pps, [nal], engine="python")
            best = min(best, time.perf_counter() - t0)
        results["hevc_10bit_decode_mps"] = round(mp / best, 3)
        if hevc_oracle.available():
            b = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                hevc_oracle.decode_nals(cfg + [nal])
                b = min(b, time.perf_counter() - t0)
            results["hevc_10bit_libde265_mps"] = round(mp / b, 3)
    except Exception as e:   # noqa: BLE001
        results["hevc_10bit_error"] = type(e).__name__

    # AV1 10-bit (native engine)
    try:
        import av1_oracle
        from libheif_tpu.codecs.av1.decoder import decode_intra_frame
        if av1_oracle.available():
            planes = {
                "Y": np.clip(np.kron(
                    rng.integers(0, 1024, (side // 8, side // 8)),
                    np.ones((8, 8))) + rng.integers(
                        -30, 30, (side, side)), 0,
                    1023).astype(np.uint16),
                "U": rng.integers(0, 1024,
                                  (side // 2, side // 2)).astype(np.uint16),
                "V": rng.integers(0, 1024,
                                  (side // 2, side // 2)).astype(np.uint16),
            }
            obus = av1_oracle.encode(planes, {"cpu-used": "3",
                                              "_min_q": "30",
                                              "_max_q": "30"},
                                     usage=0, bit_depth=10)
            decode_intra_frame(obus, engine="native")   # warm
            best = float("inf")
            for _ in range(4):
                t0 = time.perf_counter()
                decode_intra_frame(obus, engine="native")
                best = min(best, time.perf_counter() - t0)
            results["av1_10bit_decode_native_mps"] = round(mp / best, 2)
            av1_oracle.decode(obus)
            b = float("inf")
            for _ in range(4):
                t0 = time.perf_counter()
                av1_oracle.decode(obus)
                b = min(b, time.perf_counter() - t0)
            results["av1_10bit_libaom_mps"] = round(mp / b, 2)
    except Exception as e:   # noqa: BLE001
        results["av1_10bit_error"] = type(e).__name__


def bench_thread_parity(results):
    """1-thread rows for the threaded native engines so the headline
    comparisons vs single-thread libde265/libaom are robust
    (reference: heif_decoding.h:129 num_codec_threads)."""
    import os as _os
    path = os.path.join(EXAMPLES, "example.heic")
    if os.path.exists(path):
        from libheif_tpu.codecs.hevc.decoder import decode_intra_picture
        sps, pps, slices = _hevc_stream(path)
        mp = sps.pic_width * sps.pic_height / 1e6
        _os.environ["TPUHEIF_HEVC_PIPELINE"] = "0"
        _os.environ["TPUHEIF_HEVC_WPP_THREADS"] = "1"
        try:
            decode_intra_picture(sps, pps, slices, engine="native")
            best = float("inf")
            for _ in range(5):
                t0 = time.perf_counter()
                decode_intra_picture(sps, pps, slices, engine="native")
                best = min(best, time.perf_counter() - t0)
            results["heic_decode_native_1t_mps"] = round(mp / best, 2)
        finally:
            _os.environ.pop("TPUHEIF_HEVC_PIPELINE", None)
            _os.environ.pop("TPUHEIF_HEVC_WPP_THREADS", None)
    path = os.path.join(EXAMPLES, "example.avif")
    if os.path.exists(path):
        from libheif_tpu.api import HeifContext
        from libheif_tpu.codecs.av1.decoder import decode_intra_frame
        ctx = HeifContext.read_from_file(path)
        pid = ctx.primary_item_id
        obus = ctx.items[pid].coded_data()
        img = ctx.decode_image(pid)
        mp = img.width * img.height / 1e6
        _os.environ["TPUHEIF_AV1_NO_THREADS"] = "1"
        try:
            decode_intra_frame(obus, engine="native")
            best = float("inf")
            for _ in range(5):
                t0 = time.perf_counter()
                decode_intra_frame(obus, engine="native")
                best = min(best, time.perf_counter() - t0)
            results["avif_decode_native_1t_mps"] = round(mp / best, 2)
        finally:
            _os.environ.pop("TPUHEIF_AV1_NO_THREADS", None)
    # machine-readable oracle absences (VERDICT: every *_mps row pairs
    # with an oracle number or an explicit null + reason)
    results["heic_encode_x265_mps"] = None
    results["heic_encode_oracle_note"] = "x265 not present in this image"
    results["vvc_oracle_mps"] = None
    results["vvc_oracle_note"] = ("vvdec/vvenc not present; VVC story is "
                                  "encoder<->decoder round-trip")
    results["htj2k_openjph_mps"] = None
    results["htj2k_oracle_note"] = ("OpenJPH not present; HT streams are "
                                    "difftested against the OpenJPEG 2.5 "
                                    "HT decoder")


def bench_device_mode_search(results, side=2048):
    """Device-assisted encoder experiment (VERDICT r4 item 5): batched
    open-loop SATD intra mode search (35 modes x 8/16/32 blocks) as
    three matmuls on device vs the same search on host."""
    import numpy as np
    from libheif_tpu.codecs.hevc.device_modes import (
        _jitted_search, extract_blocks, plan_modes_host)
    import jax
    rng = np.random.default_rng(5)
    yy, xx = np.mgrid[0:side, 0:side]
    y = (120 + 70 * np.sin(xx / 11.0) + 50 * np.cos((xx + 2 * yy)
         / 17.0) + rng.integers(-10, 10, (side, side))) \
        .clip(0, 255).astype(np.uint8)
    mp = side * side / 1e6
    total = 0.0
    for lg in (3, 4, 5):
        blocks, refs, _ = extract_blocks(y, lg)
        f = _jitted_search(lg)
        db, dr = jax.device_put(blocks), jax.device_put(refs)
        f(db, dr).block_until_ready()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            f(db, dr).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        total += best
    results["hevc_device_mode_search_mps"] = round(mp / total, 1)
    # host baseline on a quarter-size frame (it is slow), scaled
    q = side // 4
    t0 = time.perf_counter()
    plan_modes_host(y[:q, :q])
    t_host = time.perf_counter() - t0
    results["hevc_host_mode_search_mps"] = round(
        (q * q / 1e6) / t_host, 3)


def bench_hevc_seq_decode(results, side=256, n=6):
    """Inter (IPPP) sequence decode throughput of the Python reference
    engine vs same-run libde265 (the inter path is conformance-first;
    the native engines cover intra — README positioning)."""
    import sys as _sys
    import os as _os
    _sys.path.insert(0, _os.path.join(_os.path.dirname(
        _os.path.abspath(__file__)), "..", "tests"))
    try:
        import hevc_oracle
    except ImportError:
        return
    from libheif_tpu.image.pixel_image import (PixelImage, Channel,
                                               Colorspace, Chroma)
    from libheif_tpu.codecs.hevc.encoder import EncParams
    from libheif_tpu.codecs.hevc.inter_enc import SequenceEncoder
    from libheif_tpu.codecs.hevc.decoder import SequenceDecoder
    from libheif_tpu.codecs.hevc import headers as HH

    rng = np.random.default_rng(3)
    base = np.kron(rng.integers(0, 256, (side // 8 + 8, side // 8 + 8)),
                   np.ones((8, 8))).astype(np.int32)

    def frame(i):
        img = PixelImage(side, side, Colorspace.YCbCr, Chroma.C420)
        img.set_plane(Channel.Y, np.clip(
            base[i:i + side, 2 * i:2 * i + side] +
            rng.integers(-4, 5, (side, side)), 0, 255).astype(np.uint8),
            8)
        img.set_plane(Channel.Cb,
                      np.full((side // 2, side // 2), 110, np.uint8), 8)
        img.set_plane(Channel.Cr,
                      np.full((side // 2, side // 2), 140, np.uint8), 8)
        return img

    enc = SequenceEncoder(side, side, EncParams(qp=30, deblock=True))
    samples = []
    for i in range(n):
        samples += enc.push_frame(frame(i))
    mp = side * side * n / 1e6
    sps = pps = None
    for nal in enc.config_nals:
        t = HH.nal_type(nal)
        if t == 33:
            sps = HH.parse_sps(nal)
        elif t == 34:
            pps = HH.parse_pps(nal)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        dec = SequenceDecoder(sps, pps)
        for s in samples:
            dec.decode_nal(s.data)
        best = min(best, time.perf_counter() - t0)
    results["hevc_seq_ippp_decode_mps"] = round(mp / best, 3)
    if hevc_oracle.available():
        nals = list(enc.config_nals) + [s.data for s in samples]
        b = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            hevc_oracle.decode_nals_seq(nals)
            b = min(b, time.perf_counter() - t0)
        results["hevc_seq_ippp_libde265_mps"] = round(mp / b, 3)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    ap.add_argument("--skip-device", action="store_true")
    ap.add_argument("--tiles", type=int, default=16)
    ap.add_argument("--mesh", type=int, default=1)
    args = ap.parse_args()

    import jax
    results = {"backend": jax.default_backend()}

    t_all = time.perf_counter()
    bench_heic_decode(results, skip_device=args.skip_device)
    bench_avif_decode(results)
    bench_heic_encode_rd(results)
    bench_j2k_htj2k(results)
    bench_jpeg_decode(results)
    bench_hbd_decode(results)
    bench_hevc_seq_decode(results)
    bench_avc_decode(results)
    bench_thread_parity(results)
    if not args.skip_device:
        bench_device_mode_search(results)
    if not args.skip_device:
        bench_grid_device(results, n_tiles=args.tiles,
                          mesh_devices=args.mesh)
    results["total_s"] = round(time.perf_counter() - t_all, 1)

    out = json.dumps(results, indent=2)
    print(out)
    if args.json:
        with open(args.json, "w") as f:
            f.write(out + "\n")


if __name__ == "__main__":
    main()
