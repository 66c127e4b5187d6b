#!/usr/bin/env python3
"""Encode benchmark: time + PSNR per codec (reference:
examples/benchmark.{h,cc} compute_psnr benchmark.cc:26 and the
``heif-enc --benchmark`` flag, heif_enc.cc:388).

Encodes an input image with each requested codec/quality, decodes it
back and reports encode time, decode time, file size, bpp and Y-PSNR
as JSON lines.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def compute_psnr(a, b):
    """(ref: benchmark.cc:26 compute_psnr)."""
    import numpy as np
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    mse = float(np.mean((a - b) ** 2))
    return 100.0 if mse == 0 else 10.0 * (2 * np.log10(255.0) -
                                          np.log10(mse))


def main(argv=None):
    ap = argparse.ArgumentParser(prog="heif-benchmark")
    ap.add_argument("input", help=".png/.ppm/.jpg/.tif input image")
    ap.add_argument("--codecs", default="hevc,av1,jpeg,unci",
                    help="comma-separated codec list")
    ap.add_argument("--quality", type=int, default=50)
    args = ap.parse_args(argv)

    import jax
    jax.config.update("jax_platforms",
                      os.environ.get("LIBHEIF_TPU_DEVICE", "cpu"))
    import numpy as np
    from libheif_tpu.api import HeifContext, EncodingOptions
    from libheif_tpu.image.pixel_image import (Channel, Colorspace, Chroma,
                                               PixelImage)
    from libheif_tpu.color.pipeline import convert_image
    from libheif_tpu import io as hio

    ext = os.path.splitext(args.input)[1].lower()
    data = open(args.input, "rb").read()
    if ext in (".jpg", ".jpeg"):
        src = hio.read_jpeg(data)
    elif ext in (".tif", ".tiff"):
        src = hio.read_tiff(data)
    else:
        if ext == ".png":
            arr, bd = hio.read_png(data)
            if bd == 16:
                arr = (arr >> 8).astype(np.uint8)
        else:
            arr = hio.read_ppm(data)
        src = PixelImage(arr.shape[1], arr.shape[0], Colorspace.RGB,
                         Chroma.C444)
        src.set_plane(Channel.R, arr[:, :, 0], 8)
        src.set_plane(Channel.G, arr[:, :, 1], 8)
        src.set_plane(Channel.B, arr[:, :, 2], 8)

    yuv = convert_image(src, Colorspace.YCbCr, Chroma.C420) \
        if not src.has_channel(Channel.Y) else src
    npix = src.width * src.height

    for codec in args.codecs.split(","):
        codec = codec.strip()
        img = src if codec in ("unci",) else yuv
        opts = EncodingOptions(quality=args.quality)
        ctx = HeifContext()
        t0 = time.perf_counter()
        try:
            ctx.encode_image(img, fmt=codec, options=opts)
            blob = ctx.write()
        except Exception as e:
            print(json.dumps({"codec": codec, "error": str(e)}))
            continue
        t_enc = time.perf_counter() - t0

        t0 = time.perf_counter()
        ctx2 = HeifContext.read_from_bytes(blob)
        out = ctx2.decode_image(ctx2.primary_item_id)
        t_dec = time.perf_counter() - t0

        ref_plane = (img.plane(Channel.Y) if img.has_channel(Channel.Y)
                     else img.plane(Channel.G))
        out_plane = (out.plane(Channel.Y) if out.has_channel(Channel.Y)
                     else out.plane(Channel.G))
        print(json.dumps({
            "codec": codec,
            "quality": args.quality,
            "encode_s": round(t_enc, 4),
            "decode_s": round(t_dec, 4),
            "bytes": len(blob),
            "bpp": round(8 * len(blob) / npix, 4),
            "y_psnr": round(compute_psnr(ref_plane, out_plane), 2),
        }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
