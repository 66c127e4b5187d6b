#!/usr/bin/env python3
"""heif-enc equivalent (reference: examples/heif_enc.cc) — encode PNG
/ PPM / Y4M input to HEIC (hevc), AVIF-lossless (av1), or unci."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    ap = argparse.ArgumentParser(prog="heif-enc")
    ap.add_argument("input", help=".png/.ppm/.y4m/.jpg/.tif input")
    ap.add_argument("-o", "--output", default=None)
    ap.add_argument("-c", "--codec", default="hevc",
                    choices=["hevc", "av1", "unci", "mski"])
    ap.add_argument("-q", "--quality", type=int, default=75,
                    help="0-100 (hevc only)")
    ap.add_argument("-L", "--lossless", action="store_true")
    ap.add_argument("--sequence", action="store_true",
                    help="encode a Y4M input as a video track")
    args = ap.parse_args(argv)

    import jax
    jax.config.update("jax_platforms",
                      os.environ.get("LIBHEIF_TPU_DEVICE", "cpu"))
    import numpy as np
    from libheif_tpu.api import HeifContext, EncodingOptions
    from libheif_tpu.image.pixel_image import (PixelImage, Channel,
                                               Colorspace, Chroma)
    from libheif_tpu import io as hio
    from libheif_tpu.color import convert_image

    ext = os.path.splitext(args.input)[1].lower()
    out = args.output or os.path.splitext(args.input)[0] + \
        (".avif" if args.codec == "av1" else ".heic")
    data = open(args.input, "rb").read()

    def rgb_to_image(arr):
        h, w = arr.shape[:2]
        if arr.ndim == 2:
            arr = np.dstack([arr] * 3)
        img = PixelImage(w, h, Colorspace.RGB, Chroma.C444)
        img.set_plane(Channel.R, arr[:, :, 0], 8)
        img.set_plane(Channel.G, arr[:, :, 1], 8)
        img.set_plane(Channel.B, arr[:, :, 2], 8)
        if arr.shape[2] == 4:
            img.set_plane(Channel.Alpha, arr[:, :, 3], 8)
        return img

    def yuv_to_image(y, u, v):
        h, w = y.shape
        chroma = Chroma.C420 if u.shape[0] < h else \
            (Chroma.C422 if u.shape[1] < w else Chroma.C444)
        img = PixelImage(w, h, Colorspace.YCbCr, chroma)
        img.set_plane(Channel.Y, y, 8)
        img.set_plane(Channel.Cb, u, 8)
        img.set_plane(Channel.Cr, v, 8)
        return img

    ctx = HeifContext()
    options = EncodingOptions()
    options.quality = args.quality
    options.lossless = args.lossless

    if ext == ".y4m":
        r = hio.read_y4m(data)
        frames = [yuv_to_image(*f) for f in r["frames"]]
        if args.sequence and len(frames) >= 1:
            fps = r["fps"]
            tw = ctx.add_visual_track(r["width"], r["height"],
                                      fmt=args.codec, timescale=fps[0])
            for fr in frames:
                tw.add_frame(fr, duration=fps[1])
        else:
            for fr in frames[:1]:
                ctx.encode_image(fr, fmt=args.codec, options=options)
    elif ext in (".jpg", ".jpeg"):
        img = hio.read_jpeg(data)          # YCbCr direct from JFIF
        ctx.encode_image(img, fmt=args.codec, options=options)
    elif ext in (".tif", ".tiff"):
        img = hio.read_tiff(data)
        if args.codec in ("hevc", "av1"):
            img = convert_image(img, Colorspace.YCbCr, Chroma.C420)
        ctx.encode_image(img, fmt=args.codec, options=options)
    elif ext == ".webp":
        img = hio.read_webp(data)
        if args.codec in ("hevc", "av1"):
            img = convert_image(img, Colorspace.YCbCr, Chroma.C420)
        ctx.encode_image(img, fmt=args.codec, options=options)
    else:
        if ext == ".png":
            arr, bd = hio.read_png(data)
            if bd == 16:
                arr = (arr >> 8).astype(np.uint8)
        else:
            arr = hio.read_ppm(data)
        img = rgb_to_image(arr)
        if args.codec in ("hevc", "av1"):
            img = convert_image(img, Colorspace.YCbCr, Chroma.C420)
        ctx.encode_image(img, fmt=args.codec, options=options)

    ctx.write_to_file(out)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
