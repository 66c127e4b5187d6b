#!/usr/bin/env python3
"""heif-dec equivalent (reference: examples/heif_dec.cc) — decode HEIF
/AVIF to PNG / PPM / Y4M, chosen by output extension."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    ap = argparse.ArgumentParser(prog="heif-dec")
    ap.add_argument("input")
    ap.add_argument("output", nargs="?", default=None,
                    help="output file (.png/.ppm/.y4m/.jpg/.tif); default <input>.png")
    ap.add_argument("--quality", type=int, default=None,
                    help="output quality for lossy targets (jpeg/webp)")
    ap.add_argument("--all", action="store_true",
                    help="decode all top-level images (suffix -N)")
    args = ap.parse_args(argv)

    import jax
    jax.config.update("jax_platforms",
                      os.environ.get("LIBHEIF_TPU_DEVICE", "cpu"))
    import numpy as np
    from libheif_tpu.api import HeifContext
    from libheif_tpu.image.pixel_image import (Channel, Colorspace, Chroma)
    from libheif_tpu import io as hio

    out = args.output or os.path.splitext(args.input)[0] + ".png"
    ext = os.path.splitext(out)[1].lower()
    ctx = HeifContext.read_from_file(args.input)

    def save_one(img, path):
        if ext in (".jpg", ".jpeg"):
            from libheif_tpu.image.pixel_image import Colorspace as CS, Chroma as CH
            src = img
            if not img.has_channel(Channel.Y):
                src = ctx._convert_output(img, CS.YCbCr, CH.C420, None)
            hio.write_jpeg_file(src, path)
            return
        if ext in (".tif", ".tiff"):
            rgb = ctx._convert_output(img, Colorspace.RGB, Chroma.C444, None) \
                if img.colorspace != Colorspace.RGB else img
            hio.write_tiff_file(rgb, path)
            return
        if ext == ".webp":
            rgb = ctx._convert_output(img, Colorspace.RGB, Chroma.C444, None) \
                if img.colorspace != Colorspace.RGB else img
            hio.write_webp_file(rgb, path, quality=args.quality or 90)
            return
        if ext == ".y4m":
            y = img.plane(Channel.Y)
            u = img.plane(Channel.Cb)
            v = img.plane(Channel.Cr)
            with open(path, "wb") as f:
                f.write(hio.write_y4m([(y, u, v)]))
            return
        rgb = ctx._convert_output(img, Colorspace.RGB, Chroma.C444, None) \
            if img.colorspace != Colorspace.RGB else img
        planes = [rgb.plane(Channel.R), rgb.plane(Channel.G),
                  rgb.plane(Channel.B)]
        if rgb.has_channel(Channel.Alpha):
            planes.append(rgb.plane(Channel.Alpha))
        arr = np.dstack(planes).astype(np.uint8)
        data = hio.write_png(arr) if ext == ".png" else hio.write_ppm(arr)
        with open(path, "wb") as f:
            f.write(data)

    if args.all:
        ids = ctx.top_level_image_ids()
    else:
        try:
            ids = [ctx.primary_item_id] \
                if ctx.primary_item_id in ctx.items else []
        except Exception:
            ids = []          # sequence-only file
    for n, iid in enumerate(ids):
        img = ctx.decode_image(iid)
        path = out if len(ids) == 1 else \
            f"{os.path.splitext(out)[0]}-{n}{ext}"
        save_one(img, path)
        print(f"wrote {path}")

    if not ids and ctx.tracks and ext == ".y4m":
        t = ctx.tracks[0]
        frames = []
        for i in range(t.num_samples):
            img = t.decode_sample(i)
            frames.append((img.plane(Channel.Y), img.plane(Channel.Cb),
                           img.plane(Channel.Cr)))
        with open(out, "wb") as f:
            f.write(hio.write_y4m(frames))
        print(f"wrote {out} ({len(frames)} frames)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
