#!/usr/bin/env python3
"""heif-test equivalent (reference: examples/heif_test.cc) — dump raw
pixel data of selected image items and raw metadata payloads to
stdout, for use in scripted pipelines and conformance harnesses.

Usage:
  heif-test -d ID [-d ID ...] [-m IMGID:METAID ...] image.heic
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _id_pair(s: str):
    if ":" not in s:
        raise argparse.ArgumentTypeError("id pair must be 'ID:ID'")
    a, b = s.split(":", 1)
    return int(a), int(b)


def main(argv=None):
    ap = argparse.ArgumentParser(prog="heif-test")
    ap.add_argument("input")
    ap.add_argument("-d", "--decode-img", action="append", type=int,
                    default=[], metavar="ID",
                    help="decode image item ID and write raw planes to "
                         "stdout")
    ap.add_argument("-m", "--metadata", action="append", type=_id_pair,
                    default=[], metavar="ID:ID",
                    help="write metadata block METAID of image ID to stdout")
    args = ap.parse_args(argv)

    import jax
    jax.config.update("jax_platforms",
                      os.environ.get("LIBHEIF_TPU_DEVICE", "cpu"))
    import numpy as np
    from libheif_tpu.api import HeifContext
    from libheif_tpu.image.pixel_image import Channel

    ctx = HeifContext.read_from_file(args.input)
    out = sys.stdout.buffer

    # plane dump order mirrors heif_test.cc's channel_candidates list
    order = [Channel.Y, Channel.Cb, Channel.Cr, Channel.R, Channel.G,
             Channel.B, Channel.Alpha, Channel.Interleaved]
    for item_id in args.decode_img:
        img = ctx.decode_image(item_id)
        for ch in order:
            if not img.has_channel(ch):
                continue
            plane = np.asarray(img.plane(ch))
            out.write(np.ascontiguousarray(plane).tobytes())

    for (img_id, meta_id) in args.metadata:
        for md in ctx.get_metadata_blocks(img_id):
            if md["item_id"] == meta_id:
                out.write(md["data"])
    out.flush()
    return 0


if __name__ == "__main__":
    sys.exit(main())
