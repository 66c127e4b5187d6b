#!/usr/bin/env python3
"""heif-thumbnailer equivalent (reference: examples/heif_thumbnailer.cc)
— extract or generate a thumbnail PNG of the requested size.

Uses an embedded thumbnail item when one is present and large enough
(ref: heif_image_handle_get_list_of_thumbnail_IDs); otherwise decodes
the primary image and scales it down.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    ap = argparse.ArgumentParser(prog="heif-thumbnailer")
    ap.add_argument("input")
    ap.add_argument("output", help="output thumbnail (.png)")
    ap.add_argument("-s", "--size", type=int, default=512,
                    help="max edge length of the thumbnail (default 512)")
    args = ap.parse_args(argv)

    import jax
    jax.config.update("jax_platforms",
                      os.environ.get("LIBHEIF_TPU_DEVICE", "cpu"))
    import numpy as np
    from libheif_tpu.api import HeifContext
    from libheif_tpu.image.pixel_image import Channel, Colorspace, Chroma
    from libheif_tpu import io as hio

    ctx = HeifContext.read_from_file(args.input)
    primary = ctx.get_item(ctx.primary_item_id)

    # prefer an embedded thumbnail that is >= the requested size
    # (ref: heif_thumbnailer.cc thumbnail selection)
    source_id = ctx.primary_item_id
    for thumb in getattr(primary, "thumbnails", []):
        tw, th = thumb.width_height()
        if max(tw, th) >= args.size:
            source_id = thumb.item_id
            break

    img = ctx.decode_image(source_id)
    rgb = ctx._convert_output(img, Colorspace.RGB, Chroma.C444, None) \
        if img.colorspace != Colorspace.RGB else img

    scale = args.size / max(rgb.width, rgb.height)
    if scale < 1.0:
        nw = max(1, round(rgb.width * scale))
        nh = max(1, round(rgb.height * scale))
        rgb = rgb.scale_nearest(nw, nh)

    planes = [rgb.plane(Channel.R), rgb.plane(Channel.G),
              rgb.plane(Channel.B)]
    if rgb.has_channel(Channel.Alpha):
        planes.append(rgb.plane(Channel.Alpha))
    arr = np.dstack([np.asarray(p) for p in planes]).astype(np.uint8)
    with open(args.output, "wb") as f:
        f.write(hio.write_png(arr))
    print(f"wrote {args.output} ({rgb.width}x{rgb.height})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
