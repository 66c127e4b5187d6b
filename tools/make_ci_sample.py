"""Write a small HEIF sample for CI binding smokes (no corpus files in
the CI checkout — the C shim examples need a real decodable input).

Usage: python tools/make_ci_sample.py out.heif
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

from libheif_tpu.context import HeifContext
from libheif_tpu.image.pixel_image import (Channel, Chroma, Colorspace,
                                           PixelImage)


def main(path: str) -> None:
    rng = np.random.default_rng(7)
    h, w = 96, 128
    y = rng.integers(0, 256, (h, w)).astype(np.uint8)
    u = np.full((h // 2, w // 2), 100, np.uint8)
    v = np.full((h // 2, w // 2), 160, np.uint8)
    img = PixelImage(w, h, Colorspace.YCbCr, Chroma.C420)
    img.set_plane(Channel.Y, y, 8)
    img.set_plane(Channel.Cb, u, 8)
    img.set_plane(Channel.Cr, v, 8)
    ctx = HeifContext()
    ctx.new_file()
    iid = ctx.encode_image(img, "hevc")
    ctx.set_primary_item(iid)
    ctx.write_to_file(path)
    print(f"wrote {path}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "sample.heif")
