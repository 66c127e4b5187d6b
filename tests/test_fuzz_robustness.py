"""Fuzz-style robustness tests — the deterministic analog of the
reference's libFuzzer harnesses (ref: fuzzing/file_fuzzer.cc,
box_fuzzer.cc, tile_fuzzer.cc:21-25; CMakeLists.txt:663).

Seeded byte mutations over the real fixture corpus and our own encoder
output.  The invariant: the library NEVER crashes, hangs, or raises
anything but HeifError on malformed input, and security limits bound
resource use before allocation (ref: decoder.h:108-125).
"""

import glob
import os
import zlib

import numpy as np
import pytest

from libheif_tpu import api
from libheif_tpu.boxes.box import read_all_boxes
from libheif_tpu.core.error import HeifError
from libheif_tpu.core.limits import SecurityLimits
from libheif_tpu.image.pixel_image import (PixelImage, Channel, Colorspace,
                                           Chroma)

CORPUS = sorted(
    glob.glob("/root/reference/tests/data/*.heif") +
    glob.glob("/root/reference/tests/data/*.avif") +
    glob.glob("/root/reference/tests/data/*.heic"))[:24]

MUTATIONS_PER_FILE = 12


def _try_full_decode(data, limits=None):
    """file_fuzzer equivalent: open, enumerate, decode everything."""
    try:
        ctx = api.HeifContext.read_from_bytes(data, limits=limits) \
            if limits is not None else api.HeifContext.read_from_bytes(data)
        for iid in ctx.top_level_image_ids():
            try:
                ctx.decode_image(iid)
            except HeifError:
                pass
        for t in ctx.tracks:
            try:
                t.decode_next_image()
            except HeifError:
                pass
    except HeifError:
        pass
    except RecursionError:
        pytest.fail("RecursionError escaped box-depth limit")


@pytest.mark.parametrize("path", CORPUS, ids=os.path.basename)
def test_mutated_corpus_never_crashes(path):
    base = open(path, "rb").read()
    rng = np.random.default_rng(
        zlib.crc32(os.path.basename(path).encode()))
    for k in range(MUTATIONS_PER_FILE):
        data = bytearray(base)
        kind = k % 4
        if kind == 0:      # point mutations
            for _ in range(rng.integers(1, 8)):
                data[rng.integers(0, len(data))] = rng.integers(0, 256)
        elif kind == 1:    # truncation
            data = data[: rng.integers(1, len(data))]
        elif kind == 2:    # size-field corruption (first 64 box headers)
            pos = int(rng.integers(0, min(len(data), 512) - 4))
            data[pos:pos + 4] = rng.integers(0, 256, 4, np.uint8).tobytes()
        else:              # splice two ranges
            a = int(rng.integers(0, len(data)))
            b = int(rng.integers(0, len(data)))
            lo, hi = min(a, b), max(a, b)
            data = data[:lo] + data[hi:]
        _try_full_decode(bytes(data))


def test_box_fuzzer_parse_and_dump():
    """box_fuzzer equivalent: random box soup -> parse + dump."""
    rng = np.random.default_rng(1234)
    fourccs = [b"ftyp", b"meta", b"iloc", b"iinf", b"iprp", b"ipco",
               b"ispe", b"hvcC", b"av1C", b"grid", b"mini", b"moov",
               b"trak", b"stbl", b"stsz", b"saiz", b"saio", b"tref",
               b"uuid", b"free", b"XXXX"]
    for _ in range(200):
        n = int(rng.integers(1, 5))
        blob = bytearray()
        for _ in range(n):
            payload = rng.integers(0, 256,
                                   int(rng.integers(0, 64)),
                                   np.uint8).tobytes()
            size = 8 + len(payload)
            if rng.integers(0, 10) == 0:
                size = int(rng.integers(0, 2**31))   # lying size field
            blob += size.to_bytes(4, "big")
            blob += fourccs[int(rng.integers(0, len(fourccs)))]
            blob += payload
        try:
            boxes = read_all_boxes(bytes(blob))
            for b in boxes:
                b.dump()
        except HeifError:
            pass
        except RecursionError:
            pytest.fail("RecursionError escaped box-depth limit")


def test_deep_nesting_bounded():
    """Box recursion must be depth-limited (ref: box.cc
    kMaxRecursionDepth)."""
    inner = b""
    for _ in range(200):
        inner = (len(inner) + 8).to_bytes(4, "big") + b"meta" + inner
    try:
        read_all_boxes(inner)
    except HeifError:
        pass


def test_million_tile_grid_hits_limits_not_memory():
    """tile_fuzzer equivalent (ref: tile_fuzzer.cc:21-25): a synthetic
    grid declaring a huge tile matrix must fail via security limits
    before allocating the output."""
    # grid payload: version 0, flags, rows-1=255, cols-1=255, w, h
    grid_payload = bytes([0, 1]) + bytes([255, 255]) + \
        (65536).to_bytes(4, "big") + (65536).to_bytes(4, "big")
    ctx = api.heif_context_alloc()
    enc = api.heif_context_get_encoder_for_format(ctx, "unci")
    img = PixelImage(8, 8, Colorspace.RGB, Chroma.C444)
    for ch in (Channel.R, Channel.G, Channel.B):
        img.set_plane(ch, np.zeros((8, 8), np.uint8), 8)
    tile_id = ctx.encode_image(img, "unci")
    grid_id = ctx.file.add_new_item("grid").item_id
    ctx.file.append_item_data(grid_id, grid_payload, construction_method=1)
    ctx.file.add_reference("dimg", grid_id, [tile_id] * 4)
    from libheif_tpu.boxes.meta import Box_ispe
    ctx.file.add_property(grid_id, Box_ispe(65536, 65536), False)
    data = ctx.write()

    ctx2 = api.HeifContext.read_from_bytes(data)
    with pytest.raises(HeifError):
        ctx2.decode_image(grid_id)


def test_security_limit_sweep_on_valid_file():
    """Tight limits must produce HeifError, never crashes."""
    path = "/root/reference/tests/data/uncompressed_comp_RGB_tiled.heif"
    data = open(path, "rb").read()
    for kwargs in ({"max_items": 1},
                   {"max_image_size_pixels": 16},
                   {"max_memory_block_size": 64},
                   {"max_number_of_tiles": 1}):
        try:
            limits = SecurityLimits(**kwargs)
        except TypeError:
            continue
        _try_full_decode(data, limits=limits)


def test_encoder_fuzzer_random_params():
    """encoder_fuzzer equivalent: random images x random options."""
    rng = np.random.default_rng(77)
    from libheif_tpu.option_types import EncodingOptions
    for trial in range(6):
        w = int(rng.integers(1, 70))
        h = int(rng.integers(1, 70))
        img = PixelImage(w, h, Colorspace.YCbCr, Chroma.C420)
        img.set_plane(Channel.Y, rng.integers(0, 256, (h, w), np.uint8), 8)
        cw, chh = (w + 1) // 2, (h + 1) // 2
        img.set_plane(Channel.Cb,
                      rng.integers(0, 256, (chh, cw), np.uint8), 8)
        img.set_plane(Channel.Cr,
                      rng.integers(0, 256, (chh, cw), np.uint8), 8)
        fmt = ["hevc", "av1", "unci"][trial % 3]
        opts = EncodingOptions(quality=int(rng.integers(0, 101)),
                               lossless=bool(rng.integers(0, 2)))
        ctx = api.heif_context_alloc()
        try:
            ctx.encode_image(img, fmt, opts)
            out = ctx.write()
            api.HeifContext.read_from_bytes(out).decode_image()
        except HeifError:
            pass
