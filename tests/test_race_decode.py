"""Concurrent-decode race test (reference: tests/test-race.go).

The reference decodes the same image from many goroutines under the Go
race detector (issue #147 regression).  The Python analog: hammer one
shared HeifContext from a thread pool and assert every decode returns
bit-identical pixels, and that concurrent open+decode of separate
contexts over the same bytes is stable too."""

import os
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import pytest

DATA = os.path.join(os.path.dirname(__file__), "..", "..",
                    "reference", "tests", "data")


def _fixture(name):
    p = os.path.join(DATA, name)
    if not os.path.exists(p):
        pytest.skip(f"fixture {name} not present")
    return p


class TestRaceDecode:

    N_THREADS = 12
    N_ITER = 6

    def test_same_context_parallel_decode(self):
        from libheif_tpu.api import HeifContext
        from libheif_tpu.image.pixel_image import Channel
        ctx = HeifContext.read_from_file(
            _fixture("uncompressed_pix_RGB.heif"))
        pid = ctx.primary_item_id
        golden = np.asarray(ctx.decode_image(pid).plane(Channel.R))
        errors = []
        barrier = threading.Barrier(self.N_THREADS)

        def worker():
            try:
                barrier.wait(timeout=30)
                for _ in range(self.N_ITER):
                    img = ctx.decode_image(pid)
                    got = np.asarray(img.plane(Channel.R))
                    if not np.array_equal(got, golden):
                        errors.append("pixel mismatch")
            except Exception as e:  # noqa: BLE001
                errors.append(repr(e))

        with ThreadPoolExecutor(self.N_THREADS) as pool:
            list(pool.map(lambda _: worker(), range(self.N_THREADS)))
        assert not errors, errors[:3]

    def test_same_context_mixed_items(self):
        """Concurrent decode of different items + metadata queries on
        one context (the reference race hit shared decoder state)."""
        from libheif_tpu.api import HeifContext
        ctx = HeifContext.read_from_file(
            os.path.join(os.path.dirname(DATA), "..", "examples",
                         "example.heic"))
        ids = ctx.top_level_image_ids()
        errors = []

        def worker(i):
            try:
                iid = ids[i % len(ids)]
                img = ctx.decode_image(iid)
                info = ctx.get_image_info(iid)
                if (img.width, img.height) != (info["width"],
                                               info["height"]):
                    errors.append("size mismatch")
            except Exception as e:  # noqa: BLE001
                errors.append(repr(e))

        with ThreadPoolExecutor(self.N_THREADS) as pool:
            list(pool.map(worker, range(self.N_THREADS * 2)))
        assert not errors, errors[:3]

    def test_parallel_contexts_same_bytes(self):
        from libheif_tpu.api import HeifContext
        from libheif_tpu.image.pixel_image import Channel
        data = open(_fixture("uncompressed_comp_RGB.heif"), "rb").read()
        ref_ctx = HeifContext.read_from_bytes(data)
        golden = np.asarray(
            ref_ctx.decode_image(ref_ctx.primary_item_id)
            .plane(Channel.G))
        errors = []

        def worker(_):
            try:
                c = HeifContext.read_from_bytes(data)
                got = np.asarray(
                    c.decode_image(c.primary_item_id).plane(Channel.G))
                if not np.array_equal(got, golden):
                    errors.append("pixel mismatch")
            except Exception as e:  # noqa: BLE001
                errors.append(repr(e))

        with ThreadPoolExecutor(self.N_THREADS) as pool:
            list(pool.map(worker, range(self.N_THREADS * 2)))
        assert not errors, errors[:3]

    def test_parallel_encode_decode_roundtrip(self):
        """Concurrent encoders must not corrupt each other's output."""
        from libheif_tpu.api import HeifContext, EncodingOptions
        from libheif_tpu.image.pixel_image import (PixelImage, Channel,
                                                   Colorspace, Chroma)
        errors = []

        def worker(seed):
            try:
                rng = np.random.default_rng(seed)
                arr = rng.integers(0, 256, (32, 48), dtype=np.uint8)
                img = PixelImage(48, 32, Colorspace.RGB, Chroma.C444)
                for ch in (Channel.R, Channel.G, Channel.B):
                    img.set_plane(ch, arr, 8)
                ctx = HeifContext()
                ctx.encode_image(img, fmt="unci",
                                 options=EncodingOptions())
                data = ctx.write()
                back = HeifContext.read_from_bytes(data)
                out = back.decode_image(back.primary_item_id)
                if not np.array_equal(np.asarray(out.plane(Channel.R)),
                                      arr):
                    errors.append(f"seed {seed} mismatch")
            except Exception as e:  # noqa: BLE001
                errors.append(repr(e))

        with ThreadPoolExecutor(8) as pool:
            list(pool.map(worker, range(16)))
        assert not errors, errors[:3]
