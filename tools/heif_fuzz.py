"""Randomized mutation fuzzer for the decode path.

The Python-native analog of the reference's libFuzzer harnesses
(reference: fuzzing/file_fuzzer.cc, box_fuzzer.cc, tile_fuzzer.cc:21-25
with seed corpora + dictionaries): seeds from the reference fixture
corpus are mutated (bit flips, truncations, length-field edits, chunk
duplication/splices) and fed through parse → interpret → decode under
tight security limits.  A "crash" is any exception that is NOT a
HeifError (our typed error taxonomy) — i.e. the engine must fail
cleanly on arbitrary garbage — or a wall-clock hang.

Usage:
    python tools/heif_fuzz.py                 # unbounded loop
    python tools/heif_fuzz.py -n 500 -s 1234  # bounded, deterministic
    python tools/heif_fuzz.py --corpus DIR    # extra seeds
"""

from __future__ import annotations

import argparse
import glob
import os
import signal
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_DATA = "/root/reference/tests/data"
REF_FUZZ = "/root/reference/fuzzing/data"

_FOURCC_POOL = [b"ftyp", b"meta", b"mdat", b"iloc", b"iinf", b"infe",
                b"iprp", b"ipco", b"ipma", b"ispe", b"hvcC", b"av1C",
                b"uncC", b"cmpd", b"grid", b"iref", b"dimg", b"moov",
                b"trak", b"stbl", b"mini", b"\x00\x00\x00\x00",
                b"\xff\xff\xff\xff"]


def load_corpus(extra=None):
    paths = []
    for d in [REF_DATA, REF_FUZZ, extra]:
        if d and os.path.isdir(d):
            for pat in ("*.heif", "*.heic", "*.avif", "*"):
                paths.extend(glob.glob(os.path.join(d, "**", pat),
                                       recursive=True))
                if paths:
                    break
    seeds = []
    for p in sorted(set(paths)):
        try:
            if os.path.isfile(p) and os.path.getsize(p) < 4 << 20:
                with open(p, "rb") as f:
                    seeds.append(f.read())
        except OSError:
            pass
    return seeds


def mutate(data: bytes, rng: np.random.Generator) -> bytes:
    """One random structural or byte-level mutation."""
    buf = bytearray(data)
    n = len(buf)
    kind = rng.integers(0, 8)
    if n == 0 or kind == 0:          # random bytes appended
        return bytes(buf) + rng.integers(0, 256, int(rng.integers(1, 64)),
                                         dtype=np.uint8).tobytes()
    if kind == 1:                     # truncate
        return bytes(buf[:int(rng.integers(0, n))])
    if kind == 2:                     # byte flips
        for _ in range(int(rng.integers(1, 16))):
            buf[int(rng.integers(0, n))] = int(rng.integers(0, 256))
        return bytes(buf)
    if kind == 3:                     # 32-bit length-field edit
        pos = int(rng.integers(0, max(1, n - 4)))
        val = int(rng.choice(np.array([0, 1, 7, 8, 0x7fffffff,
                                       0xffffffff, n, n * 2])))
        buf[pos:pos + 4] = val.to_bytes(4, "big")
        return bytes(buf)
    if kind == 4:                     # fourcc splice
        pos = int(rng.integers(0, max(1, n - 4)))
        buf[pos:pos + 4] = _FOURCC_POOL[int(rng.integers(
            0, len(_FOURCC_POOL)))]
        return bytes(buf)
    if kind == 5:                     # chunk duplication
        a = int(rng.integers(0, n))
        b = min(n, a + int(rng.integers(4, 256)))
        pos = int(rng.integers(0, n))
        return bytes(buf[:pos]) + bytes(buf[a:b]) + bytes(buf[pos:])
    if kind == 6:                     # chunk deletion
        a = int(rng.integers(0, n))
        b = min(n, a + int(rng.integers(1, 128)))
        return bytes(buf[:a]) + bytes(buf[b:])
    # kind == 7: zero a run
    a = int(rng.integers(0, n))
    b = min(n, a + int(rng.integers(1, 64)))
    for i in range(a, b):
        buf[i] = 0
    return bytes(buf)


def run_one(data: bytes, deadline_s: float = 20.0) -> str:
    """Returns 'ok', 'heif-error', or raises on a genuine bug."""
    from libheif_tpu.core.error import HeifError
    from libheif_tpu.core.limits import SecurityLimits
    from libheif_tpu.context import HeifContext
    from libheif_tpu.items.item import DecodingOptions

    limits = SecurityLimits(
        max_image_size_pixels=1024 * 1024,
        max_number_of_tiles=256,
        max_items=50,
        max_memory_block_size=64 << 20,
        max_total_memory=256 << 20,
        max_sequence_frames=64,
    )
    t0 = time.monotonic()

    def cancel():
        return time.monotonic() - t0 > deadline_s

    try:
        ctx = HeifContext.read_from_bytes(data, limits)
        opts = DecodingOptions(cancel=cancel)
        pid = ctx.primary_id
        if pid is not None and pid in ctx.items:
            ctx.decode_image(pid, options=opts)
        # also walk every item's metadata/type surface
        for iid in list(ctx.items)[:8]:
            try:
                ctx.decode_image(iid, options=opts)
            except HeifError:
                pass
        return "ok"
    except HeifError:
        return "heif-error"
    except RecursionError:
        return "heif-error"   # bounded by the interpreter; acceptable


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=0,
                    help="iterations (0 = unbounded)")
    ap.add_argument("-s", "--seed", type=int, default=None)
    ap.add_argument("--corpus", default=None)
    ap.add_argument("--deadline", type=float, default=20.0)
    args = ap.parse_args()

    # fuzz on the CPU backend: first-compile latency over the TPU relay
    # (~20-40s per program shape) would read as false hangs
    import jax
    jax.config.update("jax_platforms", "cpu")

    seeds = load_corpus(args.corpus)
    if not seeds:
        print("no corpus seeds found", file=sys.stderr)
        return 1
    rng = np.random.default_rng(args.seed)
    print(f"corpus: {len(seeds)} seeds")
    i = 0
    t_start = time.time()
    while args.n == 0 or i < args.n:
        seed = seeds[int(rng.integers(0, len(seeds)))]
        data = seed
        for _ in range(int(rng.integers(1, 4))):
            data = mutate(data, rng)
        t0 = time.monotonic()
        try:
            run_one(data, args.deadline)
        except Exception as e:   # noqa: BLE001 — this IS the finding
            path = f"/tmp/heif_fuzz_crash_{i}.bin"
            with open(path, "wb") as f:
                f.write(data)
            print(f"CRASH at iter {i}: {type(e).__name__}: {e}\n"
                  f"  reproducer: {path}")
            raise
        dt = time.monotonic() - t0
        if dt > args.deadline:
            path = f"/tmp/heif_fuzz_hang_{i}.bin"
            with open(path, "wb") as f:
                f.write(data)
            print(f"HANG at iter {i} ({dt:.1f}s): reproducer {path}")
            return 2
        i += 1
        if i % 100 == 0:
            rate = i / (time.time() - t_start)
            print(f"{i} iters, {rate:.1f}/s")
    print(f"done: {i} iterations, no crashes")
    return 0


if __name__ == "__main__":
    sys.exit(main())
