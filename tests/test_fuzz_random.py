"""Bounded randomized fuzz run (deterministic seed) — the in-suite
slice of tools/heif_fuzz.py, modeled on the reference's libFuzzer
harnesses + seed corpora (reference: fuzzing/file_fuzzer.cc,
tile_fuzzer.cc:21-25).  Any non-HeifError exception or hang is a bug.
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, "tools")

from heif_fuzz import load_corpus, mutate, run_one  # noqa: E402


@pytest.fixture(scope="module")
def corpus():
    seeds = load_corpus()
    if not seeds:
        pytest.skip("reference corpus not available")
    return seeds


def test_fuzz_200_mutations(corpus):
    rng = np.random.default_rng(20260820)
    for i in range(200):
        data = corpus[int(rng.integers(0, len(corpus)))]
        for _ in range(int(rng.integers(1, 4))):
            data = mutate(data, rng)
        # raises on any non-HeifError escape
        run_one(data, deadline_s=60.0)


def test_fuzz_headers_only(corpus):
    """First-bytes truncations of every seed (the classic parser
    minefield)."""
    for seed in corpus[:40]:
        for cut in (0, 1, 7, 8, 9, 16, 64, len(seed) // 2):
            run_one(seed[:cut], deadline_s=60.0)


def test_fuzz_zero_and_random():
    rng = np.random.default_rng(7)
    run_one(b"", 60.0)
    run_one(b"\x00" * 1024, 60.0)
    run_one(rng.integers(0, 256, 4096, dtype=np.uint8).tobytes(), 60.0)
