"""Verify H.265 constant tables against the system libde265 binary.

The CABAC tables are ITU-T H.265 spec constants; libde265 (installed as
a shared library) embeds the identical values, so we cross-check our
hardcoded copies byte-for-byte where the binary is present.
"""

import os
import struct

import numpy as np
import pytest

from libheif_tpu.codecs.hevc import tables

_SO = "/lib/x86_64-linux-gnu/libde265.so.0"


def _so_bytes():
    if not os.path.exists(_SO):
        pytest.skip("libde265 binary not available")
    return open(_SO, "rb").read()


class TestCabacEngineTables:
    def test_range_tab_lps_matches_binary(self):
        data = _so_bytes()
        pat = bytes([128, 176, 208, 240, 128, 167, 197, 227])
        off = data.find(pat)
        assert off > 0
        binary = np.frombuffer(data[off:off + 256],
                               dtype=np.uint8).reshape(64, 4)
        np.testing.assert_array_equal(tables.RANGE_TAB_LPS, binary)

    def test_trans_idx_lps_matches_binary(self):
        data = _so_bytes()
        pat = bytes([0, 0, 1, 2, 2, 4, 4, 5])
        off = data.find(pat)
        assert off > 0
        binary = np.frombuffer(data[off:off + 64], dtype=np.uint8)
        np.testing.assert_array_equal(tables.TRANS_IDX_LPS, binary)

    def test_trans_idx_mps(self):
        assert tables.TRANS_IDX_MPS[0] == 1
        assert tables.TRANS_IDX_MPS[61] == 62
        assert tables.TRANS_IDX_MPS[62] == 62
        assert tables.TRANS_IDX_MPS[63] == 63


class TestInitValues:
    def _find_u32(self, data, seq):
        pat = struct.pack(f"<{len(seq)}I", *seq)
        return data.find(pat)

    @pytest.mark.parametrize("name", [
        "split_cu_flag", "split_transform_flag", "cbf_chroma",
        "last_sig_coeff_prefix", "coded_sub_block_flag", "sig_coeff_flag",
        "coeff_abs_level_greater1_flag", "coeff_abs_level_greater2_flag",
        "part_mode", "prev_intra_luma_pred_flag", "intra_chroma_pred_mode",
    ])
    def test_table_embedded_in_binary(self, name):
        """Each flattened table (all init types concatenated) must appear
        verbatim as a u32 array in the libde265 binary."""
        data = _so_bytes()
        rows = tables.INIT_VALUES[name]
        flat = [v for row in rows if row for v in row]
        assert self._find_u32(data, flat) > 0, name

    def test_state_init_derivation(self):
        # spec example: initValue 154 at any QP → pState 0, MPS 1
        # wait: 154 → slope=(9)*5-45=0, offset=(10<<3)-16=64 → pre=64
        # → valMps=1, pState=0
        assert tables.init_context_state(154, 26) == (0, 1)
        # derivation is QP-dependent for non-flat values
        s0 = tables.init_context_state(139, 20)
        s1 = tables.init_context_state(139, 40)
        assert s0 != s1


class TestTransforms:
    def test_dct_orthogonality(self):
        for n, m in tables.DCT.items():
            mf = m.astype(np.float64)
            gram = mf @ mf.T
            off = gram - np.diag(np.diag(gram))
            # H.265 integer DCT is near-orthogonal; +-1 rounding of the
            # basis accumulates to a few hundred in 16/32-pt off-diagonals
            assert np.abs(off).max() <= 400, f"size {n}"
            np.testing.assert_allclose(np.diag(gram),
                                       np.full(n, gram[0, 0]), rtol=0.01)

    def test_dct_matches_cosines(self):
        for n, m in tables.DCT.items():
            k = np.arange(n)[:, None]
            j = np.arange(n)[None, :]
            ref = np.cos(np.pi * k * (2 * j + 1) / (2 * n)) * 64 * np.sqrt(2)
            ref[0] /= np.sqrt(2)
            assert np.abs(m - ref).max() < 2.0, f"size {n}"

    def test_dst4(self):
        mf = tables.DST4.astype(np.float64)
        gram = mf @ mf.T
        assert np.abs(gram - np.diag(np.diag(gram))).max() <= 32

    def test_scan_orders(self):
        d = tables.diag_scan(4)
        assert d.shape == (16, 2)
        assert tuple(d[0]) == (0, 0)
        assert tuple(d[1]) == (0, 1)
        assert tuple(d[2]) == (1, 0)
        assert tuple(d[3]) == (0, 2)
        assert tuple(d[15]) == (3, 3)
        # every position exactly once
        assert len({tuple(p) for p in d}) == 16

    def test_chroma_qp(self):
        assert tables.chroma_qp(20) == 20
        assert tables.chroma_qp(30) == 29
        assert tables.chroma_qp(43) == 37
        assert tables.chroma_qp(45) == 39
