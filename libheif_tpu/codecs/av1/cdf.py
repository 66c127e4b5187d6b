"""AV1 default CDF tables and per-tile adaptive context.

Tables are extracted from the system libaom by tools/extract_av1_cdfs.py
(default_cdfs.npz; values equal the spec's "Default CDF Tables"
appendix — several verified verbatim against libdav1d as well).
Rows use the inverse convention: icdf[i] = 32768 − cdf[i], trailing
adaptation counter slot. Stored per-context as mutable Python lists so
symbol adaptation (msac.py) is cheap.
"""

from __future__ import annotations

import os
from typing import Dict, List

import numpy as np

_NPZ = os.path.join(os.path.dirname(__file__), "default_cdfs.npz")
_defaults: Dict[str, np.ndarray] = {}


def _load():
    global _defaults
    if not _defaults:
        with np.load(_NPZ) as z:
            _defaults = {k: z[k].astype(np.int64) for k in z.files}
    return _defaults


def _to_lists(arr) -> list:
    if arr.ndim == 1:
        return arr.tolist()
    return [_to_lists(a) for a in arr]


class CdfContext:
    """One tile's adaptive CDF state (re-initialised from defaults)."""

    def __init__(self, base_q_idx: int):
        d = _load()
        # quantizer-dependent coefficient table set (spec §8.2.2):
        if base_q_idx <= 20:
            q = 0
        elif base_q_idx <= 60:
            q = 1
        elif base_q_idx <= 120:
            q = 2
        else:
            q = 3
        self.txb_skip = _to_lists(d["txb_skip"][q])          # [5][13]
        self.eob_extra = _to_lists(d["eob_extra"][q])        # [5][2][9]
        self.dc_sign = _to_lists(d["dc_sign"][q])            # [2][3]
        self.eob_pt = {
            16: _to_lists(d["eob_pt_16"][q]),                # [2][2]
            32: _to_lists(d["eob_pt_32"][q]),
            64: _to_lists(d["eob_pt_64"][q]),
            128: _to_lists(d["eob_pt_128"][q]),
            256: _to_lists(d["eob_pt_256"][q]),
            512: _to_lists(d["eob_pt_512"][q]),
            1024: _to_lists(d["eob_pt_1024"][q]),
        }
        self.coeff_base_eob = _to_lists(d["coeff_base_eob"][q])  # [5][2][4]
        self.coeff_base = _to_lists(d["coeff_base"][q])      # [5][2][42]
        self.coeff_br = _to_lists(d["coeff_br"][q])          # [5][2][21]
        self.kf_y_mode = _to_lists(d["kf_y_mode"])           # [5][5]
        self.y_mode = _to_lists(d["y_mode"])                 # [4]
        self.uv_mode = _to_lists(d["uv_mode"])               # [2][13]
        self.partition = _to_lists(d["partition"])           # [20]
        self.intra_ext_tx = _to_lists(d["intra_ext_tx"])     # [3][4][13]
        self.cfl_alpha = _to_lists(d["cfl_alpha"])           # [6]
        self.cfl_sign = list(int(v) for v in d["cfl_sign"])
        self.filter_intra_use = _to_lists(d["filter_intra_use"])  # [22]
        # filter_intra_mode default row: fitted empirically (see
        # tests/av1_lossy_difftest.py filter-intra cases)
        self.filter_intra_mode = list(d["filter_intra_mode"]) \
            if "filter_intra_mode" in d else [26214, 19661, 13107, 6554, 0, 0]
        self.tx_size = _to_lists(d["tx_size"])               # [4][3]
        self.angle_delta = _to_lists(d["angle_delta"])       # [8]
        self.skip = _to_lists(d["skip"])                     # [3]
        self.delta_q = _to_lists(d["delta_q"])
        self.palette_y_size = _to_lists(d["palette_y_size"])
        self.palette_uv_size = _to_lists(d["palette_uv_size"])
        self.palette_y_mode = _to_lists(d["palette_y_mode"])
        self.palette_uv_mode = _to_lists(d["palette_uv_mode"])
        # loop-restoration CDFs (spec Default CDF Tables:
        # default_switchable_restore_cdf = CDF3(9413, 22581),
        # default_wiener_restore_cdf = CDF2(11570),
        # default_sgrproj_restore_cdf = CDF2(16855); icdf convention)
        self.restore_switchable = [32768 - 9413, 32768 - 22581, 0, 0]
        self.restore_wiener = [32768 - 11570, 0, 0]
        self.restore_sgrproj = [32768 - 16855, 0, 0]
