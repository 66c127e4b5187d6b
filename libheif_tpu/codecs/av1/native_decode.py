"""ctypes bridge to the native C++ AV1 frame decoder (av1_native.cc).

Python stays the single source of truth for the tables: the default
CDF set (default_cdfs.npz via cdf.CdfContext) and the prediction
tables are flattened into one int32 buffer whose layout is mirrored by
av1_native.cc (CDF_SIZES / EXTRA_SIZES).  The pure-Python TileDecoder
remains the conformance anchor — tests/test_av1_native.py difftests
the two engines plane-for-plane over the encoder feature matrix and
the libaom conformance fixtures.

Replaces the external decode boundary of the reference (reference:
libheif/plugins/decoder_dav1d.cc:457, decoder_aom.cc:446).
"""

from __future__ import annotations

import ctypes
from typing import Dict, Optional

import numpy as np

from ... import native
from ...core.error import HeifError
from . import tables as T
from .cdf import CdfContext, _load

_proto_ready = False
_cdf_cache: Dict[int, np.ndarray] = {}


def _lib():
    global _proto_ready
    lib = native.get_lib()
    if lib is None:
        return None
    if not _proto_ready:
        try:
            lib.tpuheif_av1_decode_frame.restype = ctypes.c_int
        except AttributeError:
            return None
        _proto_ready = True
    return lib


def native_available() -> bool:
    return _lib() is not None


def _q_bucket(base_q_idx: int) -> int:
    if base_q_idx <= 20:
        return 0
    if base_q_idx <= 60:
        return 1
    if base_q_idx <= 120:
        return 2
    return 3


def _flatten_cdf_buf(base_q_idx: int) -> np.ndarray:
    """Serialize the default CDFs + pred tables in the fixed order
    shared with av1_native.cc (CDF_SIZES/EXTRA_SIZES)."""
    q = _q_bucket(base_q_idx)
    if q in _cdf_cache:
        return _cdf_cache[q]
    c = CdfContext(base_q_idx)
    d = _load()

    def arr(x):
        return np.asarray(x, np.int32).ravel()

    parts = [
        arr(c.txb_skip), arr(c.eob_extra), arr(c.dc_sign),
        arr(c.eob_pt[16]), arr(c.eob_pt[32]), arr(c.eob_pt[64]),
        arr(c.eob_pt[128]), arr(c.eob_pt[256]), arr(c.eob_pt[512]),
        arr(c.eob_pt[1024]),
        arr(c.coeff_base_eob), arr(c.coeff_base), arr(c.coeff_br),
        arr(c.kf_y_mode), arr(c.uv_mode), arr(c.partition),
        arr(c.intra_ext_tx), arr(c.cfl_sign), arr(c.cfl_alpha),
        arr(c.filter_intra_use), arr(c.filter_intra_mode),
        arr(c.tx_size), arr(c.angle_delta), arr(c.skip),
        arr(c.palette_y_mode), arr(c.palette_uv_mode),
        arr(c.palette_y_size), arr(c.palette_uv_size),
        arr(c.palette_y_color), arr(c.palette_uv_color),
        arr(c.restore_switchable), arr(c.restore_wiener),
        arr(c.restore_sgrproj),
        # intrabc / inter-tx tables (av1_native.cc CDF_SIZES tail)
        arr(c.intrabc), arr(c.txfm_partition), arr(c.dv_joints),
        arr(c.dv_sign), arr(c.dv_classes), arr(c.dv_class0),
        arr(c.dv_bits), arr(c.inter_ext_tx),
        # pred tables (extras)
        arr(d["sm_weights"]), arr(d["dr_intra_derivative"]),
        arr(d["filter_intra_taps"]),
    ]
    buf = np.ascontiguousarray(np.concatenate(parts), np.int32)
    _cdf_cache[q] = buf
    return buf


def _params_array(seq, fh) -> np.ndarray:
    mi_cols = (fh.frame_width + 7) // 8 * 2
    mi_rows = (fh.frame_height + 7) // 8 * 2

    def pad8(lst):
        out = list(lst) + [0] * (8 - len(lst))
        return out[:8]

    vals = [
        mi_cols, mi_rows, fh.frame_width, fh.frame_height,
        seq.bit_depth, seq.subsampling_x, seq.subsampling_y,
        int(seq.monochrome), int(seq.use_128x128_superblock),
        fh.quant.base_q_idx,
        fh.quant.delta_q_y_dc, fh.quant.delta_q_u_dc, fh.quant.delta_q_u_ac,
        fh.quant.delta_q_v_dc, fh.quant.delta_q_v_ac,
        int(fh.coded_lossless), int(fh.tx_mode_select),
        int(fh.reduced_tx_set), int(fh.allow_screen_content_tools),
        int(seq.enable_filter_intra), int(seq.enable_intra_edge_filter),
        int(seq.enable_cdef), int(fh.allow_intrabc),
        int(fh.disable_cdf_update), int(fh.delta_q_present),
        fh.cdef.damping, fh.cdef.bits,
        *pad8(fh.cdef.y_pri), *pad8(fh.cdef.y_sec),
        *pad8(fh.cdef.uv_pri), *pad8(fh.cdef.uv_sec),
        *list(fh.lr_type), *list(fh.lr_unit_size),
        *list(fh.loop_filter_levels), fh.loop_filter_sharpness,
        int(fh.loop_filter_delta_enabled), fh.loop_filter_ref_deltas[0],
        # bit-depth-matched dequant lookups (spec 7.12.2) so the C
        # engine needs no embedded 10/12-bit tables
        *T.dc_qlookup(seq.bit_depth).tolist(),
        *T.ac_qlookup(seq.bit_depth).tolist(),
    ]
    return np.asarray(vals, dtype=np.int32)


def decode_frame_native(seq, fh, tiles) -> Optional[Dict[str, np.ndarray]]:
    """Decode one intra frame fully natively (parse + recon + in-loop
    filters).  tiles: list of tile byte strings in raster order.
    Returns the cropped plane dict like decoder.finish_frame, or None
    when the native lib is missing / the stream uses an unsupported
    feature (caller falls back to the Python engine)."""
    lib = _lib()
    if lib is None:
        return None
    if seq.bit_depth not in (8, 10, 12) or fh.delta_q_present:
        return None
    mi_cols = (fh.frame_width + 7) // 8 * 2
    mi_rows = (fh.frame_height + 7) // 8 * 2
    sb_mi = 32 if seq.use_128x128_superblock else 16
    ti = fh.tile_info

    tile_bytes = b"".join(tiles)
    meta = []
    off = 0
    idx = 0
    for trow in range(ti.rows):
        for tcol in range(ti.cols):
            mc0 = ti.col_starts[tcol] * sb_mi
            mc1 = min(ti.col_starts[tcol + 1] * sb_mi, mi_cols)
            mr0 = ti.row_starts[trow] * sb_mi
            mr1 = min(ti.row_starts[trow + 1] * sb_mi, mi_rows)
            size = len(tiles[idx])
            meta += [off, size, mc0, mc1, mr0, mr1]
            off += size
            idx += 1
    meta_arr = np.asarray(meta, np.int64)
    tiles_arr = np.frombuffer(tile_bytes, np.uint8) if tile_bytes \
        else np.zeros(1, np.uint8)

    params = _params_array(seq, fh)
    cdf_buf = _flatten_cdf_buf(fh.quant.base_q_idx)

    pw, ph = mi_cols * 4, mi_rows * 4
    ssx, ssy = seq.subsampling_x, seq.subsampling_y
    out_dt = np.uint8 if seq.bit_depth <= 8 else np.uint16
    y = np.zeros((ph, pw), out_dt)
    if seq.monochrome:
        u = v = np.zeros(1, out_dt)
    else:
        u = np.zeros((ph >> ssy, pw >> ssx), out_dt)
        v = np.zeros_like(u)
    err = ctypes.create_string_buffer(200)

    def ptr(a, t):
        return a.ctypes.data_as(ctypes.POINTER(t))

    rc = lib.tpuheif_av1_decode_frame(
        ptr(tiles_arr, ctypes.c_uint8), ctypes.c_longlong(len(tile_bytes)),
        ptr(meta_arr, ctypes.c_longlong), ctypes.c_int(len(meta) // 6),
        ptr(params, ctypes.c_int32), ctypes.c_int(len(params)),
        ptr(cdf_buf, ctypes.c_int32), ctypes.c_longlong(len(cdf_buf)),
        ptr(y, ctypes.c_uint8), ptr(u, ctypes.c_uint8),
        ptr(v, ctypes.c_uint8),
        err, ctypes.c_int(len(err)))
    if rc == 2:
        return None          # unsupported feature: Python engine handles it
    if rc != 0:
        raise HeifError.invalid_input(
            msg=err.value.decode() or "AV1 native decode failed")

    w, h = fh.frame_width, fh.frame_height
    if seq.monochrome:
        return {"Y": y[:h, :w]}
    cw = (w + (1 << ssx) - 1) >> ssx
    ch = (h + (1 << ssy) - 1) >> ssy
    return {"Y": y[:h, :w], "U": u[:ch, :cw], "V": v[:ch, :cw]}
