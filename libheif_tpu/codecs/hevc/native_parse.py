"""ctypes bridge to the native C++ HEVC slice parser (hevc_parse.cc).

Drives the same SliceSyntax output as the pure-Python SliceParser
(ctu.py); parse_slice() dispatches to whichever engine is available.
The Python engine stays the conformance anchor — test_hevc_native
difftests the two bin-for-bin over the encoder's feature matrix.
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional, Tuple

import numpy as np

from ...core.error import HeifError, SubError
from ... import native
from .headers import SPS, PPS, SliceHeader
from .cabac import ContextModels
from .ctu import SliceSyntax, SliceParser, TU, SaoParam

# fixed family order shared with hevc_parse.cc (enum CtxFamily)
_FAMILIES = [
    "sao_merge_flag", "sao_type_idx", "split_cu_flag",
    "cu_transquant_bypass_flag", "part_mode", "prev_intra_luma_pred_flag",
    "intra_chroma_pred_mode", "split_transform_flag", "cbf_luma",
    "cbf_chroma", "cu_qp_delta_abs", "transform_skip_flag",
    "last_sig_x_prefix", "last_sig_y_prefix", "coded_sub_block_flag",
    "sig_coeff_flag", "coeff_abs_level_greater1_flag",
    "coeff_abs_level_greater2_flag",
]

_proto_ready = False


def _lib():
    global _proto_ready
    lib = native.get_lib()
    if lib is None:
        return None
    if not _proto_ready:
        lib.tpuheif_hevc_parse_slice.restype = ctypes.c_int
        _proto_ready = True
    return lib


def native_available() -> bool:
    return _lib() is not None


def _params_array(sps: SPS, pps: PPS, sh: SliceHeader) -> np.ndarray:
    pcm = 0
    if sps.pcm_enabled:
        pcm = 1 | (sps.log2_min_pcm_cb_size << 8) | \
            (sps.log2_max_pcm_cb_size << 16)
    vals = [
        sps.pic_width, sps.pic_height, sps.log2_ctb_size,
        sps.log2_min_cb_size, sps.log2_min_tb_size, sps.log2_max_tb_size,
        sps.max_transform_hierarchy_depth_intra,
        int(sps.sample_adaptive_offset_enabled), pcm,
        int(pps.transquant_bypass_enabled),
        int(pps.cu_qp_delta_enabled), pps.diff_cu_qp_delta_depth,
        pps.cb_qp_offset, pps.cr_qp_offset,
        int(pps.transform_skip_enabled),
        int(pps.sign_data_hiding_enabled),
        int(pps.entropy_coding_sync_enabled),
        sh.qp, int(sh.sao_luma), int(sh.sao_chroma),
        sh.cb_qp_offset, sh.cr_qp_offset,
        sps.pic_width_in_ctbs, sps.pic_height_in_ctbs,
        sps.bit_depth_luma, sps.bit_depth_chroma,
    ]
    return np.asarray(vals, dtype=np.int32)


def _alloc_parse_bufs(sps: SPS, pps: PPS, sh: SliceHeader):
    """Scratch buffers the C++ parser fills (allocated up front so a
    pipelined reconstructor can hold them before the parse finishes)."""
    out = SliceSyntax(sps, pps, sh)
    n_ctbs = sps.pic_width_in_ctbs * sps.pic_height_in_ctbs
    # worst-case TU count: every 4x4 luma position + chroma entries
    tu_cap = 2 * out.w4 * out.h4 + 64
    coeff_cap = 2 * sps.pic_width * sps.pic_height + 4096
    tu_meta = np.empty((tu_cap, 10), dtype=np.int32)
    coeff_buf = np.empty(coeff_cap, dtype=np.int32)
    sao_buf = np.zeros((n_ctbs, 20), dtype=np.int16)
    counts = np.zeros(2, dtype=np.int64)
    return out, tu_meta, coeff_buf, sao_buf, counts


def _parse_raw(sps: SPS, pps: PPS, sh: SliceHeader, rbsp: bytes,
               substreams: List[Tuple[int, int]], progress=None,
               bufs=None):
    """Run the native parser; returns (syntax, tu_meta, n_tus, coeff_buf,
    sao_buf) with syntax.tus/sao left raw, or None without the lib.

    progress: optional (row_tu_counts int64[n_ctb_rows], rows_done
    int64[1]) arrays the C engine publishes per-CTB-row TU counts into,
    enabling a concurrent streaming reconstructor (pipelined decode)."""
    lib = _lib()
    if lib is None:
        return None

    if bufs is not None:
        out, tu_meta, coeff_buf, sao_buf, counts = bufs
    else:
        out, tu_meta, coeff_buf, sao_buf, counts = _alloc_parse_bufs(sps,
                                                                     pps, sh)
    w4, h4 = out.w4, out.h4
    tu_cap, coeff_cap = tu_meta.shape[0], coeff_buf.shape[0]

    ctx = ContextModels(0, sh.qp)
    fam = np.asarray([ContextModels.LAYOUT[n][0] for n in _FAMILIES],
                     dtype=np.int32)
    init_p = np.asarray(ctx.p_state, dtype=np.uint8)
    init_m = np.asarray(ctx.val_mps, dtype=np.uint8)

    subs = np.asarray([v for se in substreams for v in se], dtype=np.int64)
    rbsp_arr = np.frombuffer(rbsp, dtype=np.uint8)

    err = ctypes.create_string_buffer(200)

    def ptr(a, t):
        return a.ctypes.data_as(ctypes.POINTER(t))

    # WPP wavefront-parallel entropy decode: rows interleave across
    # worker threads with the spec's 2-column lag (native entry falls
    # back to serial unless pps WPP is on, entry points cover every CTB
    # row, and cu_qp_delta is off).  On a 2-core host the parse/recon
    # pipeline is the better schedule, so this only engages with >= 3
    # cores unless TPUHEIF_HEVC_WPP_THREADS forces it.
    n_workers = 1
    env = os.environ.get("TPUHEIF_HEVC_WPP_THREADS")
    if env is not None:
        n_workers = max(1, int(env))
    else:
        cores = os.cpu_count() or 1
        if cores >= 3 and pps.entropy_coding_sync_enabled:
            n_workers = min(cores - 1, sps.pic_height_in_ctbs)

    if n_workers > 1 and pps.entropy_coding_sync_enabled and \
            not pps.cu_qp_delta_enabled and \
            len(substreams) >= sps.pic_height_in_ctbs:
        entry = lib.tpuheif_hevc_parse_slice_wpp
        extra = (ctypes.c_int32(n_workers),)
    else:
        entry = lib.tpuheif_hevc_parse_slice
        extra = ()

    rc = entry(
        ptr(rbsp_arr, ctypes.c_uint8), ctypes.c_int64(len(rbsp)),
        ptr(_params_array(sps, pps, sh), ctypes.c_int32),
        ptr(fam, ctypes.c_int32),
        ptr(init_p, ctypes.c_uint8), ptr(init_m, ctypes.c_uint8),
        ctypes.c_int32(len(init_p)),
        ptr(subs, ctypes.c_int64), ctypes.c_int32(len(substreams)),
        ptr(out.intra_mode_y, ctypes.c_uint8),
        ptr(out.intra_mode_c, ctypes.c_uint8),
        ptr(out.ct_depth, ctypes.c_uint8),
        ptr(out.cu_log2, ctypes.c_uint8),
        ptr(out.tu_log2, ctypes.c_uint8),
        ptr(out.qp_y, ctypes.c_int16),
        ptr(out.tqb_map, ctypes.c_uint8),
        ptr(out.nonzero_y, ctypes.c_uint8),
        ptr(out.avail, ctypes.c_uint8),
        ctypes.c_int32(w4), ctypes.c_int32(h4),
        ptr(tu_meta, ctypes.c_int32), ctypes.c_int64(tu_cap),
        ptr(coeff_buf, ctypes.c_int32), ctypes.c_int64(coeff_cap),
        ptr(sao_buf, ctypes.c_int16),
        ptr(counts, ctypes.c_int64),
        err, ctypes.c_int32(len(err)),
        ptr(progress[0], ctypes.c_int64) if progress else None,
        ptr(progress[1], ctypes.c_int64) if progress else None,
        *extra)

    if rc == 2:
        raise HeifError.unsupported(SubError.Unsupported_codec,
                                    err.value.decode() or "unsupported")
    if rc != 0:
        raise HeifError.invalid_input(
            msg=err.value.decode() or "HEVC slice parse failed")

    return out, tu_meta, int(counts[0]), coeff_buf, sao_buf


def _unpack_sao(out: SliceSyntax, sao_buf, sps: SPS, sh: SliceHeader):
    if sps.sample_adaptive_offset_enabled and (sh.sao_luma or sh.sao_chroma):
        n_cols = sps.pic_width_in_ctbs
        for cy in range(sps.pic_height_in_ctbs):
            for cx in range(n_cols):
                e = sao_buf[cy * n_cols + cx]
                sp = SaoParam()
                sp.type_idx = [int(e[0]), int(e[1]), int(e[2])]
                sp.offsets = [[int(e[3 + c * 4 + i]) for i in range(4)]
                              for c in range(3)]
                sp.band_pos = [int(e[15]), int(e[16]), int(e[17])]
                sp.eo_class = [int(e[18]), int(e[19])]
                out.sao[(cx, cy)] = sp


def parse_slice_native(sps: SPS, pps: PPS, sh: SliceHeader, rbsp: bytes,
                       substreams: List[Tuple[int, int]]
                       ) -> Optional[SliceSyntax]:
    """Parse via the C++ engine into a full SliceSyntax (TU objects +
    SAO dict); None when the native lib is missing."""
    raw = _parse_raw(sps, pps, sh, rbsp, substreams)
    if raw is None:
        return None
    out, tu_meta, n_tus, coeff_buf, sao_buf = raw
    for i in range(n_tus):
        m = tu_meta[i]
        coeffs = None
        if m[9] >= 0:
            size = 1 << int(m[2])
            coeffs = coeff_buf[int(m[9]):int(m[9]) + size * size] \
                .reshape(size, size).copy()
        out.tus.append(TU(
            x=int(m[0]), y=int(m[1]), log2=int(m[2]), c_idx=int(m[3]),
            pred_mode=int(m[4]), qp=int(m[5]), qg_serial=int(m[6]),
            transform_skip=bool(m[7]), tqb=bool(m[8]), coeffs=coeffs))
    _unpack_sao(out, sao_buf, sps, sh)
    return out


def parse_picture_raw(sps: SPS, pps: PPS, sh: SliceHeader, rbsp: bytes,
                      substreams: List[Tuple[int, int]]):
    """Native parse for the device reconstructor: returns
    (SliceSyntax with maps+SAO but NO TU objects, cols (N,8) int32
    [x y log2 c mode qp ts tqb], coeff_buf, offs) — the flat-array
    form device_recon.build_plan consumes.  None without the lib."""
    raw = _parse_raw(sps, pps, sh, rbsp, substreams)
    if raw is None:
        return None
    out, tu_meta, n_tus, coeff_buf, sao_buf = raw
    cols = np.ascontiguousarray(
        tu_meta[:n_tus][:, [0, 1, 2, 3, 4, 5, 7, 8]], np.int32)
    offs = tu_meta[:n_tus, 9].astype(np.int64)
    # trim the scratch coefficient buffer to its used length (it is
    # over-allocated and the tail is uninitialized)
    has = offs >= 0
    if has.any():
        used = int((offs[has] + (1 << (2 * cols[has, 2].astype(np.int64)))
                    ).max())
    else:
        used = 0
    coeff_buf = np.ascontiguousarray(coeff_buf[:used])
    _unpack_sao(out, sao_buf, sps, sh)
    return out, cols, coeff_buf, offs


def parse_slice(sps: SPS, pps: PPS, sh: SliceHeader, rbsp: bytes,
                substreams: List[Tuple[int, int]],
                ref_pocs_l0=None, cur_poc: int = 0) -> SliceSyntax:
    """Native when available, else the pure-Python reference parser.
    P slices always use the Python parser (the native engine is
    intra-only so far)."""
    if sh.slice_type == 2 and not sps.scaling_list_enabled:
        syn = parse_slice_native(sps, pps, sh, rbsp, substreams)
        if syn is not None:
            return syn
    return SliceParser(sps, pps, sh, rbsp, substreams,
                       ref_pocs_l0=ref_pocs_l0, cur_poc=cur_poc).parse()


# ---------------------------------------------------------------- recon

_recon_tables = None


def _get_recon_tables():
    """int32 copies of the authoritative Python tables for the native
    reconstructor (tables.py stays the single source of truth)."""
    global _recon_tables
    if _recon_tables is None:
        from .tables import DCT, DST4, INTRA_PRED_ANGLE, INTRA_INV_ANGLE
        from .filters import BETA_TABLE, TC_TABLE
        pred_angle = np.zeros(35, np.int32)
        inv_angle = np.zeros(35, np.int32)
        for mode in range(2, 35):
            a = INTRA_PRED_ANGLE[mode]
            pred_angle[mode] = a
            if a < 0:
                inv_angle[mode] = INTRA_INV_ANGLE[a]
        _recon_tables = dict(
            dst4=np.ascontiguousarray(DST4, np.int32),
            dct4=np.ascontiguousarray(DCT[4], np.int32),
            dct8=np.ascontiguousarray(DCT[8], np.int32),
            dct16=np.ascontiguousarray(DCT[16], np.int32),
            dct32=np.ascontiguousarray(DCT[32], np.int32),
            beta=np.ascontiguousarray(BETA_TABLE, np.int32),
            tc=np.ascontiguousarray(TC_TABLE, np.int32),
            pred_angle=pred_angle, inv_angle=inv_angle)
    return _recon_tables


def decode_picture_native(sps: SPS, pps: PPS, sh: SliceHeader, rbsp: bytes,
                          substreams: List[Tuple[int, int]]):
    """Full native decode: parse + recon + deblock + SAO without
    materializing Python TU objects.  Returns (Y, Cb, Cr) int32 planes
    or None when the native lib is missing.

    The two C engines run PIPELINED on two threads (ctypes releases the
    GIL): the parser publishes per-CTB-row TU counts with release
    stores; the reconstructor consumes rows as they land (the shape of
    libde265's frontend/worker split, reference:
    libde265/decctx.cc thread-task decoding, done here as a 2-stage
    stream instead of a CTB-task pool)."""
    import os
    import threading
    if sps.scaling_list_enabled:
        return None     # scaling matrices: the Python engine handles it
    lib = _lib()
    if lib is None:
        return None
    lib.tpuheif_hevc_recon.restype = ctypes.c_int

    pipelined = os.environ.get("TPUHEIF_HEVC_PIPELINE", "1") != "0"
    if not pipelined:
        raw = _parse_raw(sps, pps, sh, rbsp, substreams)
        out, tu_meta, n_tus, coeff_buf, sao_buf = raw
        progress = None
    else:
        bufs = _alloc_parse_bufs(sps, pps, sh)
        out, tu_meta, coeff_buf, sao_buf, counts = bufs
        n_rows = sps.pic_height_in_ctbs
        row_counts = np.zeros(n_rows, np.int64)
        rows_done = np.zeros(1, np.int64)
        progress = (row_counts, rows_done)
        parse_box = {}

        def _parse_worker():
            try:
                parse_box["res"] = _parse_raw(sps, pps, sh, rbsp,
                                              substreams,
                                              progress=progress, bufs=bufs)
            except Exception as e:  # noqa: BLE001 — re-raised after join
                parse_box["exc"] = e
            finally:
                # never leave the streaming consumer blocked
                rows_done[0] = n_rows

        parse_thread = threading.Thread(target=_parse_worker,
                                        name="hevc-parse")
        parse_thread.start()
        n_tus = 0  # streaming mode: final count comes from row_counts

    sao_present = int(sps.sample_adaptive_offset_enabled and
                      (sh.sao_luma or sh.sao_chroma))
    rparams = np.asarray([
        sps.pic_width, sps.pic_height, sps.log2_ctb_size,
        sps.bit_depth_luma, sps.bit_depth_chroma,
        int(sps.strong_intra_smoothing),
        int(sh.deblocking_filter_disabled),
        sh.beta_offset_div2 * 2, sh.tc_offset_div2 * 2,
        pps.cb_qp_offset, pps.cr_qp_offset, sao_present,
    ], dtype=np.int32)

    t = _get_recon_tables()
    y = np.zeros((sps.pic_height, sps.pic_width), np.uint16)
    cb = np.zeros((sps.pic_height >> 1, sps.pic_width >> 1), np.uint16)
    cr = np.zeros_like(cb)
    err = ctypes.create_string_buffer(200)

    def ptr(a, ty):
        return a.ctypes.data_as(ctypes.POINTER(ty))

    rc = lib.tpuheif_hevc_recon(
        ptr(rparams, ctypes.c_int32),
        ptr(tu_meta, ctypes.c_int32), ctypes.c_int64(n_tus),
        ptr(coeff_buf, ctypes.c_int32),
        ptr(out.tu_log2, ctypes.c_uint8),
        ptr(out.cu_log2, ctypes.c_uint8),
        ptr(out.qp_y, ctypes.c_int16),
        ptr(out.tqb_map, ctypes.c_uint8),
        ctypes.c_int32(out.w4), ctypes.c_int32(out.h4),
        ptr(sao_buf, ctypes.c_int16),
        ptr(t["dst4"], ctypes.c_int32), ptr(t["dct4"], ctypes.c_int32),
        ptr(t["dct8"], ctypes.c_int32), ptr(t["dct16"], ctypes.c_int32),
        ptr(t["dct32"], ctypes.c_int32),
        ptr(t["beta"], ctypes.c_int32), ptr(t["tc"], ctypes.c_int32),
        ptr(t["pred_angle"], ctypes.c_int32),
        ptr(t["inv_angle"], ctypes.c_int32),
        ptr(y, ctypes.c_uint16), ptr(cb, ctypes.c_uint16),
        ptr(cr, ctypes.c_uint16),
        ctypes.c_int32(1), err, ctypes.c_int32(len(err)),
        ptr(progress[0], ctypes.c_int64) if progress else None,
        ptr(progress[1], ctypes.c_int64) if progress else None,
        ctypes.c_int32(sps.pic_height_in_ctbs if progress else 0))
    if progress is not None:
        parse_thread.join()
        if "exc" in parse_box:
            raise parse_box["exc"]
    if rc != 0:
        raise HeifError.invalid_input(
            msg=err.value.decode() or "HEVC reconstruction failed")
    return y, cb, cr
