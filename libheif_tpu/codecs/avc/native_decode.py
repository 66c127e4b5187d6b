"""Native (C) fast path for AVC intra-frame decode.

Drives native/src/avc_native.cc — a bit-exact port of the Python
engine in mb.py/deblock.py (itself replacing the reference's
libheif/plugins/decoder_openh264.cc boundary).  The C core holds no
global state: all per-frame decoder state (per-MB flags, qp map, intra
mode map, coded-block flags, planes) lives in numpy arrays owned here,
so multi-slice frames just issue one C call per slice over the same
arrays, exactly like SliceDecoder instances persisting across
decode_slice calls.

Enable/disable with TPUHEIF_AVC_NATIVE (default on when the native
library builds).
"""

from __future__ import annotations

import ctypes
import os
from typing import Dict, List, Optional

import numpy as np

from ...core.error import HeifError
from . import headers as H
from . import tables as T

_MS_N = 8  # per-MB state stride in the C core (avc_native.cc enum)


def native_enabled() -> bool:
    if os.environ.get("TPUHEIF_AVC_NATIVE", "1") == "0":
        return False
    try:
        from ...native import available
        return available()
    except Exception:   # noqa: BLE001 — fall back to the Python engine
        return False


_lib = None


def _get_lib():
    global _lib
    if _lib is None:
        from ...native import get_lib
        _lib = get_lib()
        fn = _lib.tpuheif_avc_decode_slice
        fn.restype = ctypes.c_int64
        _lib.tpuheif_avc_deblock.restype = None
    return _lib


def _i32(a) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(a, np.int32).reshape(-1))


def _pi32(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _pu8(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _pu16(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16))


class _Tables:
    """Flattened table set shared by every decode (built once)."""

    def __init__(self):
        self.sig8 = _i32(T.SIG_CTX_8X8)
        self.last8 = _i32(T.LAST_CTX_8X8)
        self.zz4 = _i32(T.ZIGZAG_4X4)
        self.zz8 = _i32(T.ZIGZAG_8X8)
        self.ls4 = _i32(T.LEVEL_SCALE_4)
        self.ls8 = _i32(T.LEVEL_SCALE_8)
        self.chroma_qp = _i32(T.CHROMA_QP)
        self.alpha = np.ascontiguousarray(
            np.asarray(T.DEBLOCK_ALPHA, np.uint8))
        self.beta = np.ascontiguousarray(
            np.asarray(T.DEBLOCK_BETA, np.uint8))
        self.tc0_col2 = _i32(T.DEBLOCK_TC0[:, 2])


_tables: Optional[_Tables] = None


class NativeFrame:
    """Per-frame decode state mirroring mb.py SliceDecoder fields."""

    def __init__(self, sps: H.SPS, pps: H.PPS):
        global _tables
        if _tables is None:
            _tables = _Tables()
        self.sps = sps
        self.pps = pps
        self.mb_w = sps.pic_width_in_mbs
        self.mb_h = sps.pic_height_in_map_units
        self.mono = sps.chroma_format_idc == 0
        n_mb = self.mb_w * self.mb_h
        self.mb_state = np.zeros(n_mb * _MS_N, np.int32)
        self.mb_qp = np.zeros(n_mb, np.int32)
        self.i4_modes = np.zeros((self.mb_h * 4) * (self.mb_w * 4),
                                 np.int32)
        self.cbf_luma = np.zeros((self.mb_h * 4) * (self.mb_w * 4),
                                 np.uint8)
        self.cbf_luma_dc = np.zeros(n_mb, np.uint8)
        self.cbf_cdc = np.zeros(2 * n_mb, np.uint8)
        self.cbf_cac = np.zeros(2 * (self.mb_h * 2) * (self.mb_w * 2),
                                np.uint8)
        self.y = np.zeros((self.mb_h * 16, self.mb_w * 16), np.uint16)
        if self.mono:
            self.cb = np.zeros(1, np.uint16)
            self.cr = np.zeros(1, np.uint16)
        else:
            self.cb = np.zeros((self.mb_h * 8, self.mb_w * 8), np.uint16)
            self.cr = np.zeros((self.mb_h * 8, self.mb_w * 8), np.uint16)
        self.decoded_mbs = 0

    def decode_slice(self, hdr: H.SliceHeader, rbsp: bytes) -> None:
        lib = _get_lib()
        tb = _tables
        start_byte = (hdr.header_bits + 7) // 8
        ps, vm = T.init_cabac_states(hdr.qp)
        p_state = np.asarray(ps, np.uint8)
        val_mps = np.asarray(vm, np.uint8)
        params = np.array([self.mb_w, self.mb_h, int(self.mono), hdr.qp,
                           hdr.first_mb,
                           int(self.pps.transform_8x8_mode),
                           self.pps.chroma_qp_offset(0),
                           self.pps.chroma_qp_offset(1)], np.int64)
        err = ctypes.create_string_buffer(256)
        buf = np.frombuffer(rbsp, np.uint8)
        n = lib.tpuheif_avc_decode_slice(
            _pu8(buf), ctypes.c_int64(len(rbsp)),
            ctypes.c_int64(start_byte),
            params.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            _pu8(p_state), _pu8(val_mps),
            _pi32(tb.sig8), _pi32(tb.last8), _pi32(tb.zz4),
            _pi32(tb.zz8), _pi32(tb.ls4), _pi32(tb.ls8),
            _pi32(tb.chroma_qp),
            _pi32(self.mb_state), _pi32(self.mb_qp),
            _pi32(self.i4_modes), _pu8(self.cbf_luma),
            _pu8(self.cbf_luma_dc), _pu8(self.cbf_cdc),
            _pu8(self.cbf_cac), _pu16(self.y), _pu16(self.cb),
            _pu16(self.cr), err, ctypes.c_int64(256))
        if n < 0:
            raise HeifError.invalid_input(
                msg="AVC native decode: " +
                err.value.decode("ascii", "replace"))
        self.decoded_mbs = int(n)

    @property
    def all_decoded(self) -> bool:
        flags = self.mb_state.reshape(-1, _MS_N)[:, 0]
        return bool(flags.all())

    def deblock(self, a_off: int, b_off: int) -> None:
        lib = _get_lib()
        tb = _tables
        params = np.array([self.mb_w, self.mb_h, int(self.mono),
                           a_off, b_off, self.pps.chroma_qp_offset(0),
                           self.pps.chroma_qp_offset(1)], np.int64)
        lib.tpuheif_avc_deblock(
            params.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            _pi32(self.mb_state), _pi32(self.mb_qp),
            _pu8(tb.alpha), _pu8(tb.beta), _pi32(tb.tc0_col2),
            _pi32(tb.chroma_qp), _pu16(self.y), _pu16(self.cb),
            _pu16(self.cr))


def decode_intra_frame_native(
        nals: List[bytes]) -> Optional[Dict[str, np.ndarray]]:
    """Native counterpart of decoder.decode_intra_frame.  Returns None
    when no decodable slice is present (caller raises)."""
    sps_map: Dict[int, H.SPS] = {}
    pps_map: Dict[int, H.PPS] = {}
    frame: Optional[NativeFrame] = None
    hdr0 = None
    hdr_last = None
    for nal in nals:
        if not nal:
            continue
        t = H.nal_type(nal)
        if t == H.NAL_SPS:
            s = H.parse_sps(nal)
            sps_map[s.seq_parameter_set_id] = s
        elif t == H.NAL_PPS:
            p = H.parse_pps(nal, sps_map)
            pps_map[p.pic_parameter_set_id] = p
        elif t in (H.NAL_SLICE_IDR, H.NAL_SLICE_NON_IDR):
            hdr, sps, pps, rbsp = H.parse_slice_header(nal, sps_map,
                                                       pps_map)
            if not pps.entropy_coding_mode:
                return None     # CAVLC: the Python engine handles it
            if sps.bit_depth_luma != 8 or sps.chroma_format_idc > 1:
                from ...core.error import SubError
                raise HeifError.unsupported(
                    SubError.Unsupported_bit_depth,
                    "only 8-bit 4:2:0/monochrome AVC supported")
            if frame is None:
                frame = NativeFrame(sps, pps)
                hdr0 = hdr
            frame.decode_slice(hdr, rbsp)
            hdr_last = hdr
            if frame.all_decoded:
                break
    if frame is None:
        return None
    if hdr0 is None or hdr0.disable_deblocking_filter_idc != 1:
        h = hdr_last
        frame.deblock(h.slice_alpha_c0_offset if h else 0,
                      h.slice_beta_offset if h else 0)
    sps = frame.sps
    w, h = sps.width, sps.height
    x0 = sps.crop_left * (2 if sps.chroma_format_idc == 1 else 1)
    y0 = sps.crop_top * (2 if sps.chroma_format_idc == 1 else 1)
    out = {"Y": frame.y[y0:y0 + h, x0:x0 + w].astype(np.uint8)}
    if not frame.mono:
        cw, ch = (w + 1) // 2, (h + 1) // 2
        cx, cy = x0 // 2, y0 // 2
        out["U"] = frame.cb[cy:cy + ch, cx:cx + cw].astype(np.uint8)
        out["V"] = frame.cr[cy:cy + ch, cx:cx + cw].astype(np.uint8)
    return out
