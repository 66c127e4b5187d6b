"""HEVC still-image decoder: glue from hvcC+NALs to PixelImage.

Replaces the reference's libde265 plugin boundary (reference:
libheif/plugins/decoder_libde265.cc:479-521, codecs/hevc_dec.cc).
"""

from __future__ import annotations

from typing import List, Optional, Tuple  # noqa: F401

import numpy as np

from ...core.error import HeifError, SubError
from ...boxes.codec_cfg import remove_emulation_prevention
from ...image.pixel_image import PixelImage, Channel, Colorspace, Chroma
from ..registry import Decoder, register_decoder
from . import headers as H
from .headers import nal_type
from .native_parse import parse_slice
from .recon import IntraReconstructor
from .filters import Deblocker, apply_sao


def split_length_prefixed(data: bytes, length_size: int) -> List[bytes]:
    """hvcC-style length-prefixed NAL stream → NAL list
    (ref: nalu_utils.cc length-prefix handling)."""
    out = []
    pos = 0
    n = len(data)
    while pos + length_size <= n:
        ln = int.from_bytes(data[pos:pos + length_size], "big")
        pos += length_size
        if ln == 0 or pos + ln > n:
            break
        out.append(data[pos:pos + ln])
        pos += ln
    return out


def _substreams(nal: bytes, rbsp: bytes, data_offset_bits: int,
                entry_offsets: List[int]) -> List[Tuple[int, int]]:
    """WPP substream (byte_start, byte_end) ranges within the RBSP.

    entry_point offsets count bytes in the raw NAL (incl. emulation
    prevention, spec §7.4.7.1); convert to RBSP positions by
    subtracting the EPBs inside each range (vectorized cumulative map).
    """
    data_start = data_offset_bits // 8
    if not entry_offsets:
        return [(data_start, len(rbsp))]
    from ...boxes.codec_cfg import emulation_prevention_positions
    payload = nal[2:]
    epb = np.asarray(emulation_prevention_positions(payload), np.int64)
    n = len(payload)
    # raw→rbsp: count of non-EPB bytes strictly before each raw index
    is_epb = np.zeros(n + 1, np.int64)
    if len(epb):
        is_epb[epb] = 1
    raw_to_rbsp = np.concatenate(([0], np.cumsum(1 - is_epb[:-1])))
    # rbsp→raw for the data start: index of the (data_start+1)-th
    # non-EPB byte
    keep = np.nonzero(is_epb[:n] == 0)[0]
    raw_data_start = int(keep[data_start])

    bounds_raw = [raw_data_start]
    acc = raw_data_start
    for off in entry_offsets:
        acc += off
        if acc > n:   # corrupt/truncated: offsets past the payload
            raise HeifError.invalid_input(
                msg="WPP entry point offset beyond slice data")
        bounds_raw.append(acc)
    bounds_raw.append(n)
    subs = []
    for k in range(len(bounds_raw) - 1):
        s = int(raw_to_rbsp[bounds_raw[k]])
        e = int(raw_to_rbsp[bounds_raw[k + 1]])
        subs.append((s, e))
    return subs


def check_picture_supported(sps: H.SPS, pps: H.PPS,
                            slice_nals: List[bytes]) -> None:
    if pps.tiles_enabled:
        raise HeifError.unsupported(SubError.Unsupported_codec,
                                    "HEVC tiles not yet supported")
    if sps.chroma_format_idc != 1:
        raise HeifError.unsupported(SubError.Unsupported_codec,
                                    "only 4:2:0 supported currently")
    if sps.bit_depth_luma not in (8, 10, 12) or \
            sps.bit_depth_chroma != sps.bit_depth_luma:
        raise HeifError.unsupported(
            SubError.Unsupported_bit_depth,
            "bit depth %d/%d not supported (8/10/12-bit equal-depth only)"
            % (sps.bit_depth_luma, sps.bit_depth_chroma))


def parse_intra_picture(sps: H.SPS, pps: H.PPS, slice_nals: List[bytes]):
    """Entropy-decode one intra picture → SliceSyntax (host side)."""
    check_picture_supported(sps, pps, slice_nals)
    nal = slice_nals[0]
    sh = H.parse_slice_header(nal, sps, {pps.pps_id: pps})
    rbsp = remove_emulation_prevention(nal[2:])
    subs = _substreams(nal, rbsp, sh.data_offset_bits, sh.entry_point_offsets)
    return parse_slice(sps, pps, sh, rbsp, subs)


def decode_intra_picture(sps: H.SPS, pps: H.PPS, slice_nals: List[bytes],
                         engine: Optional[str] = None
                         ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode one intra picture from its slice NALs → (Y, Cb, Cr).

    engine: "native" (host C++), "python" (numpy reference), "device"
    (TPU wavefront pipeline, device_recon.py), or None/"auto" (env var
    LIBHEIF_TPU_HEVC_ENGINE, falling back native → python)."""
    import os
    if engine is None:
        engine = os.environ.get("LIBHEIF_TPU_HEVC_ENGINE", "auto")
    check_picture_supported(sps, pps, slice_nals)

    nal = slice_nals[0]
    sh = H.parse_slice_header(nal, sps, {pps.pps_id: pps})
    rbsp = remove_emulation_prevention(nal[2:])
    subs = _substreams(nal, rbsp, sh.data_offset_bits, sh.entry_point_offsets)

    if engine in ("native", "auto") and len(slice_nals) == 1:
        # fully-native fast path: parse + recon + filters in C++ without
        # per-TU Python objects (single-slice pictures)
        from .native_parse import decode_picture_native
        planes = decode_picture_native(sps, pps, sh, rbsp, subs)
        if planes is not None:
            return planes
        if engine == "native":
            raise HeifError.unsupported(SubError.Unsupported_codec,
                                        "native engine unavailable")

    if engine == "device" and sps.scaling_list_enabled:
        # the TU-batched device dequant is flat-matrix; scaling-list
        # streams decode on the Python engine
        engine = "python"
    if engine == "device":
        from .device_recon import decode_pictures_device
        from .native_parse import parse_picture_raw
        raw = parse_picture_raw(sps, pps, sh, rbsp, subs)
        if raw is not None:
            syn, cols, coeff, offs = raw
            return decode_pictures_device(
                [syn], raw_tus=[(cols, coeff, offs)])[0]
        syntax = parse_slice(sps, pps, sh, rbsp, subs)
        return decode_pictures_device([syntax])[0]

    if len(slice_nals) > 1:
        syntax = _parse_multi_slice(sps, pps, slice_nals)
    else:
        syntax = parse_slice(sps, pps, sh, rbsp, subs)

    recon = IntraReconstructor(syntax)
    y, cb, cr = recon.run()

    Deblocker(syntax, (y, cb, cr)).run()
    y, cb, cr = apply_sao(syntax, (y, cb, cr))
    return y, cb, cr


def _parse_multi_slice(sps: H.SPS, pps: H.PPS, slice_nals: List[bytes]):
    """Parse a multi-slice picture into one shared SliceSyntax: each
    independent slice segment decodes its CTB range with same-slice
    availability (spec 6.4.1/7.3.6.1)."""
    from .ctu import SliceParser
    syntax = None
    next_ctb = 0
    n_ctbs = sps.pic_width_in_ctbs * sps.pic_height_in_ctbs
    for idx, nal in enumerate(slice_nals):
        sh = H.parse_slice_header(nal, sps, {pps.pps_id: pps})
        if sh.dependent_slice:
            raise HeifError.unsupported(SubError.Unsupported_codec,
                                        "dependent slice segments")
        start = sh.segment_address if not sh.first_slice_in_pic else 0
        if start != next_ctb:
            raise HeifError.invalid_input(
                msg=f"slice segment address {start}, expected {next_ctb}")
        rbsp = remove_emulation_prevention(nal[2:])
        subs = _substreams(nal, rbsp, sh.data_offset_bits,
                           sh.entry_point_offsets)
        parser = SliceParser(sps, pps, sh, rbsp, subs, out=syntax,
                             slice_idx=idx, start_ctb=start)
        syntax = parser.parse()
        next_ctb = getattr(syntax, "last_ctb", n_ctbs - 1) + 1
    if next_ctb != n_ctbs:
        raise HeifError.invalid_input(
            msg=f"slices cover {next_ctb}/{n_ctbs} CTBs")
    return syntax


class SequenceDecoder:
    """Stateful HEVC sequence decoder (I + P slices): POC derivation
    (spec 8.3.1), DPB of reconstructed pictures, reference list
    construction from the short-term RPS (spec 8.3.2/8.3.4).

    Replaces the reference's push/flush/pull plugin boundary for video
    tracks (reference: libheif/codecs/decoder.h:132-149,
    sequences/track_visual.cc:175)."""

    def __init__(self, sps: H.SPS, pps: H.PPS):
        self.sps = sps
        self.pps = pps
        self.dpb = {}               # poc -> (y, cb, cr) int32 planes
        self.motion = {}            # poc -> ColMotion (TMVP source)
        self.prev_poc = 0

    def _poc(self, sh: H.SliceHeader, nal_t: int) -> int:
        if nal_t in (19, 20):       # IDR
            return 0
        max_lsb = 1 << self.sps.log2_max_pic_order_cnt_lsb
        prev_lsb = self.prev_poc & (max_lsb - 1)
        prev_msb = self.prev_poc - prev_lsb
        lsb = sh.poc_lsb
        if lsb < prev_lsb and prev_lsb - lsb >= max_lsb // 2:
            msb = prev_msb + max_lsb
        elif lsb > prev_lsb and lsb - prev_lsb > max_lsb // 2:
            msb = prev_msb - max_lsb
        else:
            msb = prev_msb
        return msb + lsb

    @staticmethod
    def _rps_pocs(rps, poc):
        """(st_curr_before, st_curr_after) absolute POCs."""
        before, after = [], []
        acc = 0
        for d, used in zip(rps.delta_poc_s0, rps.used_s0):
            acc -= d
            if used:
                before.append(poc + acc)
        acc = 0
        for d, used in zip(rps.delta_poc_s1, rps.used_s1):
            acc += d
            if used:
                after.append(poc + acc)
        return before, after

    def decode_nal(self, nal: bytes):
        """Decode one slice NAL; returns (poc, (y, cb, cr))."""
        from .ctu import SliceParser
        t = nal_type(nal)
        sh = H.parse_slice_header(nal, self.sps, {self.pps.pps_id: self.pps})
        poc = self._poc(sh, t)
        if t in (19, 20):           # IDR: fresh DPB
            self.dpb.clear()
            self.motion.clear()

        ref_pocs = []
        refs = []
        ref_pocs_l1 = []
        refs_l1 = []
        if sh.slice_type != 2:
            if sh.rps is None:
                raise HeifError.invalid_input(
                    msg="inter slice without a reference picture set")
            before, after = self._rps_pocs(sh.rps, poc)

            def build(init_list, n, rplm):
                if not init_list:
                    raise HeifError.invalid_input(
                        msg="inter slice with an empty reference list")
                if rplm is not None:
                    pocs = [init_list[i] for i in rplm]
                else:
                    pocs = [init_list[i % len(init_list)]
                            for i in range(n)]
                planes = []
                for p in pocs:
                    if p not in self.dpb:
                        raise HeifError.invalid_input(
                            msg=f"reference picture POC {p} not in DPB")
                    planes.append(self.dpb[p])
                return pocs, planes

            # RefPicListTemp0 = StCurrBefore + StCurrAfter (spec 8.3.4)
            ref_pocs, refs = build(before + after, sh.num_ref_idx_l0,
                                   sh.rplm_l0)
            if sh.slice_type == 0:   # B: RefPicListTemp1 = After + Before
                ref_pocs_l1, refs_l1 = build(after + before,
                                             sh.num_ref_idx_l1,
                                             sh.rplm_l1)

        rbsp = remove_emulation_prevention(nal[2:])
        subs = _substreams(nal, rbsp, sh.data_offset_bits,
                           sh.entry_point_offsets)
        if sh.slice_type == 2 and not self.dpb:
            # pure intra picture: the fast native engine is usable
            planes = None
            from .native_parse import decode_picture_native
            planes = decode_picture_native(self.sps, self.pps, sh, rbsp,
                                           subs)
            if planes is not None:
                y, cb, cr = (np.asarray(p, np.int32) for p in planes)
                self._store(poc, (y, cb, cr))
                return poc, (y, cb, cr)
        col_motion = None
        if sh.temporal_mvp and sh.slice_type != 2:
            # collocated picture (spec 8.5.3.2.8): list per
            # collocated_from_l0, index collocated_ref_idx
            col_list = ref_pocs if sh.collocated_from_l0 else ref_pocs_l1
            if sh.collocated_ref_idx < len(col_list):
                col_motion = self.motion.get(col_list[sh.collocated_ref_idx])
        syntax = SliceParser(self.sps, self.pps, sh, rbsp, subs,
                             ref_pocs_l0=ref_pocs, cur_poc=poc,
                             ref_pocs_l1=ref_pocs_l1,
                             col_motion=col_motion).parse()
        recon = IntraReconstructor(syntax, refs=refs, refs_l1=refs_l1)
        y, cb, cr = recon.run()
        Deblocker(syntax, (y, cb, cr)).run()
        y, cb, cr = apply_sao(syntax, (y, cb, cr))
        self._store(poc, (y, cb, cr), nal_t=t)
        from .ctu import ColMotion
        self.motion[poc] = ColMotion.from_syntax(syntax, poc)
        self.motion = {p: m for p, m in self.motion.items()
                       if p in self.dpb}
        return poc, (y, cb, cr)

    def _store(self, poc, planes, nal_t: int = 1):
        self.dpb[poc] = planes
        # prevTid0Pic (spec 8.3.1): sub-layer non-reference pictures
        # (even NAL types <= 14: TRAIL_N, TSA_N, …) do not anchor the
        # POC MSB derivation
        if not (nal_t <= 14 and nal_t % 2 == 0):
            self.prev_poc = poc
        # bounded DPB: keep the 8 most recent pictures by POC
        while len(self.dpb) > 8:
            del self.dpb[min(self.dpb)]


def extract_stream(config_box, data: bytes):
    """hvcC + item payload → (sps, pps, slice NAL list)."""
    if config_box is None:
        raise HeifError.invalid_input(SubError.No_hvcC_box)
    sps = pps = None
    for nal in config_box.get_header_nals():
        t = H.nal_type(nal)
        if t == H.NAL_SPS:
            sps = H.parse_sps(nal)
        elif t == H.NAL_PPS:
            pps = H.parse_pps(nal)
    nals = split_length_prefixed(data, config_box.length_size)
    slices = []
    for nal in nals:
        t = H.nal_type(nal)
        if t == H.NAL_SPS:
            sps = H.parse_sps(nal)
        elif t == H.NAL_PPS:
            pps = H.parse_pps(nal)
        elif H.is_slice(t):
            slices.append(nal)
    if sps is None or pps is None:
        raise HeifError.invalid_input(SubError.No_hvcC_box,
                                      "missing SPS/PPS")
    return sps, pps, slices


def crop_to_conformance(sps: H.SPS, y, cb, cr):
    """Apply the SPS conformance window to uncropped planes."""
    w, h = sps.cropped_size
    sub_w = 2 if sps.chroma_format_idc in (1, 2) else 1
    sub_h = 2 if sps.chroma_format_idc == 1 else 1
    l, _, t, _ = sps.conf_win
    y = y[t * sub_h:t * sub_h + h, l * sub_w:l * sub_w + w]
    cb = cb[t:t + (h + 1) // 2, l:l + (w + 1) // 2]
    cr = cr[t:t + (h + 1) // 2, l:l + (w + 1) // 2]
    return y, cb, cr


class HevcSequenceSession:
    """One video-track decode session: stateful I/P decoding over the
    sample stream (the reference's per-chunk Decoder with the plugin's
    internal DPB, decoder.h:132-149)."""

    def __init__(self, config_box, limits=None):
        nals = config_box.get_header_nals()
        sps = pps = None
        for nal in nals:
            t = nal_type(nal)
            if t == 33:
                sps = H.parse_sps(nal)
            elif t == 34:
                pps = H.parse_pps(nal)
        if sps is None or pps is None:
            raise HeifError.invalid_input(msg="hvcC without SPS/PPS")
        self.sps, self.pps = sps, pps
        self.limits = limits
        if limits is not None:
            limits.check_image_size(sps.pic_width, sps.pic_height)
        self.seq = SequenceDecoder(sps, pps)
        self.length_size = getattr(config_box, "length_size", 4)
        self.pending: List[PixelImage] = []
        # output reorder (B frames): bounded by the SPS bumping limit
        # (the reference's plugin reorders inside libde265/dav1d;
        # ref: track_visual.cc:175 pulls frames in output order)
        self.max_reorder = sps.max_num_reorder_pics
        self.reorder: List[tuple] = []     # [(poc, planes)]

    def push_sample(self, data: bytes) -> None:
        for nal in split_length_prefixed(data, self.length_size):
            t = nal_type(nal)
            if t >= 32:             # parameter sets / SEI
                continue
            if t in (19, 20) and self.reorder:
                # new IDR resets POC: drain the previous GOP first
                self.flush()
            _poc, planes = self.seq.decode_nal(nal)
            self.reorder.append((_poc, planes))
            while len(self.reorder) > self.max_reorder:
                self._bump()

    def _bump(self) -> None:
        i = min(range(len(self.reorder)),
                key=lambda k: self.reorder[k][0])
        _poc, planes = self.reorder.pop(i)
        self.pending.append(self._to_image(planes))

    def flush(self) -> None:
        """Drain the reorder buffer (end of stream / before an IDR)."""
        while self.reorder:
            self._bump()

    def pull(self) -> Optional[PixelImage]:
        return self.pending.pop(0) if self.pending else None

    def _to_image(self, planes) -> PixelImage:
        sps = self.sps
        y, cb, cr = crop_to_conformance(sps, *planes)
        w, h = sps.cropped_size
        dt_y = np.uint8 if sps.bit_depth_luma <= 8 else np.uint16
        dt_c = np.uint8 if sps.bit_depth_chroma <= 8 else np.uint16
        img = PixelImage(w, h, Colorspace.YCbCr, Chroma.C420, self.limits)
        img.set_plane(Channel.Y, y.astype(dt_y), sps.bit_depth_luma)
        img.set_plane(Channel.Cb, cb.astype(dt_c),
                      sps.bit_depth_chroma)
        img.set_plane(Channel.Cr, cr.astype(dt_c),
                      sps.bit_depth_chroma)
        return img


class HevcDecoder(Decoder):
    id = "tpu-hevc"
    format = "hevc"
    priority = 100

    # --- sequence push/flush/pull API (ref: decoder.h:132-149) ---

    def start_sequence(self, config_box, limits=None):
        """Returns a stateful HevcSequenceSession for a video track
        (also kept as the default session for push/pull)."""
        self._session = HevcSequenceSession(config_box, limits=limits)
        return self._session

    def push_sequence_data(self, data: bytes) -> None:
        if getattr(self, "_session", None) is None:
            raise HeifError.usage(msg="push before start_sequence")
        self._session.push_sample(data)

    def pull_next_frame(self):
        if getattr(self, "_session", None) is None:
            return None
        return self._session.pull()

    def decode_single_image(self, config_box, data: bytes,
                            declared_size=None, limits=None) -> PixelImage:
        sps, pps, slices = extract_stream(config_box, data)
        if limits is not None:
            limits.check_image_size(sps.pic_width, sps.pic_height)
            if declared_size is not None:
                # coded size must not wildly exceed the declared size
                # (ref: decoder.h:108-125 security check)
                dw, dh = declared_size
                if sps.pic_width * sps.pic_height > \
                        max(4 * dw * dh, dw * dh + (1 << 16)):
                    raise HeifError.security(
                        "coded size much larger than declared size")

        y, cb, cr = decode_intra_picture(sps, pps, slices)
        y, cb, cr = crop_to_conformance(sps, y, cb, cr)
        w, h = sps.cropped_size
        dt_y = np.uint8 if sps.bit_depth_luma <= 8 else np.uint16
        dt_c = np.uint8 if sps.bit_depth_chroma <= 8 else np.uint16
        img = PixelImage(w, h, Colorspace.YCbCr, Chroma.C420, limits)
        img.set_plane(Channel.Y, y.astype(dt_y), sps.bit_depth_luma)
        img.set_plane(Channel.Cb, cb.astype(dt_c), sps.bit_depth_chroma)
        img.set_plane(Channel.Cr, cr.astype(dt_c), sps.bit_depth_chroma)
        return img


def register():
    register_decoder(HevcDecoder())
