"""AVC still-image decoder: NALs → planes → PixelImage.

Replaces the reference's openh264/ffmpeg plugin boundary (reference:
libheif/plugins/decoder_openh264.cc). Scope: I-frame (intra) decode,
CABAC, 8-bit 4:2:0/monochrome, baseline-frame geometry — the toolset
HEIF 'avc1' image items use.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from ...core.error import HeifError, SubError
from ...image.pixel_image import PixelImage, Channel, Colorspace, Chroma
from ..registry import Decoder, register_decoder
from . import headers as H
from .mb import SliceDecoder


def decode_intra_frame(nals: List[bytes]) -> Dict[str, np.ndarray]:
    """Decode the first (intra) frame from a list of NAL units."""
    from . import native_decode as N
    if N.native_enabled():
        planes = N.decode_intra_frame_native(nals)
        if planes is not None:
            return planes
        # None: no decodable slice OR a CAVLC stream — the Python
        # engine below covers both
    sps_map: Dict[int, H.SPS] = {}
    pps_map: Dict[int, H.PPS] = {}
    dec: Optional[SliceDecoder] = None
    hdr0 = None
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
            hdr, sps, pps, rbsp = H.parse_slice_header(nal, sps_map, pps_map)
            if sps.bit_depth_luma != 8 or sps.chroma_format_idc > 1:
                raise HeifError.unsupported(
                    SubError.Unsupported_bit_depth,
                    "only 8-bit 4:2:0/monochrome AVC supported")
            if dec is None:
                mbw, mbh = sps.pic_width_in_mbs, sps.pic_height_in_map_units
                planes = [np.zeros((mbh * 16, mbw * 16), np.int32)]
                if sps.chroma_format_idc == 1:
                    planes += [np.zeros((mbh * 8, mbw * 8), np.int32),
                               np.zeros((mbh * 8, mbw * 8), np.int32)]
                if pps.entropy_coding_mode:
                    dec = SliceDecoder(sps, pps, planes)
                else:
                    from .cavlc import CavlcSliceDecoder
                    dec = CavlcSliceDecoder(sps, pps, planes)
                hdr0 = hdr
            dec.decode_slice(hdr, rbsp)
            if all(m is not None for m in dec.mb):
                break
    if dec is None:
        raise HeifError.invalid_input(msg="no decodable AVC slice found")
    sps = dec.sps
    if hdr0 is None or hdr0.disable_deblocking_filter_idc != 1:
        from .deblock import deblock_frame
        deblock_frame(dec)
    # crop to the conformance window
    w, h = sps.width, sps.height
    x0 = sps.crop_left * (2 if sps.chroma_format_idc == 1 else 1)
    y0 = sps.crop_top * (2 if sps.chroma_format_idc == 1 else 1)
    out = {"Y": dec.planes[0][y0:y0 + h, x0:x0 + w].astype(np.uint8)}
    if len(dec.planes) > 1:
        cw, ch = (w + 1) // 2, (h + 1) // 2
        cx, cy = x0 // 2, y0 // 2
        out["U"] = dec.planes[1][cy:cy + ch, cx:cx + cw].astype(np.uint8)
        out["V"] = dec.planes[2][cy:cy + ch, cx:cx + cw].astype(np.uint8)
    return out


def decode_annexb(data: bytes) -> Dict[str, np.ndarray]:
    return decode_intra_frame(H.split_annexb(data))


def _crop(sps: H.SPS, planes) -> Dict[str, np.ndarray]:
    w, h = sps.width, sps.height
    x0 = sps.crop_left * (2 if sps.chroma_format_idc == 1 else 1)
    y0 = sps.crop_top * (2 if sps.chroma_format_idc == 1 else 1)
    out = {"Y": planes[0][y0:y0 + h, x0:x0 + w].astype(np.uint8)}
    if len(planes) > 1:
        cw, ch = (w + 1) // 2, (h + 1) // 2
        cx, cy = x0 // 2, y0 // 2
        out["U"] = planes[1][cy:cy + ch, cx:cx + cw].astype(np.uint8)
        out["V"] = planes[2][cy:cy + ch, cx:cx + cw].astype(np.uint8)
    return out


class AvcSequenceDecoder:
    """Stateful I/P sequence decoder: sliding-window single/multi ref
    DPB over full (uncropped) pictures, one slice per picture.

    Replaces the reference's openh264 plugin for avc1 video tracks
    (reference: libheif/codecs/decoder.h:132-149 push/pull,
    sequences/track_visual.cc:175)."""

    def __init__(self):
        self.sps_map: Dict[int, H.SPS] = {}
        self.pps_map: Dict[int, H.PPS] = {}
        self.refs: List[List[np.ndarray]] = []   # most-recent first

    def decode_nal(self, nal: bytes):
        """Decode one NAL; returns cropped planes for slice NALs,
        None for parameter sets / SEI."""
        t = H.nal_type(nal)
        if t == H.NAL_SPS:
            s = H.parse_sps(nal)
            self.sps_map[s.seq_parameter_set_id] = s
            return None
        if t == H.NAL_PPS:
            p = H.parse_pps(nal, self.sps_map)
            self.pps_map[p.pic_parameter_set_id] = p
            return None
        if t not in (H.NAL_SLICE_IDR, H.NAL_SLICE_NON_IDR):
            return None
        hdr, sps, pps, rbsp = H.parse_slice_header(nal, self.sps_map,
                                                   self.pps_map)
        if sps.bit_depth_luma != 8 or sps.chroma_format_idc > 1:
            raise HeifError.unsupported(
                SubError.Unsupported_bit_depth,
                "only 8-bit 4:2:0/monochrome AVC supported")
        if hdr.ref_idx_reorder is not None:
            raise HeifError.unsupported(
                SubError.Unsupported_codec,
                "ref_pic_list_modification not supported")
        if hdr.first_mb != 0:
            # One slice per picture in this sequence path: a second
            # slice of the same frame would allocate fresh planes and
            # emit a corrupt extra frame — fail cleanly instead.
            raise HeifError.unsupported(
                SubError.Unsupported_codec,
                "multi-slice pictures not supported in sequence decode")
        if t == H.NAL_SLICE_IDR:
            self.refs = []
        mbw, mbh = sps.pic_width_in_mbs, sps.pic_height_in_map_units
        planes = [np.zeros((mbh * 16, mbw * 16), np.int32)]
        if sps.chroma_format_idc == 1:
            planes += [np.zeros((mbh * 8, mbw * 8), np.int32),
                       np.zeros((mbh * 8, mbw * 8), np.int32)]
        # list 0 = refs by descending frame order (sliding window)
        if pps.entropy_coding_mode:
            dec = SliceDecoder(sps, pps, planes, ref_planes=self.refs)
        else:
            from .cavlc import CavlcSliceDecoder
            dec = CavlcSliceDecoder(sps, pps, planes,
                                    ref_planes=self.refs)
        dec.num_ref_idx_l0 = hdr.num_ref_idx_l0
        dec.decode_slice(hdr, rbsp)
        if hdr.disable_deblocking_filter_idc != 1:
            from .deblock import deblock_frame
            deblock_frame(dec)
        if hdr.nal_ref_idc != 0:
            self.refs.insert(0, planes)
            del self.refs[max(sps.max_num_ref_frames, 1):]
        return _crop(sps, planes)

    def decode_stream(self, nals: List[bytes]) -> List[Dict[str,
                                                            np.ndarray]]:
        out = []
        for nal in nals:
            if not nal:
                continue
            planes = self.decode_nal(nal)
            if planes is not None:
                out.append(planes)
        return out


class AvcSequenceSession:
    """Track decode session over AvcSequenceDecoder (the push/pull
    boundary of decoder.h:132-149).  P-only streams carry no reorder,
    so frames emerge in decode order."""

    def __init__(self, config_box, limits=None):
        self.seq = AvcSequenceDecoder()
        self.length_size = getattr(config_box, "length_size", 4)
        self.limits = limits
        self.pending = []
        if config_box is not None:
            for nal in config_box.all_nals():
                self.seq.decode_nal(nal)

    def push_sample(self, data: bytes) -> None:
        for nal in H.split_length_prefixed(data, self.length_size):
            planes = self.seq.decode_nal(nal)
            if planes is not None:
                self.pending.append(self._to_image(planes))

    def pull(self):
        return self.pending.pop(0) if self.pending else None

    def flush(self) -> None:
        pass

    def _to_image(self, planes) -> PixelImage:
        y = planes["Y"]
        h, w = y.shape
        if self.limits is not None:
            self.limits.check_image_size(w, h)
        if "U" not in planes:
            img = PixelImage(w, h, Colorspace.Monochrome,
                             Chroma.Monochrome, self.limits)
            img.set_plane(Channel.Y, y, 8)
            return img
        img = PixelImage(w, h, Colorspace.YCbCr, Chroma.C420, self.limits)
        img.set_plane(Channel.Y, y, 8)
        img.set_plane(Channel.Cb, planes["U"], 8)
        img.set_plane(Channel.Cr, planes["V"], 8)
        return img


class AvcDecoder(Decoder):
    id = "tpu-avc"
    format = "avc"
    priority = 100

    # --- sequence push/flush/pull API (ref: decoder.h:132-149) ---

    def start_sequence(self, config_box, limits=None):
        self._session = AvcSequenceSession(config_box, limits=limits)
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
        nals = []
        if config_box is not None:
            nals.extend(config_box.all_nals())
            length_size = config_box.length_size
        else:
            length_size = 4
        nals.extend(H.split_length_prefixed(data, length_size))
        planes = decode_intra_frame(nals)
        y = planes["Y"]
        h, w = y.shape
        if limits is not None:
            limits.check_image_size(w, h)
        if "U" not in planes:
            img = PixelImage(w, h, Colorspace.Monochrome,
                             Chroma.Monochrome, limits)
            img.set_plane(Channel.Y, y, 8)
            return img
        img = PixelImage(w, h, Colorspace.YCbCr, Chroma.C420, limits)
        img.set_plane(Channel.Y, y, 8)
        img.set_plane(Channel.Cb, planes["U"], 8)
        img.set_plane(Channel.Cr, planes["V"], 8)
        return img


def register():
    register_decoder(AvcDecoder())
