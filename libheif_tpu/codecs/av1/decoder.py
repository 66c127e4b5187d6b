"""AV1 still-image decoder: OBUs → planes → PixelImage.

Replaces the reference's dav1d/aom plugin boundary (reference:
libheif/plugins/decoder_dav1d.cc, decoder_aom.cc).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from ...core.error import HeifError, SubError
from ...image.pixel_image import PixelImage, Channel, Colorspace, Chroma
from ..registry import Decoder, register_decoder
from . import obu as O
from .tile import TileDecoder


def parse_obus(data: bytes):
    """OBU walk of the first (still) frame: headers + raw tile bytes.
    Returns (seq, fh, tiles)."""
    seq: Optional[O.SequenceHeader] = None
    fh: Optional[O.FrameHeader] = None
    tiles: List[bytes] = []
    for ob in O.split_obus(data):
        if ob.type == O.OBU_SEQUENCE_HEADER:
            seq = O.parse_sequence_header(ob.payload)
        elif ob.type == O.OBU_FRAME_HEADER:
            if seq is None:
                raise HeifError.invalid_input(msg="frame before seq header")
            fh = O.parse_frame_header(ob.payload, seq)
        elif ob.type == O.OBU_TILE_GROUP:
            if fh is None:
                raise HeifError.invalid_input(msg="tile group before header")
            tg = O.parse_tile_group(ob.payload, fh.tile_info, 0)
            tiles.extend(tg.tile_data)
        elif ob.type == O.OBU_FRAME:
            if seq is None:
                raise HeifError.invalid_input(msg="frame before seq header")
            fh = O.parse_frame_header(ob.payload, seq)
            hdr_bytes = (fh.header_bit_size + 7) // 8
            tg = O.parse_tile_group(ob.payload, fh.tile_info,
                                    hdr_bytes * 8)
            tiles.extend(tg.tile_data)
        if fh is not None and len(tiles) >= fh.tile_info.cols * \
                fh.tile_info.rows:
            break
    if seq is None or fh is None or not tiles:
        raise HeifError.invalid_input(msg="incomplete AV1 stream")
    return seq, fh, tiles


def parse_frame(data: bytes):
    """Host entropy decode of the first (still) frame: OBU walk + tile
    parse into a TileDecoder with deferred recon jobs.  Returns
    (seq, fh, dec) — pair with finish_frame()."""
    seq, fh, tiles = parse_obus(data)
    return _build_tile_decoder(seq, fh, tiles)


def _build_tile_decoder(seq, fh, tiles):
    """Python tile-parse path: TileDecoder over the parsed tiles."""
    w, h = fh.frame_width, fh.frame_height
    # decode into the padded mi area (blocks snap to the 8px mi grid),
    # crop to the frame size at the end
    pw = (w + 7) // 8 * 8
    ph = (h + 7) // 8 * 8
    ssx, ssy = seq.subsampling_x, seq.subsampling_y
    planes = [np.zeros((ph, pw), np.int32)]
    if not seq.monochrome:
        planes += [np.zeros((ph >> ssy, pw >> ssx), np.int32),
                   np.zeros((ph >> ssy, pw >> ssx), np.int32)]
    dec = TileDecoder(seq, fh, planes)
    ti = fh.tile_info
    sb_mi = dec.sb_mi
    idx = 0
    for trow in range(ti.rows):
        for tcol in range(ti.cols):
            mc0 = ti.col_starts[tcol] * sb_mi
            mc1 = min(ti.col_starts[tcol + 1] * sb_mi, dec.mi_cols)
            mr0 = ti.row_starts[trow] * sb_mi
            mr1 = min(ti.row_starts[trow + 1] * sb_mi, dec.mi_rows)
            dec.decode_tile(tiles[idx], mc0, mc1, mr0, mr1)
            idx += 1
    return seq, fh, dec


def finish_frame(seq, fh, dec) -> Dict[str, np.ndarray]:
    """In-loop filters + crop after the recon jobs have run."""
    planes = dec.planes
    w, h = fh.frame_width, fh.frame_height

    # in-loop filters: deblock → CDEF → loop restoration (LR reads the
    # deblocked frame at stripe boundaries, spec §7.17.1)
    if not fh.coded_lossless and any(fh.loop_filter_levels):
        from .deblock import apply_deblock
        apply_deblock(planes, dec.edges, fh, w, h, bd=seq.bit_depth)
    deblocked = planes
    if not fh.coded_lossless and (any(fh.cdef.y_pri) or any(fh.cdef.y_sec)
                                  or any(fh.cdef.uv_pri)
                                  or any(fh.cdef.uv_sec)):
        from .cdef import apply_cdef
        planes = apply_cdef(planes, dec, seq, fh, w, h)
    if any(t != 0 for t in fh.lr_type):
        from .lr import apply_lr
        planes = apply_lr(planes, deblocked, dec, seq, fh, w, h)
    if seq.monochrome:
        return {"Y": planes[0][:h, :w]}
    ssx, ssy = seq.subsampling_x, seq.subsampling_y
    cw, ch = (w + (1 << ssx) - 1) >> ssx, (h + (1 << ssy) - 1) >> ssy
    return {"Y": planes[0][:h, :w], "U": planes[1][:ch, :cw],
            "V": planes[2][:ch, :cw]}


def decode_intra_frame_ex(data: bytes, engine: Optional[str] = None):
    """Decode the first (still) frame from a byte stream of OBUs;
    returns (planes dict, SequenceHeader).

    engine: "native" (C++ host engine), "host" (numpy job replay),
    "device" (TPU wavefront program, device_recon.py), or None/"auto"
    (LIBHEIF_TPU_AV1_ENGINE env var, falling back native → host)."""
    import os
    if engine is None:
        engine = os.environ.get("LIBHEIF_TPU_AV1_ENGINE", "auto")
    if engine in ("native", "auto"):
        from .native_decode import decode_frame_native
        seq, fh, tiles = parse_obus(data)
        planes = decode_frame_native(seq, fh, tiles)
        if planes is not None:
            return _maybe_grain(planes, seq, fh), seq
        if engine == "native":
            raise HeifError.unsupported(SubError.Unsupported_codec,
                                        "native AV1 engine unavailable")
        seq, fh, dec = _build_tile_decoder(seq, fh, tiles)
    else:
        seq, fh, dec = parse_frame(data)
    if engine == "device":
        from .device_recon import run_jobs_device
        run_jobs_device([dec])
    else:
        dec.run_jobs()
    return _maybe_grain(finish_frame(seq, fh, dec), seq, fh), seq


def _maybe_grain(planes: Dict[str, np.ndarray], seq, fh
                 ) -> Dict[str, np.ndarray]:
    """Output-stage film grain synthesis (spec 7.18.3) — applied after
    the in-loop filters for both engines (the reference gets this
    inside dav1d/aom, decoder_dav1d.cc)."""
    if fh.film_grain is None:
        return planes
    from .grain import apply_film_grain
    return apply_film_grain(planes, fh.film_grain, seq.bit_depth,
                            seq.subsampling_x, seq.subsampling_y)


def decode_intra_frame(data: bytes,
                       engine: Optional[str] = None) -> Dict[str, np.ndarray]:
    """Decode the first (still) frame from a byte stream of OBUs."""
    return decode_intra_frame_ex(data, engine)[0]


class Av1Decoder(Decoder):
    id = "tpu-av1"
    format = "av1"
    priority = 100

    def decode_single_image(self, config_box, data: bytes,
                            declared_size=None, limits=None) -> PixelImage:
        stream = (config_box.config_obus or b"") + data \
            if config_box is not None else data
        planes, seq = decode_intra_frame_ex(stream)
        bd = seq.bit_depth
        dt = np.uint8 if bd <= 8 else np.uint16
        y = planes["Y"]
        h, w = y.shape
        if limits is not None:
            limits.check_image_size(w, h)
        if "U" not in planes:
            img = PixelImage(w, h, Colorspace.Monochrome,
                             Chroma.Monochrome, limits)
            img.set_plane(Channel.Y, y.astype(dt), bd)
            return img
        ch, cw = planes["U"].shape
        if cw == w and ch == h:
            chroma = Chroma.C444
        elif cw < w and ch == h:
            chroma = Chroma.C422
        else:
            chroma = Chroma.C420
        img = PixelImage(w, h, Colorspace.YCbCr, chroma, limits)
        img.set_plane(Channel.Y, y.astype(dt), bd)
        img.set_plane(Channel.Cb, planes["U"].astype(dt), bd)
        img.set_plane(Channel.Cr, planes["V"].astype(dt), bd)
        return img


def register():
    register_decoder(Av1Decoder())
