"""Baseline JPEG encoder (ITU-T T.81, Annex K tables).

TPU-native replacement for the reference's libjpeg encoder plugin
(reference: libheif/plugins/encoder_libjpeg.cc, 533 LoC).  The forward
DCT + quantization run batched over all blocks on device
(idct.fdct8x8_islow); the Huffman bit emission is the host-side serial
tail, like every entropy coder in this engine.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from ...core.error import HeifError, SubError
from ...image.pixel_image import PixelImage, Channel, Colorspace, Chroma
from ..registry import Encoder as RegistryEncoder, register_encoder
from .bitio import HuffTable, BitWriter
from .tables import (ZIGZAG, STD_LUMA_QUANT, STD_CHROMA_QUANT,
                     quality_scaled_quant, STD_DC_LUMA_BITS, STD_DC_LUMA_VALS,
                     STD_DC_CHROMA_BITS, STD_DC_CHROMA_VALS,
                     STD_AC_LUMA_BITS, STD_AC_LUMA_VALS,
                     STD_AC_CHROMA_BITS, STD_AC_CHROMA_VALS)


def _pad_to(arr: np.ndarray, h: int, w: int) -> np.ndarray:
    """Edge-replicate pad a plane to (h, w) (jcsample edge expansion)."""
    ph, pw = h - arr.shape[0], w - arr.shape[1]
    if ph or pw:
        arr = np.pad(arr, ((0, ph), (0, pw)), mode="edge")
    return arr


def _blocks_of(plane: np.ndarray) -> np.ndarray:
    """(H, W) → (H/8 * W/8, 8, 8) row-major block order."""
    h, w = plane.shape
    return plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(
        -1, 8, 8)


_FQ_JIT = {}


def _fdct_quant_program(nb: int):
    """Compiled FDCT + quantize for one block count (CPU backend for
    host encode: dispatch-latency-free; see decoder._recon_program)."""
    import os
    backend = os.environ.get("LIBHEIF_TPU_JPEG_BACKEND", "cpu")
    key = (nb, backend)
    fn = _FQ_JIT.get(key)
    if fn is None:
        import jax
        import jax.numpy as jnp
        from .idct import fdct8x8_islow
        zz = np.asarray(ZIGZAG)

        def run(blocks, quant):
            coeffs = fdct8x8_islow(blocks)
            q8 = quant.astype(jnp.int32).reshape(1, 8, 8) * 8
            mag = (jnp.abs(coeffs) + (q8 >> 1)) // q8
            out = jnp.where(coeffs < 0, -mag, mag).reshape(-1, 64)
            return out.astype(jnp.int16)[:, zz]

        try:
            device = jax.local_devices(backend=backend)[0]
        except RuntimeError:
            device = None
        fn = jax.jit(run, device=device)
        _FQ_JIT[key] = fn
    return fn


def _quantize(coeffs, quant: np.ndarray):
    """fdct output (×8 scale) → quantized zigzag coeffs (N, 64) int16.

    Symmetric round-half-away division by 8*Q, batched.
    """
    import jax.numpy as jnp
    q8 = jnp.asarray(quant, jnp.int32).reshape(1, 8, 8) * 8
    c = coeffs
    mag = (jnp.abs(c) + (q8 >> 1)) // q8
    zz = jnp.where(c < 0, -mag, mag).reshape(-1, 64)
    return np.asarray(zz, np.int16)[:, np.asarray(ZIGZAG)]


def _size_of(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _encode_coeff_bits(v: int, size: int) -> int:
    return v if v >= 0 else v + (1 << size) - 1


class _CompPlan:
    def __init__(self, comp_id, h, v, tq, dc_table, ac_table, blocks,
                 blocks_w, blocks_h):
        self.comp_id = comp_id
        self.h = h
        self.v = v
        self.tq = tq
        self.dc_table = dc_table
        self.ac_table = ac_table
        self.blocks = blocks          # (N, 64) zigzag int16
        self.blocks_w = blocks_w
        self.blocks_h = blocks_h


def encode_jpeg(img: PixelImage, quality: int = 75) -> bytes:
    """Encode a YCbCr (444/422/420) or monochrome PixelImage."""
    from .idct import fdct8x8_islow
    import jax.numpy as jnp

    if img.colorspace == Colorspace.Monochrome:
        sampling = [(1, 1)]
        channels = [Channel.Y]
    elif img.colorspace == Colorspace.YCbCr:
        sub = {Chroma.C444: (1, 1), Chroma.C422: (2, 1),
               Chroma.C420: (2, 2)}.get(img.chroma)
        if sub is None:
            raise HeifError.unsupported(
                SubError.Unsupported_color_conversion,
                f"JPEG encode: unsupported chroma {img.chroma}")
        sampling = [sub, (1, 1), (1, 1)]
        channels = [Channel.Y, Channel.Cb, Channel.Cr]
    else:
        raise HeifError.unsupported(
            SubError.Unsupported_color_conversion,
            "JPEG encode requires YCbCr or monochrome input")
    for ch in channels:
        if img.bit_depth(ch) != 8:
            raise HeifError.unsupported(SubError.Unsupported_bit_depth,
                                        "JPEG encode is 8-bit only")

    W, H = img.width, img.height
    h_max = max(s[0] for s in sampling)
    v_max = max(s[1] for s in sampling)
    mcus_w = -(-W // (8 * h_max))
    mcus_h = -(-H // (8 * v_max))

    luma_q = quality_scaled_quant(STD_LUMA_QUANT, quality)
    chroma_q = quality_scaled_quant(STD_CHROMA_QUANT, quality)

    dc_l = HuffTable(STD_DC_LUMA_BITS, STD_DC_LUMA_VALS)
    ac_l = HuffTable(STD_AC_LUMA_BITS, STD_AC_LUMA_VALS)
    dc_c = HuffTable(STD_DC_CHROMA_BITS, STD_DC_CHROMA_VALS)
    ac_c = HuffTable(STD_AC_CHROMA_BITS, STD_AC_CHROMA_VALS)

    from ... import native
    nlib = native.get_lib()
    import os
    if os.environ.get("LIBHEIF_TPU_JPEG_BACKEND", "native") != "native":
        nlib = None

    plans: List[_CompPlan] = []
    fdct_tasks = []
    for i, (ch, (sh, sv)) in enumerate(zip(channels, sampling)):
        plane = np.asarray(img.plane(ch))
        bw = mcus_w * sh
        bh = mcus_h * sv
        plane = _pad_to(plane, bh * 8, bw * 8)
        quant = luma_q if i == 0 else chroma_q
        if nlib is not None:
            # native FDCT+quant (bit-identical to the jnp anchor),
            # striped across the shared pool (the C call drops the GIL)
            import ctypes
            src = np.ascontiguousarray(plane, np.uint8)
            q = np.ascontiguousarray(quant, np.int32)
            zz = np.empty((bh * bw, 64), np.int16)
            nlib.tpuheif_jpeg_fdct_quant.restype = ctypes.c_int
            n_stripes = max(1, min(4, bh // 8))
            bounds = [bh * k // n_stripes for k in range(n_stripes + 1)]
            for s in range(n_stripes):
                b0, b1 = bounds[s], bounds[s + 1]
                if b0 == b1:
                    continue

                def run(src=src, q=q, zz=zz, b0=b0, b1=b1, bw=bw):
                    rc = nlib.tpuheif_jpeg_fdct_quant(
                        src[b0 * 8:].ctypes.data_as(
                            ctypes.POINTER(ctypes.c_uint8)),
                        ctypes.c_int(b1 - b0), ctypes.c_int(bw),
                        ctypes.c_int64(bw * 8),
                        q.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                        zz[b0 * bw:].ctypes.data_as(
                            ctypes.POINTER(ctypes.c_int16)))
                    if rc != 0:
                        raise HeifError.invalid_input(
                            msg="JPEG fdct/quant failed")
                fdct_tasks.append(run)
        else:
            blocks = _blocks_of(plane.astype(np.int32) - 128)
            zz = np.asarray(_fdct_quant_program(blocks.shape[0])(
                blocks, np.asarray(quant)))
        plans.append(_CompPlan(
            comp_id=i + 1, h=sh, v=sv, tq=0 if i == 0 else 1,
            dc_table=dc_l if i == 0 else dc_c,
            ac_table=ac_l if i == 0 else ac_c,
            blocks=zz, blocks_w=bw, blocks_h=bh))
    if fdct_tasks:
        if len(fdct_tasks) > 1:
            from .decoder import _recon_pool
            list(_recon_pool().map(lambda f: f(), fdct_tasks))
        else:
            for t in fdct_tasks:
                t()

    out = bytearray()
    out += b"\xFF\xD8"                                   # SOI
    # APP0 JFIF
    out += b"\xFF\xE0" + (16).to_bytes(2, "big") + b"JFIF\x00" + \
        bytes([1, 1, 0]) + (1).to_bytes(2, "big") + (1).to_bytes(2, "big") + \
        bytes([0, 0])
    # DQT (zigzag order on the wire)
    for tq, q in ([(0, luma_q)] + ([(1, chroma_q)] if len(plans) > 1 else [])):
        out += b"\xFF\xDB" + (67).to_bytes(2, "big") + bytes([tq])
        out += bytes(int(q[z]) for z in ZIGZAG)
    # SOF0
    ncomp = len(plans)
    out += b"\xFF\xC0" + (8 + 3 * ncomp).to_bytes(2, "big")
    out += bytes([8]) + H.to_bytes(2, "big") + W.to_bytes(2, "big")
    out += bytes([ncomp])
    for p in plans:
        out += bytes([p.comp_id, (p.h << 4) | p.v, p.tq])
    # DHT
    tables = [(0, 0, dc_l), (1, 0, ac_l)]
    if ncomp > 1:
        tables += [(0, 1, dc_c), (1, 1, ac_c)]
    for tc, th, t in tables:
        payload = bytes(t.bits[1:17]) + bytes(t.values)
        out += b"\xFF\xC4" + (3 + len(payload)).to_bytes(2, "big")
        out += bytes([(tc << 4) | th]) + payload
    # SOS
    out += b"\xFF\xDA" + (6 + 2 * ncomp).to_bytes(2, "big") + bytes([ncomp])
    for i, p in enumerate(plans):
        td = 0 if i == 0 else 1
        out += bytes([p.comp_id, (td << 4) | td])
    out += bytes([0, 63, 0])

    entropy = None
    if nlib is not None:
        entropy = _entropy_encode_native(nlib, plans, mcus_w, mcus_h)
    if entropy is None:
        entropy = _entropy_encode(plans, mcus_w, mcus_h)
    out += entropy
    out += b"\xFF\xD9"                                   # EOI
    return bytes(out)


def _entropy_encode_native(nlib, plans: List[_CompPlan], mcus_w: int,
                           mcus_h: int):
    """Huffman scan emission through the C engine (byte-identical to
    _entropy_encode); returns None to fall back."""
    import ctypes
    n = len(plans)
    arr_i = lambda vals: (ctypes.c_int * n)(*vals)  # noqa: E731
    dc_bits = (ctypes.c_uint8 * 64)()
    dc_vals = (ctypes.c_uint8 * 1024)()
    dc_nvals = (ctypes.c_int * 4)()
    ac_bits = (ctypes.c_uint8 * 64)()
    ac_vals = (ctypes.c_uint8 * 1024)()
    ac_nvals = (ctypes.c_int * 4)()
    table_ids = []
    for i, p in enumerate(plans):
        tid = 0 if i == 0 else 1
        table_ids.append(tid)
        for t, bits_a, vals_a, nv_a in ((p.dc_table, dc_bits, dc_vals,
                                         dc_nvals),
                                        (p.ac_table, ac_bits, ac_vals,
                                         ac_nvals)):
            for k in range(16):
                bits_a[tid * 16 + k] = t.bits[k + 1]
            for k, v in enumerate(t.values[:256]):
                vals_a[tid * 256 + k] = v
            nv_a[tid] = len(t.values)
    ptrs = (ctypes.POINTER(ctypes.c_int16) * n)()
    total_blocks = 0
    keep = []
    for i, p in enumerate(plans):
        co = np.ascontiguousarray(p.blocks, np.int16)
        keep.append(co)
        ptrs[i] = co.ctypes.data_as(ctypes.POINTER(ctypes.c_int16))
        total_blocks += p.blocks_w * p.blocks_h
    cap = total_blocks * 130 + 4096   # worst case ~2 bytes/coefficient
    out = np.empty(cap, np.uint8)
    nlib.tpuheif_jpeg_encode_scan.restype = ctypes.c_int64
    rc = nlib.tpuheif_jpeg_encode_scan(
        n, arr_i([p.h for p in plans]), arr_i([p.v for p in plans]),
        arr_i([p.blocks_w for p in plans]),
        arr_i([p.blocks_h for p in plans]),
        arr_i(table_ids), arr_i(table_ids), ptrs,
        dc_bits, dc_vals, dc_nvals, ac_bits, ac_vals, ac_nvals,
        int(len(plans) > 1), mcus_w, mcus_h,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(cap))
    if rc < 0:
        return None
    return bytes(out[:rc])


def _entropy_encode(plans: List[_CompPlan], mcus_w: int,
                    mcus_h: int) -> bytes:
    w = BitWriter()
    preds = {p.comp_id: 0 for p in plans}
    interleaved = len(plans) > 1
    if not interleaved:
        p = plans[0]
        order = [(p, i) for i in range(p.blocks_h * p.blocks_w)]
    else:
        order = []
        for my in range(mcus_h):
            for mx in range(mcus_w):
                for p in plans:
                    for by in range(p.v):
                        for bx in range(p.h):
                            idx = (my * p.v + by) * p.blocks_w + \
                                (mx * p.h + bx)
                            order.append((p, idx))
    for p, idx in order:
        _encode_block(w, p, p.blocks[idx], preds)
    w.pad_to_byte()
    return w.getvalue()


def _encode_block(w: BitWriter, p: _CompPlan, block: np.ndarray, preds):
    dc = int(block[0])
    diff = dc - preds[p.comp_id]
    preds[p.comp_id] = dc
    s = _size_of(diff)
    ln, code = p.dc_table.enc[s]
    w.put_bits(code, ln)
    if s:
        w.put_bits(_encode_coeff_bits(diff, s), s)
    run = 0
    # find last nonzero
    nz = np.nonzero(block[1:])[0]
    last = (nz[-1] + 1) if len(nz) else 0
    for k in range(1, last + 1):
        v = int(block[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            ln, code = p.ac_table.enc[0xF0]          # ZRL
            w.put_bits(code, ln)
            run -= 16
        s = _size_of(v)
        ln, code = p.ac_table.enc[(run << 4) | s]
        w.put_bits(code, ln)
        w.put_bits(_encode_coeff_bits(v, s), s)
        run = 0
    if last < 63:
        ln, code = p.ac_table.enc[0x00]              # EOB
        w.put_bits(code, ln)


class JpegEncoder(RegistryEncoder):
    """Registry encoder for `jpeg` items (ref: encoder_libjpeg.cc)."""

    id = "tpu-jpeg"
    format = "jpeg"
    priority = 100
    lossy_supported = True
    lossless_supported = False

    def parameters(self):
        return [{"name": "quality", "type": "integer", "minimum": 1,
                 "maximum": 100, "default": 75}]

    def encode_single_image(self, img: PixelImage, options=None):
        from ...color import convert_image
        quality = getattr(options, "quality", 75) if options else 75
        if img.colorspace not in (Colorspace.YCbCr, Colorspace.Monochrome):
            img = convert_image(img, Colorspace.YCbCr, Chroma.C420)
        data = encode_jpeg(img, quality=quality)
        from ...boxes.meta import Box_ispe
        return data, None, [(Box_ispe(img.width, img.height), False)]


def _register():
    register_encoder(JpegEncoder())


_register()
