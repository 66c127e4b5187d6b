"""Baseline/extended-sequential JPEG decoder (ITU-T T.81).

TPU-native replacement for the reference's libjpeg decoder plugin
(reference: libheif/plugins/decoder_libjpeg.cc, 506 LoC;
image-items/jpeg.cc ImageItem_JPEG jpeg.h:31).

Split of responsibilities (SURVEY.md §7): the serial entropy chain
(marker parse, Huffman MCU scan) runs on host; everything after the
coefficients — dequantization, de-zigzag, batched islow IDCT, plane
assembly — is one jnp program over all blocks of a component at once.

Output is a YCbCr (or monochrome) PixelImage at the frame's native
chroma; the engine's color pipeline (color/ops.py + the Pallas fast
path) performs RGB conversion like for every other codec.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from ...core.error import HeifError, SubError
from ...image.pixel_image import PixelImage, Channel, Colorspace, Chroma
from ..registry import Decoder, register_decoder
from .bitio import HuffTable, BitReader, unstuff, extend
from .tables import ZIGZAG

# marker codes
SOF_MARKERS = {0xC0: "baseline", 0xC1: "extended"}
UNSUPPORTED_SOF = {0xC2: "progressive", 0xC3: "lossless", 0xC5: "diff-seq",
                   0xC6: "diff-prog", 0xC7: "diff-lossless",
                   0xC9: "arith-seq", 0xCA: "arith-prog", 0xCB: "arith-ll",
                   0xCD: "arith-diff-seq", 0xCE: "arith-diff-prog",
                   0xCF: "arith-diff-ll"}


@dataclass
class JpegComponent:
    comp_id: int
    h: int
    v: int
    tq: int                      # quant table id
    # filled during scan decode
    blocks_w: int = 0
    blocks_h: int = 0
    coeffs: Optional[np.ndarray] = None   # (blocks_h*blocks_w, 64) zigzag


@dataclass
class JpegFrame:
    precision: int
    width: int
    height: int
    components: List[JpegComponent] = field(default_factory=list)
    warnings: List[str] = field(default_factory=list)
    restart_interval: int = 0
    quant: Dict[int, np.ndarray] = field(default_factory=dict)   # natural order
    huff_dc: Dict[int, HuffTable] = field(default_factory=dict)
    huff_ac: Dict[int, HuffTable] = field(default_factory=dict)

    @property
    def h_max(self):
        return max(c.h for c in self.components)

    @property
    def v_max(self):
        return max(c.v for c in self.components)


def _u16(data: bytes, pos: int) -> int:
    return (data[pos] << 8) | data[pos + 1]


_DHT_CACHE = {}


class JpegParser:
    """Marker-level parse + per-scan entropy decode driver."""

    def __init__(self, data: bytes):
        self.data = data
        self.frame: Optional[JpegFrame] = None

    def parse(self) -> JpegFrame:
        data = self.data
        n = len(data)
        if n < 2 or data[0] != 0xFF or data[1] != 0xD8:
            raise HeifError.invalid_input(SubError.Invalid_parameter_value,
                                          "not a JPEG stream (missing SOI)")
        pos = 2
        frame = None
        while pos + 4 <= n:
            if data[pos] != 0xFF:
                pos += 1
                continue
            marker = data[pos + 1]
            if marker == 0xFF:       # fill byte
                pos += 1
                continue
            pos += 2
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                continue             # no payload
            if marker == 0xD9:       # EOI
                break
            if pos + 2 > n:
                raise HeifError.eof("truncated JPEG marker segment")
            seglen = _u16(data, pos)
            if seglen < 2 or pos + seglen > n:
                raise HeifError.eof("JPEG segment length out of range")
            body = data[pos + 2:pos + seglen]
            pos += seglen

            if marker in SOF_MARKERS:
                frame = self._parse_sof(body)
                self.frame = frame
            elif marker in UNSUPPORTED_SOF:
                raise HeifError.unsupported(
                    SubError.Unsupported_codec,
                    f"unsupported JPEG coding process: "
                    f"{UNSUPPORTED_SOF[marker]}")
            elif marker == 0xDB:
                self._parse_dqt(body)
            elif marker == 0xC4:
                self._parse_dht(body)
            elif marker == 0xDD:
                if frame is None:
                    self._pending_dri = _u16(body, 0)
                else:
                    frame.restart_interval = _u16(body, 0)
            elif marker == 0xDA:
                if frame is None:
                    raise HeifError.invalid_input(
                        SubError.Invalid_parameter_value, "SOS before SOF")
                pos = self._decode_scan(body, pos)
            # APPn/COM and anything else: skipped
        if frame is None:
            raise HeifError.invalid_input(SubError.Invalid_parameter_value,
                                          "no SOF in JPEG stream")
        return frame

    # ----------------------------------------------------------- segments

    def _parse_sof(self, body: bytes) -> JpegFrame:
        if len(body) < 6:
            raise HeifError.eof("short SOF")
        precision = body[0]
        height = _u16(body, 1)
        width = _u16(body, 3)
        ncomp = body[5]
        if precision != 8:
            raise HeifError.unsupported(SubError.Unsupported_bit_depth,
                                        f"JPEG precision {precision}")
        if height == 0 or width == 0:
            raise HeifError.invalid_input(SubError.Invalid_image_size,
                                          "zero JPEG dimensions")
        frame = JpegFrame(precision, width, height)
        if hasattr(self, "_pending_dri"):
            frame.restart_interval = self._pending_dri
        if len(body) < 6 + 3 * ncomp:
            raise HeifError.eof("short SOF component list")
        for i in range(ncomp):
            cid, hv, tq = body[6 + 3 * i:9 + 3 * i]
            h, v = hv >> 4, hv & 15
            if not (1 <= h <= 4 and 1 <= v <= 4):
                raise HeifError.invalid_input(
                    SubError.Invalid_parameter_value,
                    f"bad sampling factors {h}x{v}")
            frame.components.append(JpegComponent(cid, h, v, tq))
        # carry tables parsed before SOF
        if self.frame is not None:
            frame.quant.update(self.frame.quant)
            frame.huff_dc.update(self.frame.huff_dc)
            frame.huff_ac.update(self.frame.huff_ac)
        if getattr(self, "_tables", None):
            q, dc, ac = self._tables
            frame.quant.update(q)
            frame.huff_dc.update(dc)
            frame.huff_ac.update(ac)
        return frame

    def _tables_dicts(self):
        if self.frame is not None:
            return (self.frame.quant, self.frame.huff_dc, self.frame.huff_ac)
        if not hasattr(self, "_tables") or self._tables is None:
            self._tables = ({}, {}, {})
        return self._tables

    def _parse_dqt(self, body: bytes):
        quant, _, _ = self._tables_dicts()
        pos = 0
        while pos < len(body):
            pq = body[pos] >> 4
            tq = body[pos] & 15
            pos += 1
            count = 64 * (2 if pq else 1)
            if pos + count > len(body):
                raise HeifError.eof("short DQT")
            if pq:
                vals = np.frombuffer(body, ">u2", 64, pos).astype(np.int32)
            else:
                vals = np.frombuffer(body, np.uint8, 64, pos).astype(np.int32)
            pos += count
            table = np.zeros(64, np.int32)
            table[ZIGZAG] = vals     # DQT is in zigzag order → natural
            quant[tq] = table

    def _parse_dht(self, body: bytes):
        _, huff_dc, huff_ac = self._tables_dicts()
        pos = 0
        while pos + 17 <= len(body):
            tc = body[pos] >> 4
            th = body[pos] & 15
            bits_b = body[pos + 1:pos + 17]
            nvals = sum(bits_b)
            pos += 17
            if pos + nvals > len(body):
                raise HeifError.eof("short DHT")
            vals_b = body[pos:pos + nvals]
            pos += nvals
            # tables repeat across images (Annex K defaults are near
            # universal): cache construction by content
            key = (bits_b, vals_b)
            table = _DHT_CACHE.get(key)
            if table is None:
                table = HuffTable(list(bits_b), list(vals_b))
                if len(_DHT_CACHE) < 64:
                    _DHT_CACHE[key] = table
            (huff_ac if tc else huff_dc)[th] = table

    # --------------------------------------------------------------- scan

    def _decode_scan(self, body: bytes, pos: int) -> int:
        """Decode one (baseline) scan; returns new stream position."""
        frame = self.frame
        ns = body[0]
        comps: List[Tuple[JpegComponent, int, int]] = []
        for i in range(ns):
            cs, tdta = body[1 + 2 * i:3 + 2 * i]
            comp = next((c for c in frame.components if c.comp_id == cs),
                        None)
            if comp is None:
                raise HeifError.invalid_input(
                    SubError.Invalid_parameter_value,
                    f"scan references unknown component {cs}")
            comps.append((comp, tdta >> 4, tdta & 15))
        # Ss/Se/Ah/Al ignored for sequential

        # locate end of entropy data: next marker that is not
        # RSTn/stuffing — vectorized over the 0xFF positions (a
        # byte-wise Python walk here dominated whole-image decode)
        data = self.data
        n = len(data)
        arr = np.frombuffer(data, np.uint8)
        ffs = np.nonzero(arr[pos:n - 1] == 0xFF)[0]
        end = n - 1 if n > pos else pos
        for off in ffs:
            nxt = arr[pos + off + 1]
            if nxt != 0x00 and not (0xD0 <= nxt <= 0xD7):
                end = pos + int(off)
                break
        entropy = data[pos:end]

        # allocate coefficient arrays
        interleaved = ns > 1
        h_max, v_max = frame.h_max, frame.v_max
        mcus_w = -(-frame.width // (8 * h_max))
        mcus_h = -(-frame.height // (8 * v_max))
        for comp, _, _ in comps:
            if interleaved:
                comp.blocks_w = mcus_w * comp.h
                comp.blocks_h = mcus_h * comp.v
            else:
                cw = -(-frame.width * comp.h // h_max)
                chh = -(-frame.height * comp.v // v_max)
                comp.blocks_w = -(-cw // 8)
                comp.blocks_h = -(-chh // 8)
            comp.coeffs = np.zeros((comp.blocks_h * comp.blocks_w, 64),
                                   np.int16)

        if interleaved:
            total_mcus = mcus_w * mcus_h
        else:
            comp = comps[0][0]
            total_mcus = comp.blocks_w * comp.blocks_h

        if self._decode_scan_entropy_native(entropy, frame, comps,
                                            interleaved, mcus_w, total_mcus):
            return end

        # split on restart markers
        segments = self._split_restarts(entropy)
        ri = frame.restart_interval or total_mcus
        mcu = 0
        for seg in segments:
            reader = BitReader(unstuff(seg))
            preds = {c.comp_id: 0 for c, _, _ in comps}
            seg_end = min(mcu + ri, total_mcus)
            while mcu < seg_end:
                self._decode_mcu(reader, frame, comps, interleaved,
                                 mcus_w, mcu, preds)
                mcu += 1
            if reader.exhausted:
                # libjpeg behavior: warn + pad with zero bits rather
                # than failing the whole image (jdhuff "premature end")
                frame.warnings.append(
                    f"premature end of entropy-coded data at MCU {mcu}")
            if mcu >= total_mcus:
                break
        if mcu < total_mcus:
            # segments ran out (missing restart intervals): decode the
            # remaining MCUs from zero bits, as libjpeg's resync does
            frame.warnings.append(
                f"JPEG scan truncated: {mcu}/{total_mcus} MCUs")
            reader = BitReader(np.zeros(0, np.uint8))
            preds = {c.comp_id: 0 for c, _, _ in comps}
            while mcu < total_mcus:
                self._decode_mcu(reader, frame, comps, interleaved,
                                 mcus_w, mcu, preds)
                mcu += 1
        return end

    def _decode_scan_entropy_native(self, entropy: bytes, frame: JpegFrame,
                                    comps, interleaved: bool, mcus_w: int,
                                    total_mcus: int) -> bool:
        """Run the scan through the C++ entropy engine (native/
        src/jpeg_scan.cc).  Returns False to fall back to the Python
        reference path (engine unavailable, or exotic table ids)."""
        import ctypes
        from ... import native
        lib = native.get_lib()
        if lib is None:
            return False
        for _, td, ta in comps:
            if not (0 <= td <= 3 and 0 <= ta <= 3):
                return False
            if td not in frame.huff_dc or ta not in frame.huff_ac:
                return False

        n = len(comps)
        arr_i = lambda vals: (ctypes.c_int * n)(*vals)  # noqa: E731
        dc_bits = (ctypes.c_uint8 * 64)()
        dc_vals = (ctypes.c_uint8 * 1024)()
        dc_nvals = (ctypes.c_int * 4)()
        ac_bits = (ctypes.c_uint8 * 64)()
        ac_vals = (ctypes.c_uint8 * 1024)()
        ac_nvals = (ctypes.c_int * 4)()
        for tid in range(4):
            for tbl_dict, bits_a, vals_a, nv_a in (
                    (frame.huff_dc, dc_bits, dc_vals, dc_nvals),
                    (frame.huff_ac, ac_bits, ac_vals, ac_nvals)):
                t = tbl_dict.get(tid)
                if t is None:
                    nv_a[tid] = 0
                    continue
                for i in range(16):
                    bits_a[tid * 16 + i] = t.bits[i + 1]
                for i, v in enumerate(t.values[:256]):
                    vals_a[tid * 256 + i] = v
                nv_a[tid] = len(t.values)

        ptrs = (ctypes.POINTER(ctypes.c_int16) * n)()
        for i, (comp, _, _) in enumerate(comps):
            ptrs[i] = comp.coeffs.ctypes.data_as(
                ctypes.POINTER(ctypes.c_int16))
        exhausted = ctypes.c_int(0)
        base_args = (
            entropy, ctypes.c_size_t(len(entropy)), n,
            arr_i([c.h for c, _, _ in comps]),
            arr_i([c.v for c, _, _ in comps]),
            arr_i([c.blocks_w for c, _, _ in comps]),
            arr_i([c.blocks_h for c, _, _ in comps]),
            arr_i([td for _, td, _ in comps]),
            arr_i([ta for _, _, ta in comps]),
            ptrs, dc_bits, dc_vals, dc_nvals, ac_bits, ac_vals, ac_nvals,
            int(interleaved), mcus_w, total_mcus,
            frame.restart_interval, ctypes.byref(exhausted))

        # pipelined scan+recon (one pass over the image: the consumer
        # thread runs IDCT bands while the Huffman chain advances) when
        # this single scan covers the whole frame
        recon = None
        if len(comps) == len(frame.components) and \
                all(c.tq in frame.quant for c, _, _ in comps) and \
                hasattr(lib, "tpuheif_jpeg_decode_scan_recon"):
            outs = []
            quants = []
            out_ptrs = (ctypes.POINTER(ctypes.c_uint8) * n)()
            q_ptrs = (ctypes.POINTER(ctypes.c_int32) * n)()
            strides = (ctypes.c_int64 * n)()
            for i, (comp, _, _) in enumerate(comps):
                out = np.empty((comp.blocks_h * 8, comp.blocks_w * 8),
                               np.uint8)
                q = np.ascontiguousarray(frame.quant[comp.tq], np.int32)
                outs.append(out)
                quants.append(q)
                out_ptrs[i] = out.ctypes.data_as(
                    ctypes.POINTER(ctypes.c_uint8))
                q_ptrs[i] = q.ctypes.data_as(
                    ctypes.POINTER(ctypes.c_int32))
                strides[i] = comp.blocks_w * 8
            rc = lib.tpuheif_jpeg_decode_scan_recon(
                *base_args, q_ptrs, out_ptrs, strides)
            recon = outs
        else:
            rc = lib.tpuheif_jpeg_decode_scan(*base_args)
        if rc == -1:
            raise HeifError.invalid_input(SubError.Invalid_parameter_value,
                                          "invalid huffman code")
        if rc == -2:
            raise HeifError.invalid_input(
                SubError.Invalid_parameter_value,
                "AC coefficient index out of range")
        if rc == -4:
            return False   # segments ran out: python path pads + warns
        if rc != 0:
            return False
        if exhausted.value:
            frame.warnings.append(
                "premature end of entropy-coded data")
        if recon is not None:
            frame.recon_planes = recon
        return True

    @staticmethod
    def _split_restarts(entropy: bytes) -> List[bytes]:
        out = []
        start = 0
        i = 0
        n = len(entropy)
        while i < n - 1:
            if entropy[i] == 0xFF and 0xD0 <= entropy[i + 1] <= 0xD7:
                out.append(entropy[start:i])
                start = i + 2
                i += 2
            else:
                i += 1
        out.append(entropy[start:])
        return out

    def _decode_mcu(self, reader: BitReader, frame: JpegFrame, comps,
                    interleaved: bool, mcus_w: int, mcu: int, preds):
        if interleaved:
            my, mx = divmod(mcu, mcus_w)
            for comp, td, ta in comps:
                dc_t = frame.huff_dc.get(td)
                ac_t = frame.huff_ac.get(ta)
                if dc_t is None or ac_t is None:
                    raise HeifError.invalid_input(
                        SubError.Invalid_parameter_value,
                        "missing huffman table")
                for by in range(comp.v):
                    for bx in range(comp.h):
                        row = my * comp.v + by
                        col = mx * comp.h + bx
                        idx = row * comp.blocks_w + col
                        self._decode_block(reader, comp, idx, dc_t, ac_t,
                                           preds)
        else:
            comp, td, ta = comps[0]
            dc_t = frame.huff_dc.get(td)
            ac_t = frame.huff_ac.get(ta)
            if dc_t is None or ac_t is None:
                raise HeifError.invalid_input(
                    SubError.Invalid_parameter_value, "missing huffman table")
            self._decode_block(reader, comp, mcu, dc_t, ac_t, preds)

    @staticmethod
    def _decode_block(reader: BitReader, comp: JpegComponent, idx: int,
                      dc_t: HuffTable, ac_t: HuffTable, preds):
        block = comp.coeffs[idx]
        s = reader.decode_symbol(dc_t)
        diff = extend(reader.read_bits(s), s) if s else 0
        preds[comp.comp_id] += diff
        block[0] = preds[comp.comp_id]
        k = 1
        while k < 64:
            rs = reader.decode_symbol(ac_t)
            r, s = rs >> 4, rs & 15
            if s == 0:
                if r == 15:         # ZRL
                    k += 16
                    continue
                break               # EOB
            k += r
            if k > 63:
                raise HeifError.invalid_input(
                    SubError.Invalid_parameter_value,
                    "AC coefficient index out of range")
            block[k] = extend(reader.read_bits(s), s)
            k += 1


# ------------------------------------------------------------------ recon

_RECON_JIT = {}


def _recon_program(bh: int, bw: int, backend: str):
    """Compiled dequant + de-zigzag + batched islow IDCT + reassembly
    for one block grid (cached per shape; CPU backend for single-image
    host decode so dispatch isn\'t relay-latency-bound, device backend
    available for batched pipelines)."""
    key = (bh, bw, backend)
    fn = _RECON_JIT.get(key)
    if fn is None:
        import jax
        import jax.numpy as jnp
        from .idct import idct8x8_islow

        zz = np.asarray(ZIGZAG)

        def run(coeffs, quant):
            nb = bh * bw
            dq = jnp.zeros((nb, 64), jnp.int32)
            dq = dq.at[:, zz].set(coeffs.astype(jnp.int32) *
                                  quant[zz][None, :])
            blocks = idct8x8_islow(dq.reshape(nb, 8, 8))
            plane = blocks.reshape(bh, bw, 8, 8).transpose(
                0, 2, 1, 3).reshape(bh * 8, bw * 8)
            return plane.astype(jnp.uint8)

        device = jax.local_devices(backend=backend)[0]
        fn = jax.jit(run, device=device)
        _RECON_JIT[key] = fn
    return fn


def reconstruct_component(comp: JpegComponent, quant: np.ndarray):
    """coeffs (N,64 zigzag) → (blocks_h*8, blocks_w*8) uint8 plane.

    Native C++ path (dequant + de-zigzag + islow IDCT + reassembly in
    native/src/jpeg_scan.cc, bit-compatible with jpeg_idct_islow);
    falls back to the compiled jnp program (the difftest anchor and
    the batched-device path)."""
    import os
    backend = os.environ.get("LIBHEIF_TPU_JPEG_BACKEND", "native")
    if backend == "native":
        from ... import native
        lib = native.get_lib()
        if lib is not None:
            import ctypes
            bh, bw = comp.blocks_h, comp.blocks_w
            co = np.ascontiguousarray(comp.coeffs, np.int16)
            q = np.ascontiguousarray(quant, np.int32)
            out = np.empty((bh * 8, bw * 8), np.uint8)
            lib.tpuheif_jpeg_recon.restype = ctypes.c_int
            lib.tpuheif_jpeg_recon(
                co.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
                ctypes.c_int(bh), ctypes.c_int(bw),
                q.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                ctypes.c_int64(bw * 8))
            return out
        backend = "cpu"
    try:
        fn = _recon_program(comp.blocks_h, comp.blocks_w, backend)
    except RuntimeError:
        fn = _recon_program(comp.blocks_h, comp.blocks_w, None)
    return np.asarray(fn(comp.coeffs, np.asarray(quant)))


_RECON_POOL = None


def _recon_pool():
    global _RECON_POOL
    if _RECON_POOL is None:
        from concurrent.futures import ThreadPoolExecutor
        _RECON_POOL = ThreadPoolExecutor(
            max_workers=8, thread_name_prefix="jpeg-recon")
    return _RECON_POOL


def _recon_native_striped(frame):
    """Stripe-parallel native recon of all components through one flat
    task pool (the C recon releases the GIL; luma is split into block-
    row stripes so the wall time is not luma-bound).  Returns planes or
    None when the native engine is unavailable."""
    from ... import native
    lib = native.get_lib()
    if lib is None:
        return None
    import ctypes
    lib.tpuheif_jpeg_recon.restype = ctypes.c_int
    tasks = []
    outs = []
    for c in frame.components:
        bh, bw = c.blocks_h, c.blocks_w
        co = np.ascontiguousarray(c.coeffs, np.int16)
        q = np.ascontiguousarray(frame.quant[c.tq], np.int32)
        out = np.empty((bh * 8, bw * 8), np.uint8)
        outs.append(out)
        n_stripes = max(1, min(4, bh // 8))
        bounds = [bh * i // n_stripes for i in range(n_stripes + 1)]
        for s in range(n_stripes):
            b0, b1 = bounds[s], bounds[s + 1]
            if b0 == b1:
                continue

            def run(co=co, q=q, out=out, b0=b0, b1=b1, bw=bw):
                lib.tpuheif_jpeg_recon(
                    co[b0 * bw:b1 * bw].ctypes.data_as(
                        ctypes.POINTER(ctypes.c_int16)),
                    ctypes.c_int(b1 - b0), ctypes.c_int(bw),
                    q.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                    out[b0 * 8:].ctypes.data_as(
                        ctypes.POINTER(ctypes.c_uint8)),
                    ctypes.c_int64(bw * 8))
            tasks.append(run)
    if len(tasks) > 1:
        pool = _recon_pool()
        list(pool.map(lambda f: f(), tasks))
    else:
        for t in tasks:
            t()
    return outs


def decode_jpeg(data: bytes) -> PixelImage:
    """Decode a complete JFIF/raw JPEG stream to a PixelImage."""
    frame = JpegParser(data).parse()
    ncomp = len(frame.components)
    for c in frame.components:
        if c.coeffs is None:
            raise HeifError.invalid_input(SubError.Invalid_parameter_value,
                                          "component missing from scans")
        if c.tq not in frame.quant:
            raise HeifError.invalid_input(SubError.Invalid_parameter_value,
                                          f"missing quant table {c.tq}")

    h_max, v_max = frame.h_max, frame.v_max

    def _crop(c, p):
        cw = -(-frame.width * c.h // h_max)
        ch = -(-frame.height * c.v // v_max)
        return p[:ch, :cw]

    import os
    planes = None
    if os.environ.get("LIBHEIF_TPU_JPEG_BACKEND", "native") == "native":
        full = getattr(frame, "recon_planes", None)
        if full is None:
            full = _recon_native_striped(frame)
        if full is not None:
            planes = [_crop(c, p)
                      for c, p in zip(frame.components, full)]

    if planes is None:
        def _recon(c):
            return _crop(c, reconstruct_component(c, frame.quant[c.tq]))

        if ncomp > 1:
            # the jnp recon also benefits from per-component threads
            from concurrent.futures import ThreadPoolExecutor
            with ThreadPoolExecutor(max_workers=min(ncomp, 3)) as ex:
                planes = list(ex.map(_recon, frame.components))
        else:
            planes = [_recon(frame.components[0])]

    if ncomp == 1:
        img = PixelImage(frame.width, frame.height, Colorspace.Monochrome,
                         Chroma.Monochrome)
        img.set_plane(Channel.Y, planes[0], 8)
        for wmsg in frame.warnings:
            img.add_warning(HeifError.eof(wmsg))
        return img
    if ncomp == 3:
        hv = [(c.h, c.v) for c in frame.components]
        rel = [(h_max // h if h_max % h == 0 else 0,
                v_max // v if v_max % v == 0 else 0) for h, v in hv]
        if rel[1] != rel[2] or rel[0] != (1, 1):
            raise HeifError.unsupported(
                SubError.Unsupported_color_conversion,
                f"unsupported JPEG sampling {hv}")
        sub = {(1, 1): Chroma.C444, (2, 1): Chroma.C422,
               (2, 2): Chroma.C420}.get(rel[1])
        if sub is None:
            raise HeifError.unsupported(
                SubError.Unsupported_color_conversion,
                f"unsupported JPEG chroma geometry {hv}")
        img = PixelImage(frame.width, frame.height, Colorspace.YCbCr, sub)
        img.set_plane(Channel.Y, planes[0], 8)
        img.set_plane(Channel.Cb, planes[1], 8)
        img.set_plane(Channel.Cr, planes[2], 8)
        for wmsg in frame.warnings:
            img.add_warning(HeifError.eof(wmsg))
        from ...color.nclx import NclxProfile
        img.color_profile_nclx = NclxProfile(
            color_primaries=2, transfer_characteristics=2,
            matrix_coefficients=6, full_range_flag=True)
        return img
    raise HeifError.unsupported(SubError.Unsupported_color_conversion,
                                f"JPEG with {ncomp} components")


class JpegDecoder(Decoder):
    """Registry decoder for `jpeg` items (ref: jpeg_dec.cc Decoder_JPEG)."""

    id = "tpu-jpeg"
    format = "jpeg"
    priority = 100

    def decode_single_image(self, config_box, data: bytes,
                            declared_size=None, limits=None):
        if limits is not None and declared_size:
            limits.check_image_size(*declared_size)
        img = decode_jpeg(data)
        if limits is not None:
            limits.check_image_size(img.width, img.height)
        return img


def _register():
    register_decoder(JpegDecoder())


_register()
