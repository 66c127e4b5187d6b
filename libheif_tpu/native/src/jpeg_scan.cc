// JPEG baseline entropy-scan decoder (native host runtime).
//
// The serial Huffman chain is the one part of JPEG decode that cannot
// be vectorized onto the TPU (SURVEY.md §7 hard part (a)); the
// reference gets it natively from libjpeg behind the plugin ABI
// (plugins/decoder_libjpeg.cc).  This is the engine's own native
// implementation: semantics identical to the pure-Python reference
// path in codecs/jpeg/decoder.py (which remains the portable
// fallback and the difftest anchor).
//
// C ABI only; driven from Python via ctypes.

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct BitReader;

struct HuffLut {
  // 9-bit lookahead (libjpeg-turbo style): (sym << 4) | len for codes
  // of length <= 9; 0 means "long code, use the canonical slow path".
  // The former full 16-bit tables (192KB each, ~770KB live) thrashed
  // L2 and dominated scan decode.
  uint16_t fast[1 << 9];
  int32_t maxcode[17];   // largest code of each length, -1 if none
  int32_t valoff[17];    // huffval index of mincode at each length
  uint8_t huffval[256];
  bool valid = false;

  void build(const uint8_t bits[16], const uint8_t* vals, int nvals) {
    std::memset(fast, 0, sizeof(fast));
    for (int l = 0; l <= 16; ++l) { maxcode[l] = -1; valoff[l] = 0; }
    std::memcpy(huffval, vals, nvals < 256 ? nvals : 256);
    int code = 0, k = 0;
    for (int ln = 1; ln <= 16; ++ln) {
      if (bits[ln - 1] > 0) {
        valoff[ln] = k - code;     // huffval[valoff[ln] + code]
        for (int i = 0; i < bits[ln - 1]; ++i) {
          if (k >= nvals) { valid = false; return; }
          if (ln <= 9) {
            int shift = 9 - ln;
            int base = code << shift;
            uint16_t e = static_cast<uint16_t>((vals[k] << 4) | ln);
            for (int j = 0; j < (1 << shift); ++j) fast[base + j] = e;
          }
          ++code;
          ++k;
        }
        maxcode[ln] = code - 1;
      }
      code <<= 1;
    }
    valid = true;
  }

  // decode one symbol; returns -1 on invalid code
  inline int decode(BitReader& br);
};

struct BitReader {
  const uint8_t* data;
  size_t size;
  size_t pos = 0;
  uint64_t acc = 0;
  int nbits = 0;
  bool exhausted = false;

  void fill(int need) {
    if (nbits >= need) return;
    if (pos + 8 <= size) {
      // bulk top-up from one 64-bit load (keeps nbits <= 56 so the
      // accumulator's high byte never truncates a pending value)
      uint64_t chunk;
      std::memcpy(&chunk, data + pos, 8);
      chunk = __builtin_bswap64(chunk);
      int take = (56 - nbits) >> 3;
      acc = (acc << (8 * take)) | (chunk >> (64 - 8 * take));
      nbits += 8 * take;
      pos += take;
      return;
    }
    while (nbits < need) {
      uint8_t b = 0;
      if (pos < size) {
        b = data[pos++];
      } else {
        exhausted = true;
      }
      acc = (acc << 8) | b;
      nbits += 8;
    }
  }
  int peek16() {
    fill(16);
    return static_cast<int>((acc >> (nbits - 16)) & 0xFFFF);
  }
  // top up to >= 32 bits when a bulk load is safe, so a symbol+value
  // pair decodes with no further fill checks; near the stream tail
  // this is a no-op and the padded fill(16) semantics are unchanged
  inline void prefill() {
    if (nbits < 32 && pos + 8 <= size) fill(32);
  }
  int read_bits(int n) {
    if (n == 0) return 0;
    fill(n);
    int v = static_cast<int>((acc >> (nbits - n)) & ((1u << n) - 1));
    nbits -= n;
    return v;
  }
};

inline int HuffLut::decode(BitReader& br) {
  br.fill(16);
  int look = static_cast<int>((br.acc >> (br.nbits - 16)) & 0xFFFF);
  uint16_t e = fast[look >> 7];
  if (e) {
    br.nbits -= e & 0xF;
    return e >> 4;
  }
  // canonical slow path for 10..16-bit codes: prefix-freeness means a
  // too-short prefix always exceeds that length's maxcode
  for (int l = 10; l <= 16; ++l) {
    int code = look >> (16 - l);
    if (maxcode[l] >= 0 && code <= maxcode[l]) {
      br.nbits -= l;
      return huffval[valoff[l] + code];
    }
  }
  return -1;
}

inline int extend(int v, int size) {
  if (size == 0) return 0;
  if (v < (1 << (size - 1))) return v - (1 << size) + 1;
  return v;
}

struct Comp {
  int h, v, blocks_w, blocks_h;
  int dc_tbl, ac_tbl;
  int16_t* coeffs;  // (blocks_h*blocks_w, 64), zigzag order
  int id;
};

}  // namespace

extern "C" {

// Decode one sequential scan.
//
// entropy: raw entropy-coded bytes (still containing 0xFF00 stuffing
//          and RSTn markers), exactly the [SOS-end, next-marker) span.
// Tables: 4 DC + 4 AC slots, each 16 bits-counts + up to 256 values.
// Returns 0 on success, negative error codes otherwise.
// *exhausted_out is set when the scan zero-padded past the end
// (truncated stream — caller surfaces a decode warning).
int tpuheif_jpeg_decode_scan(
    const uint8_t* entropy, size_t entropy_len,
    int ncomp,
    const int* comp_h, const int* comp_v,
    const int* comp_blocks_w, const int* comp_blocks_h,
    const int* comp_dc_tbl, const int* comp_ac_tbl,
    int16_t** comp_coeffs,
    const uint8_t* dc_bits /*4x16*/, const uint8_t* dc_vals /*4x256*/,
    const int* dc_nvals,
    const uint8_t* ac_bits, const uint8_t* ac_vals, const int* ac_nvals,
    int interleaved, int mcus_w, int total_mcus, int restart_interval,
    int* exhausted_out) {
  HuffLut dc_lut[4], ac_lut[4];
  for (int i = 0; i < 4; ++i) {
    if (dc_nvals[i] > 0) dc_lut[i].build(dc_bits + 16 * i, dc_vals + 256 * i,
                                         dc_nvals[i]);
    if (ac_nvals[i] > 0) ac_lut[i].build(ac_bits + 16 * i, ac_vals + 256 * i,
                                         ac_nvals[i]);
  }
  std::vector<Comp> comps(ncomp);
  for (int i = 0; i < ncomp; ++i) {
    comps[i] = Comp{comp_h[i], comp_v[i], comp_blocks_w[i],
                    comp_blocks_h[i], comp_dc_tbl[i], comp_ac_tbl[i],
                    comp_coeffs[i], i};
    int t = comps[i].dc_tbl, a = comps[i].ac_tbl;
    if (t < 0 || t > 3 || !dc_lut[t].valid) return -3;
    if (a < 0 || a > 3 || !ac_lut[a].valid) return -3;
  }

  // split entropy data on RSTn markers (same segmentation as the
  // Python reference path)
  std::vector<std::pair<size_t, size_t>> segs;  // [start, end)
  {
    size_t start = 0, i = 0;
    while (i + 1 < entropy_len) {
      if (entropy[i] == 0xFF && entropy[i + 1] >= 0xD0 &&
          entropy[i + 1] <= 0xD7) {
        segs.emplace_back(start, i);
        start = i + 2;
        i += 2;
      } else {
        ++i;
      }
    }
    segs.emplace_back(start, entropy_len);
  }

  int ri = restart_interval > 0 ? restart_interval : total_mcus;
  int mcu = 0;
  bool exhausted = false;
  std::vector<uint8_t> clean;
  int preds[16];

  for (auto& seg : segs) {
    // unstuff FF00 -> FF
    clean.clear();
    clean.reserve(seg.second - seg.first);
    for (size_t i = seg.first; i < seg.second; ++i) {
      uint8_t b = entropy[i];
      clean.push_back(b);
      if (b == 0xFF && i + 1 < seg.second && entropy[i + 1] == 0x00) ++i;
    }
    BitReader br{clean.data(), clean.size()};
    for (int i = 0; i < ncomp; ++i) preds[i] = 0;

    int seg_end = mcu + ri;
    if (seg_end > total_mcus) seg_end = total_mcus;
    for (; mcu < seg_end; ++mcu) {
      int ncblocks = interleaved ? ncomp : 1;
      for (int ci = 0; ci < ncblocks; ++ci) {
        Comp& c = comps[ci];
        HuffLut& dt = dc_lut[c.dc_tbl];
        HuffLut& at = ac_lut[c.ac_tbl];
        int nby = interleaved ? c.v : 1;
        int nbx = interleaved ? c.h : 1;
        for (int by = 0; by < nby; ++by) {
          for (int bx = 0; bx < nbx; ++bx) {
            int idx;
            if (interleaved) {
              int my = mcu / mcus_w, mx = mcu % mcus_w;
              idx = (my * c.v + by) * c.blocks_w + (mx * c.h + bx);
            } else {
              idx = mcu;
            }
            int16_t* block = c.coeffs + static_cast<size_t>(idx) * 64;
            // DC
            br.prefill();
            int s = dt.decode(br);
            if (s < 0) return -1;
            int diff = s ? extend(br.read_bits(s), s) : 0;
            preds[ci] += diff;
            block[0] = static_cast<int16_t>(preds[ci]);
            // AC
            int k = 1;
            while (k < 64) {
              br.prefill();
              int rs = at.decode(br);
              if (rs < 0) return -1;
              int r = rs >> 4;
              s = rs & 15;
              if (s == 0) {
                if (r == 15) { k += 16; continue; }
                break;  // EOB
              }
              k += r;
              if (k > 63) return -2;
              block[k] = static_cast<int16_t>(extend(br.read_bits(s), s));
              ++k;
            }
          }
        }
      }
    }
    if (br.exhausted) exhausted = true;
    if (mcu >= total_mcus) break;
  }
  *exhausted_out = exhausted ? 1 : 0;
  return mcu < total_mcus ? -4 : 0;
}

// ---------------------------------------------------------------------
// Dequant + de-zigzag + islow IDCT + plane assembly — the native
// counterpart of codecs/jpeg/{decoder.py _recon_program, idct.py
// idct8x8_islow}; bit-compatible with libjpeg's jpeg_idct_islow so the
// PIL/libjpeg difftests keep passing unchanged.

namespace {

const int kZigzag[64] = {
  0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
  12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
  35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
  58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
};

const int32_t kF0_298631336 = 2446, kF0_390180644 = 3196;
const int32_t kF0_541196100 = 4433, kF0_765366865 = 6270;
const int32_t kF0_899976223 = 7373, kF1_175875602 = 9633;
const int32_t kF1_501321110 = 12299, kF1_847759065 = 15137;
const int32_t kF1_961570560 = 16069, kF2_053119869 = 16819;
const int32_t kF2_562915447 = 20995, kF3_072711026 = 25172;
const int kConstBits = 13, kPass1Bits = 2;

inline int32_t descale(int32_t x, int n) {
  return (x + (1 << (n - 1))) >> n;
}

inline void idct_1d(int32_t c0, int32_t c1, int32_t c2, int32_t c3,
                    int32_t c4, int32_t c5, int32_t c6, int32_t c7,
                    int bits, int32_t* o) {
  int32_t z1 = (c2 + c6) * kF0_541196100;
  int32_t tmp2 = z1 - c6 * kF1_847759065;
  int32_t tmp3 = z1 + c2 * kF0_765366865;
  int32_t tmp0 = (c0 + c4) << kConstBits;
  int32_t tmp1 = (c0 - c4) << kConstBits;
  int32_t tmp10 = tmp0 + tmp3, tmp13 = tmp0 - tmp3;
  int32_t tmp11 = tmp1 + tmp2, tmp12 = tmp1 - tmp2;
  int32_t t0 = c7, t1 = c5, t2 = c3, t3 = c1;
  z1 = t0 + t3;
  int32_t z2 = t1 + t2, z3 = t0 + t2, z4 = t1 + t3;
  int32_t z5 = (z3 + z4) * kF1_175875602;
  t0 *= kF0_298631336;
  t1 *= kF2_053119869;
  t2 *= kF3_072711026;
  t3 *= kF1_501321110;
  z1 *= -kF0_899976223;
  z2 *= -kF2_562915447;
  z3 = z3 * -kF1_961570560 + z5;
  z4 = z4 * -kF0_390180644 + z5;
  t0 += z1 + z3;
  t1 += z2 + z4;
  t2 += z2 + z3;
  t3 += z1 + z4;
  o[0] = descale(tmp10 + t3, bits);
  o[1] = descale(tmp11 + t2, bits);
  o[2] = descale(tmp12 + t1, bits);
  o[3] = descale(tmp13 + t0, bits);
  o[4] = descale(tmp13 - t0, bits);
  o[5] = descale(tmp12 - t1, bits);
  o[6] = descale(tmp11 - t2, bits);
  o[7] = descale(tmp10 - t3, bits);
}

}  // namespace

// coeffs: (bh*bw, 64) int16 in zigzag order; quant: 64 int32 in
// NATURAL order (indexed quant[zigzag[i]] like the Python path);
// out: (bh*8) x (bw*8) uint8 plane with row stride `stride`.
int tpuheif_jpeg_recon(const int16_t* coeffs, int bh, int bw,
                       const int32_t* quant, uint8_t* out,
                       int64_t stride) {
  int32_t dq[64], ws[64], col[8], row[8];
  for (int by = 0; by < bh; ++by) {
    for (int bx = 0; bx < bw; ++bx) {
      const int16_t* c = coeffs + (static_cast<int64_t>(by) * bw + bx) * 64;
      for (int i = 0; i < 64; ++i)
        dq[kZigzag[i]] = static_cast<int32_t>(c[i]) * quant[kZigzag[i]];
      // pass 1: columns (zero-AC shortcut matches the full butterfly
      // exactly: (dc<<13 + 1<<10) >> 11 == dc << 2)
      for (int x = 0; x < 8; ++x) {
        if ((dq[8 + x] | dq[16 + x] | dq[24 + x] | dq[32 + x] |
             dq[40 + x] | dq[48 + x] | dq[56 + x]) == 0) {
          int32_t v = dq[x] << kPass1Bits;
          for (int y = 0; y < 8; ++y) ws[y * 8 + x] = v;
          continue;
        }
        idct_1d(dq[x], dq[8 + x], dq[16 + x], dq[24 + x], dq[32 + x],
                dq[40 + x], dq[48 + x], dq[56 + x],
                kConstBits - kPass1Bits, col);
        for (int y = 0; y < 8; ++y) ws[y * 8 + x] = col[y];
      }
      // pass 2: rows
      uint8_t* dst = out + (static_cast<int64_t>(by) * 8) * stride + bx * 8;
      for (int y = 0; y < 8; ++y) {
        idct_1d(ws[y * 8], ws[y * 8 + 1], ws[y * 8 + 2], ws[y * 8 + 3],
                ws[y * 8 + 4], ws[y * 8 + 5], ws[y * 8 + 6], ws[y * 8 + 7],
                kConstBits + kPass1Bits + 3, row);
        uint8_t* d = dst + static_cast<int64_t>(y) * stride;
        for (int x = 0; x < 8; ++x) {
          int32_t v = row[x] + 128;
          d[x] = static_cast<uint8_t>(v < 0 ? 0 : (v > 255 ? 255 : v));
        }
      }
    }
  }
  return 0;
}

}  // extern "C"
