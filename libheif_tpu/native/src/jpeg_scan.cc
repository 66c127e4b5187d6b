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

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
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
  inline int decode_nofill(BitReader& br);
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
  // bulk refill with the tail bound already established by the caller
  inline void refill_unchecked() {
    uint64_t chunk;
    std::memcpy(&chunk, data + pos, 8);
    chunk = __builtin_bswap64(chunk);
    int take = (56 - nbits) >> 3;
    acc = (acc << (8 * take)) | (chunk >> (64 - 8 * take));
    nbits += 8 * take;
    pos += take;
  }
  int read_bits(int n) {
    if (n == 0) return 0;
    fill(n);
    int v = static_cast<int>((acc >> (nbits - n)) & ((1u << n) - 1));
    nbits -= n;
    return v;
  }
  inline int read_bits_nofill(int n) {
    if (n == 0) return 0;
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

// symbol decode with the accumulator known to hold >= 16 bits
inline int HuffLut::decode_nofill(BitReader& br) {
  int look = static_cast<int>((br.acc >> (br.nbits - 16)) & 0xFFFF);
  uint16_t e = fast[look >> 7];
  if (e) {
    br.nbits -= e & 0xF;
    return e >> 4;
  }
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

// Decode one 8x8 block with branchless per-coefficient refills over a
// top-aligned 64-bit bit buffer; the caller guarantees >= 264 readable
// bytes (a block consumes at most 64 coefficient pairs x 32 bits, and
// each refill advances pos by at most 7).  Returns 0 ok, <0 error.
inline int decode_block_fast(BitReader& br, HuffLut& dt, HuffLut& at,
                             int16_t* block, int* pred) {
  // convert to the top-aligned representation
  uint64_t buf = br.nbits ? (br.acc << (64 - br.nbits)) : 0;
  int cnt = br.nbits;
  size_t pos = br.pos;
  const uint8_t* data = br.data;
  int err = 0;

#define TPUJ_REFILL()                                        \
  do {                                                       \
    uint64_t chunk_;                                         \
    std::memcpy(&chunk_, data + pos, 8);                     \
    buf |= __builtin_bswap64(chunk_) >> cnt;                 \
    pos += (63 - cnt) >> 3;                                  \
    cnt |= 56;                                               \
  } while (0)

#define TPUJ_SYM(lut, out_sym)                               \
  do {                                                       \
    uint16_t e_ = (lut).fast[buf >> 55];                     \
    if (e_) {                                                \
      int l_ = e_ & 0xF;                                     \
      buf <<= l_;                                            \
      cnt -= l_;                                             \
      (out_sym) = e_ >> 4;                                   \
    } else {                                                 \
      int look_ = static_cast<int>(buf >> 48);               \
      (out_sym) = -1;                                        \
      for (int l_ = 10; l_ <= 16; ++l_) {                    \
        int code_ = look_ >> (16 - l_);                      \
        if ((lut).maxcode[l_] >= 0 &&                        \
            code_ <= (lut).maxcode[l_]) {                    \
          buf <<= l_;                                        \
          cnt -= l_;                                         \
          (out_sym) = (lut).huffval[(lut).valoff[l_] + code_]; \
          break;                                             \
        }                                                    \
      }                                                      \
    }                                                        \
  } while (0)

  TPUJ_REFILL();
  int s;
  TPUJ_SYM(dt, s);
  if (s < 0) { err = -1; goto done; }
  if (s) {
    int v = static_cast<int>(buf >> (64 - s));
    buf <<= s;
    cnt -= s;
    *pred += extend(v, s);
  }
  block[0] = static_cast<int16_t>(*pred);
  {
    int k = 1;
    while (k < 64) {
      TPUJ_REFILL();
      int rs;
      TPUJ_SYM(at, rs);
      if (rs < 0) { err = -1; goto done; }
      int r = rs >> 4;
      s = rs & 15;
      if (s == 0) {
        if (r == 15) { k += 16; continue; }
        break;  // EOB
      }
      k += r;
      if (k > 63) { err = -2; goto done; }
      int v = static_cast<int>(buf >> (64 - s));
      buf <<= s;
      cnt -= s;
      block[k] = static_cast<int16_t>(extend(v, s));
      ++k;
    }
  }
done:
#undef TPUJ_REFILL
#undef TPUJ_SYM
  // convert back to the bottom-aligned reader state
  br.acc = cnt ? (buf >> (64 - cnt)) : 0;
  br.nbits = cnt;
  br.pos = pos;
  return err;
}

// Tail-safe variant (zero-padded reads past the end).
inline int decode_block_safe(BitReader& br, HuffLut& dt, HuffLut& at,
                             int16_t* block, int* pred) {
  br.prefill();
  int s = dt.decode(br);
  if (s < 0) return -1;
  *pred += s ? extend(br.read_bits(s), s) : 0;
  block[0] = static_cast<int16_t>(*pred);
  int k = 1;
  while (k < 64) {
    br.prefill();
    int rs = at.decode(br);
    if (rs < 0) return -1;
    int r = rs >> 4;
    s = rs & 15;
    if (s == 0) {
      if (r == 15) { k += 16; continue; }
      return 0;
    }
    k += r;
    if (k > 63) return -2;
    block[k] = static_cast<int16_t>(extend(br.read_bits(s), s));
    ++k;
  }
  return 0;
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
static int tpuheif_jpeg_decode_scan_impl(
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
    int* exhausted_out, std::atomic<int>* mcu_rows_done) {
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
    // unstuff FF00 -> FF: memchr-run copies (0xFF bytes are ~1/256 of
    // the stream, so this is bulk memcpy instead of a per-byte loop)
    clean.clear();
    clean.reserve(seg.second - seg.first);
    {
      const uint8_t* p = entropy + seg.first;
      const uint8_t* end = entropy + seg.second;
      while (p < end) {
        const uint8_t* ff = static_cast<const uint8_t*>(
            std::memchr(p, 0xFF, static_cast<size_t>(end - p)));
        if (ff == nullptr) {
          clean.insert(clean.end(), p, end);
          break;
        }
        clean.insert(clean.end(), p, ff + 1);   // include the 0xFF
        p = ff + 1;
        if (p < end && *p == 0x00) ++p;         // drop the stuffing byte
      }
    }
    BitReader br{clean.data(), clean.size()};
    for (int i = 0; i < ncomp; ++i) preds[i] = 0;

    int seg_end = mcu + ri;
    if (seg_end > total_mcus) seg_end = total_mcus;
    int my = mcus_w ? mcu / mcus_w : 0;
    int mx = mcus_w ? mcu % mcus_w : 0;
    for (; mcu < seg_end; ++mcu) {
      int ncblocks = interleaved ? ncomp : 1;
      // a whole block's worst case fits in 264 bytes: refills inside
      // decode_block_fast then need no bound checks
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
              idx = (my * c.v + by) * c.blocks_w + (mx * c.h + bx);
            } else {
              idx = mcu;
            }
            int16_t* block = c.coeffs + static_cast<size_t>(idx) * 64;
            int rc;
            if (br.pos + 264 <= br.size) {
              rc = decode_block_fast(br, dt, at, block, &preds[ci]);
            } else {
              rc = decode_block_safe(br, dt, at, block, &preds[ci]);
            }
            if (rc < 0) return rc;
          }
        }
      }
      if (++mx == mcus_w) {
        mx = 0;
        ++my;
        if (mcu_rows_done)
          mcu_rows_done->store(my, std::memory_order_release);
      }
    }
    if (br.exhausted) exhausted = true;
    if (mcu >= total_mcus) break;
  }
  *exhausted_out = exhausted ? 1 : 0;
  return mcu < total_mcus ? -4 : 0;
}

int tpuheif_jpeg_decode_scan(
    const uint8_t* entropy, size_t entropy_len,
    int ncomp,
    const int* comp_h, const int* comp_v,
    const int* comp_blocks_w, const int* comp_blocks_h,
    const int* comp_dc_tbl, const int* comp_ac_tbl,
    int16_t** comp_coeffs,
    const uint8_t* dc_bits, const uint8_t* dc_vals, const int* dc_nvals,
    const uint8_t* ac_bits, const uint8_t* ac_vals, const int* ac_nvals,
    int interleaved, int mcus_w, int total_mcus, int restart_interval,
    int* exhausted_out) {
  return tpuheif_jpeg_decode_scan_impl(
      entropy, entropy_len, ncomp, comp_h, comp_v, comp_blocks_w,
      comp_blocks_h, comp_dc_tbl, comp_ac_tbl, comp_coeffs, dc_bits,
      dc_vals, dc_nvals, ac_bits, ac_vals, ac_nvals, interleaved, mcus_w,
      total_mcus, restart_interval, exhausted_out, nullptr);
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

// ---- 8-lane vectorized islow (GCC vector extensions; elementwise
// identical integer arithmetic, so bit-compatible with the scalar
// path and with libjpeg's jpeg_idct_islow) ----

typedef int32_t v8si __attribute__((vector_size(32)));

inline v8si descale_v(v8si x, int n) {
  return (x + (1 << (n - 1))) >> n;
}

inline void idct_1d_v(v8si c0, v8si c1, v8si c2, v8si c3, v8si c4,
                      v8si c5, v8si c6, v8si c7, int bits, v8si* o) {
  v8si z1 = (c2 + c6) * kF0_541196100;
  v8si tmp2 = z1 - c6 * kF1_847759065;
  v8si tmp3 = z1 + c2 * kF0_765366865;
  v8si tmp0 = (c0 + c4) << kConstBits;
  v8si tmp1 = (c0 - c4) << kConstBits;
  v8si tmp10 = tmp0 + tmp3, tmp13 = tmp0 - tmp3;
  v8si tmp11 = tmp1 + tmp2, tmp12 = tmp1 - tmp2;
  v8si t0 = c7, t1 = c5, t2 = c3, t3 = c1;
  z1 = t0 + t3;
  v8si z2 = t1 + t2, z3 = t0 + t2, z4 = t1 + t3;
  v8si z5 = (z3 + z4) * kF1_175875602;
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
  o[0] = descale_v(tmp10 + t3, bits);
  o[1] = descale_v(tmp11 + t2, bits);
  o[2] = descale_v(tmp12 + t1, bits);
  o[3] = descale_v(tmp13 + t0, bits);
  o[4] = descale_v(tmp13 - t0, bits);
  o[5] = descale_v(tmp12 - t1, bits);
  o[6] = descale_v(tmp11 - t2, bits);
  o[7] = descale_v(tmp10 - t3, bits);
}

inline void transpose8(v8si m[8]) {
  const v8si lo32 = {0, 8, 1, 9, 4, 12, 5, 13};
  const v8si hi32 = {2, 10, 3, 11, 6, 14, 7, 15};
  v8si t0 = __builtin_shuffle(m[0], m[1], lo32);
  v8si t1 = __builtin_shuffle(m[2], m[3], lo32);
  v8si t2 = __builtin_shuffle(m[4], m[5], lo32);
  v8si t3 = __builtin_shuffle(m[6], m[7], lo32);
  v8si t4 = __builtin_shuffle(m[0], m[1], hi32);
  v8si t5 = __builtin_shuffle(m[2], m[3], hi32);
  v8si t6 = __builtin_shuffle(m[4], m[5], hi32);
  v8si t7 = __builtin_shuffle(m[6], m[7], hi32);
  const v8si lo64 = {0, 1, 8, 9, 4, 5, 12, 13};
  const v8si hi64 = {2, 3, 10, 11, 6, 7, 14, 15};
  v8si u0 = __builtin_shuffle(t0, t1, lo64);
  v8si u1 = __builtin_shuffle(t2, t3, lo64);
  v8si u2 = __builtin_shuffle(t0, t1, hi64);
  v8si u3 = __builtin_shuffle(t2, t3, hi64);
  v8si u4 = __builtin_shuffle(t4, t5, lo64);
  v8si u5 = __builtin_shuffle(t6, t7, lo64);
  v8si u6 = __builtin_shuffle(t4, t5, hi64);
  v8si u7 = __builtin_shuffle(t6, t7, hi64);
  const v8si lo128 = {0, 1, 2, 3, 8, 9, 10, 11};
  const v8si hi128 = {4, 5, 6, 7, 12, 13, 14, 15};
  m[0] = __builtin_shuffle(u0, u1, lo128);
  m[4] = __builtin_shuffle(u0, u1, hi128);
  m[1] = __builtin_shuffle(u2, u3, lo128);
  m[5] = __builtin_shuffle(u2, u3, hi128);
  m[2] = __builtin_shuffle(u4, u5, lo128);
  m[6] = __builtin_shuffle(u4, u5, hi128);
  m[3] = __builtin_shuffle(u6, u7, lo128);
  m[7] = __builtin_shuffle(u6, u7, hi128);
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
static void recon_rows(const int16_t* coeffs, int by0, int by1, int bw,
                       const int32_t* quant, uint8_t* out,
                       int64_t stride);

int tpuheif_jpeg_recon(const int16_t* coeffs, int bh, int bw,
                       const int32_t* quant, uint8_t* out,
                       int64_t stride) {
  recon_rows(coeffs, 0, bh, bw, quant, out, stride);
  return 0;
}

// Decode scan + reconstruct in one pipelined call: a consumer thread
// runs the vectorized recon over MCU-row bands as the (serial)
// entropy producer completes them, so IDCT/assembly time hides under
// the Huffman chain (the overlap libjpeg gets from its suspending
// row-wise API; reference boundary plugins/decoder_libjpeg.cc:506).
// comp_quant: per-component natural-order 64-entry tables;
// comp_out/comp_stride: destination planes (bw*8 x bh*8).
int tpuheif_jpeg_decode_scan_recon(
    const uint8_t* entropy, size_t entropy_len,
    int ncomp,
    const int* comp_h, const int* comp_v,
    const int* comp_blocks_w, const int* comp_blocks_h,
    const int* comp_dc_tbl, const int* comp_ac_tbl,
    int16_t** comp_coeffs,
    const uint8_t* dc_bits, const uint8_t* dc_vals, const int* dc_nvals,
    const uint8_t* ac_bits, const uint8_t* ac_vals, const int* ac_nvals,
    int interleaved, int mcus_w, int total_mcus, int restart_interval,
    int* exhausted_out,
    const int32_t** comp_quant, uint8_t** comp_out,
    const int64_t* comp_stride) {
  std::atomic<int> rows_done{0};
  std::atomic<bool> finished{false};
  int mcu_rows = 0;
  if (mcus_w > 0) mcu_rows = total_mcus / mcus_w;

  std::thread consumer([&]() {
    int done = 0;
    while (true) {
      int avail = rows_done.load(std::memory_order_acquire);
      if (avail <= done) {
        if (finished.load(std::memory_order_acquire)) {
          avail = rows_done.load(std::memory_order_acquire);
          if (avail <= done) break;
        } else {
          std::this_thread::yield();
          continue;
        }
      }
      for (int ci = 0; ci < ncomp; ++ci) {
        int v = interleaved ? comp_v[ci] : 1;
        int by0 = done * v;
        int by1 = avail * v;
        if (by1 > comp_blocks_h[ci]) by1 = comp_blocks_h[ci];
        if (by0 >= by1) continue;
        recon_rows(comp_coeffs[ci], by0, by1, comp_blocks_w[ci],
                   comp_quant[ci], comp_out[ci], comp_stride[ci]);
      }
      done = avail;
    }
  });

  int rc = tpuheif_jpeg_decode_scan_impl(
      entropy, entropy_len, ncomp, comp_h, comp_v, comp_blocks_w,
      comp_blocks_h, comp_dc_tbl, comp_ac_tbl, comp_coeffs, dc_bits,
      dc_vals, dc_nvals, ac_bits, ac_vals, ac_nvals, interleaved, mcus_w,
      total_mcus, restart_interval, exhausted_out, &rows_done);
  if (rc == 0) rows_done.store(mcu_rows, std::memory_order_release);
  finished.store(true, std::memory_order_release);
  consumer.join();
  return rc;
}

// ---------------------------------------------------------------------
// Forward path: FDCT + quantize + zigzag and the Huffman scan emitter —
// the native counterparts of codecs/jpeg/encoder.py (_fdct_quant_program
// + _entropy_encode), bit-identical to jfdctint.c islow and the
// Annex-F sequential entropy coder so the Python anchor difftests hold.

namespace {

// one forward islow pass over 8 lanes (jfdctint.c body, elementwise)
inline void fdct_pass_v(v8si* v, bool first) {
  v8si tmp0 = v[0] + v[7], tmp7 = v[0] - v[7];
  v8si tmp1 = v[1] + v[6], tmp6 = v[1] - v[6];
  v8si tmp2 = v[2] + v[5], tmp5 = v[2] - v[5];
  v8si tmp3 = v[3] + v[4], tmp4 = v[3] - v[4];
  v8si tmp10 = tmp0 + tmp3, tmp13 = tmp0 - tmp3;
  v8si tmp11 = tmp1 + tmp2, tmp12 = tmp1 - tmp2;
  if (first) {
    v[0] = (tmp10 + tmp11) << kPass1Bits;
    v[4] = (tmp10 - tmp11) << kPass1Bits;
  } else {
    v[0] = descale_v(tmp10 + tmp11, kPass1Bits);
    v[4] = descale_v(tmp10 - tmp11, kPass1Bits);
  }
  v8si z1 = (tmp12 + tmp13) * kF0_541196100;
  int sh = first ? (kConstBits - kPass1Bits) : (kConstBits + kPass1Bits);
  v[2] = descale_v(z1 + tmp13 * kF0_765366865, sh);
  v[6] = descale_v(z1 - tmp12 * kF1_847759065, sh);
  z1 = tmp4 + tmp7;
  v8si z2 = tmp5 + tmp6, z3 = tmp4 + tmp6, z4 = tmp5 + tmp7;
  v8si z5 = (z3 + z4) * kF1_175875602;
  tmp4 *= kF0_298631336;
  tmp5 *= kF2_053119869;
  tmp6 *= kF3_072711026;
  tmp7 *= kF1_501321110;
  z1 *= -kF0_899976223;
  z2 *= -kF2_562915447;
  z3 = z3 * -kF1_961570560 + z5;
  z4 = z4 * -kF0_390180644 + z5;
  v[7] = descale_v(tmp4 + z1 + z3, sh);
  v[5] = descale_v(tmp5 + z2 + z4, sh);
  v[3] = descale_v(tmp6 + z2 + z3, sh);
  v[1] = descale_v(tmp7 + z1 + z4, sh);
}

}  // namespace

// plane: uint8 samples with row stride; out_zz: (bh*bw, 64) int16
// quantized coefficients in zigzag order; quant: 64 NATURAL-order
// values.  Division is exact via 2^40 reciprocals ((d-1)*|c|max < 2^40).
int tpuheif_jpeg_fdct_quant(const uint8_t* plane, int bh, int bw,
                            int64_t stride, const int32_t* quant,
                            int16_t* out_zz) {
  typedef int64_t v4di __attribute__((vector_size(32)));
  typedef int32_t v4si __attribute__((vector_size(16)));
  typedef uint8_t v8qi __attribute__((vector_size(8)));

  v4di recip_lo[8], recip_hi[8];
  v8si qhalf_v[8];
  for (int i = 0; i < 64; ++i) {
    uint64_t d = static_cast<uint64_t>(quant[i]) * 8;
    if (d == 0) return -1;
    uint64_t rec = ((static_cast<uint64_t>(1) << 40) + d - 1) / d;
    if (i % 8 < 4)
      recip_lo[i / 8][i % 8] = static_cast<int64_t>(rec);
    else
      recip_hi[i / 8][i % 8 - 4] = static_cast<int64_t>(rec);
    qhalf_v[i / 8][i % 8] = static_cast<int32_t>(d >> 1);
  }
  v8si r[8];
  int16_t qnat[64];
  for (int by = 0; by < bh; ++by) {
    for (int bx = 0; bx < bw; ++bx) {
      const uint8_t* src = plane + static_cast<int64_t>(by) * 8 * stride +
                           bx * 8;
      for (int y = 0; y < 8; ++y) {
        v8qi bytes;
        std::memcpy(&bytes, src + static_cast<int64_t>(y) * stride, 8);
        r[y] = __builtin_convertvector(bytes, v8si) - 128;
      }
      // pass 1 along x (lanes = y): transpose in, transform, back
      transpose8(r);
      fdct_pass_v(r, true);
      transpose8(r);
      // pass 2 along y (lanes = x)
      fdct_pass_v(r, false);
      // quantize in natural order (vector abs + 64-bit reciprocal mul)
      for (int y = 0; y < 8; ++y) {
        v8si v = r[y];
        v8si neg = v < 0;
        v8si mag = ((v ^ neg) - neg) + qhalf_v[y];
        v4si mlo = {mag[0], mag[1], mag[2], mag[3]};
        v4si mhi = {mag[4], mag[5], mag[6], mag[7]};
        v4di qlo = (__builtin_convertvector(mlo, v4di) *
                    recip_lo[y]) >> 40;
        v4di qhi = (__builtin_convertvector(mhi, v4di) *
                    recip_hi[y]) >> 40;
        v8si q = {static_cast<int32_t>(qlo[0]),
                  static_cast<int32_t>(qlo[1]),
                  static_cast<int32_t>(qlo[2]),
                  static_cast<int32_t>(qlo[3]),
                  static_cast<int32_t>(qhi[0]),
                  static_cast<int32_t>(qhi[1]),
                  static_cast<int32_t>(qhi[2]),
                  static_cast<int32_t>(qhi[3])};
        q = (q ^ neg) - neg;          // restore sign
        for (int x = 0; x < 8; ++x)
          qnat[y * 8 + x] = static_cast<int16_t>(q[x]);
      }
      int16_t* dst = out_zz + (static_cast<size_t>(by) * bw + bx) * 64;
      for (int i = 0; i < 64; ++i) dst[i] = qnat[kZigzag[i]];
    }
  }
  return 0;
}

namespace {

struct EncTable {
  uint32_t code[256];
  uint8_t len[256];

  void build(const uint8_t bits[16], const uint8_t* vals, int nvals) {
    std::memset(len, 0, sizeof(len));
    int codev = 0, k = 0;
    for (int ln = 1; ln <= 16; ++ln) {
      for (int i = 0; i < bits[ln - 1] && k < nvals; ++i, ++k) {
        code[vals[k]] = codev;
        len[vals[k]] = static_cast<uint8_t>(ln);
        ++codev;
      }
      codev <<= 1;
    }
  }
};

struct StuffWriter {
  uint8_t* out;
  size_t cap;
  size_t n = 0;
  uint64_t acc = 0;
  int nbits = 0;
  bool overflow = false;

  inline void flush32() {
    uint32_t b4 = static_cast<uint32_t>(acc >> (nbits - 32));
    nbits -= 32;
    if (n + 8 > cap) { overflow = true; return; }
    // any 0xFF byte? (haszero(b4 ^ ~0) SWAR)
    uint32_t inv = b4 ^ 0xFFFFFFFFu;
    if (((inv - 0x01010101u) & ~inv & 0x80808080u) == 0) {
      out[n] = static_cast<uint8_t>(b4 >> 24);
      out[n + 1] = static_cast<uint8_t>(b4 >> 16);
      out[n + 2] = static_cast<uint8_t>(b4 >> 8);
      out[n + 3] = static_cast<uint8_t>(b4);
      n += 4;
      return;
    }
    for (int i = 3; i >= 0; --i) {
      uint8_t b = static_cast<uint8_t>(b4 >> (8 * i));
      out[n++] = b;
      if (b == 0xFF) out[n++] = 0x00;
    }
  }

  // len <= 31; bits must already be masked to len
  inline void put(uint32_t bits, int len) {
    if (overflow) return;
    acc = (acc << len) | bits;
    nbits += len;
    if (nbits >= 32) flush32();
  }
  inline void pad() {
    while (nbits >= 8) {
      if (overflow) return;
      uint8_t b = static_cast<uint8_t>(acc >> (nbits - 8));
      nbits -= 8;
      if (n + 2 > cap) { overflow = true; return; }
      out[n++] = b;
      if (b == 0xFF) out[n++] = 0x00;
    }
    if (nbits) {
      uint32_t fill = (1u << (8 - nbits)) - 1;
      acc = (acc << (8 - nbits)) | fill;
      nbits = 8;
      uint8_t b = static_cast<uint8_t>(acc);
      nbits = 0;
      if (n + 2 > cap) { overflow = true; return; }
      out[n++] = b;
      if (b == 0xFF) out[n++] = 0x00;
    }
  }
};

inline int bitsize(int v) {
  unsigned a = v < 0 ? -v : v;
  return a ? 32 - __builtin_clz(a) : 0;
}

}  // namespace

// Emit one interleaved (or single-component) sequential scan.
// coeffs: per-component (N,64) zigzag-quantized int16.
// dc/ac tables: 16 bit-counts + values per slot id in comp_dc/ac_tbl.
// Returns the entropy byte count written to `out` (with FF stuffing),
// or -1 if out_cap was too small.
int64_t tpuheif_jpeg_encode_scan(
    int ncomp, const int* comp_h, const int* comp_v,
    const int* comp_blocks_w, const int* comp_blocks_h,
    const int* comp_dc_tbl, const int* comp_ac_tbl,
    const int16_t** comp_coeffs,
    const uint8_t* dc_bits, const uint8_t* dc_vals, const int* dc_nvals,
    const uint8_t* ac_bits, const uint8_t* ac_vals, const int* ac_nvals,
    int interleaved, int mcus_w, int mcus_h,
    uint8_t* out, int64_t out_cap) {
  EncTable dc_t[4], ac_t[4];
  for (int i = 0; i < 4; ++i) {
    if (dc_nvals[i] > 0)
      dc_t[i].build(dc_bits + 16 * i, dc_vals + 256 * i, dc_nvals[i]);
    if (ac_nvals[i] > 0)
      ac_t[i].build(ac_bits + 16 * i, ac_vals + 256 * i, ac_nvals[i]);
  }
  StuffWriter w{out, static_cast<size_t>(out_cap)};
  int preds[16] = {0};

  auto encode_block = [&](int ci, const int16_t* blk) {
    EncTable& dt = dc_t[comp_dc_tbl[ci]];
    EncTable& at = ac_t[comp_ac_tbl[ci]];
    int dc = blk[0];
    int diff = dc - preds[ci];
    preds[ci] = dc;
    int s = bitsize(diff);
    // fused (code, value) emission: one put per coefficient
    uint32_t vb = s ? ((static_cast<uint32_t>(
                           diff < 0 ? diff + (1 << s) - 1 : diff)) &
                       ((1u << s) - 1))
                    : 0;
    w.put((dt.code[s] << s) | vb, dt.len[s] + s);
    int last = 0;
    for (int k = 63; k >= 1; --k) {
      if (blk[k]) { last = k; break; }
    }
    int run = 0;
    for (int k = 1; k <= last; ++k) {
      int v = blk[k];
      if (v == 0) { ++run; continue; }
      while (run > 15) {
        w.put(at.code[0xF0], at.len[0xF0]);
        run -= 16;
      }
      s = bitsize(v);
      int rs = (run << 4) | s;
      vb = (static_cast<uint32_t>(v < 0 ? v + (1 << s) - 1 : v)) &
           ((1u << s) - 1);
      w.put((at.code[rs] << s) | vb, at.len[rs] + s);
      run = 0;
    }
    if (last < 63) w.put(at.code[0x00], at.len[0x00]);
  };

  if (!interleaved) {
    int nb = comp_blocks_w[0] * comp_blocks_h[0];
    for (int i = 0; i < nb; ++i)
      encode_block(0, comp_coeffs[0] + static_cast<size_t>(i) * 64);
  } else {
    for (int my = 0; my < mcus_h; ++my) {
      for (int mx = 0; mx < mcus_w; ++mx) {
        for (int ci = 0; ci < ncomp; ++ci) {
          for (int by = 0; by < comp_v[ci]; ++by) {
            for (int bx = 0; bx < comp_h[ci]; ++bx) {
              int idx = (my * comp_v[ci] + by) * comp_blocks_w[ci] +
                        (mx * comp_h[ci] + bx);
              encode_block(ci, comp_coeffs[ci] +
                                   static_cast<size_t>(idx) * 64);
            }
          }
        }
        if (w.overflow) return -1;
      }
    }
  }
  w.pad();
  if (w.overflow) return -1;
  return static_cast<int64_t>(w.n);
}

static void recon_rows(const int16_t* coeffs, int by0, int by1, int bw,
                       const int32_t* quant, uint8_t* out,
                       int64_t stride) {
  int32_t dq[64];
  v8si r[8], o[8];
  for (int by = by0; by < by1; ++by) {
    for (int bx = 0; bx < bw; ++bx) {
      const int16_t* c = coeffs + (static_cast<int64_t>(by) * bw + bx) * 64;
      uint8_t* dst = out + (static_cast<int64_t>(by) * 8) * stride + bx * 8;
      for (int i = 0; i < 64; ++i)
        dq[kZigzag[i]] = static_cast<int32_t>(c[i]) * quant[kZigzag[i]];
      std::memcpy(r, dq, sizeof(dq));
      // whole-block DC-only shortcut: both passes of the butterfly on a
      // pure-DC block reduce exactly to (dc + 4) >> 3
      v8si acc_or = r[1] | r[2] | r[3] | r[4] | r[5] | r[6] | r[7];
      int64_t any = dq[1] | dq[2] | dq[3] | dq[4] | dq[5] | dq[6] | dq[7];
      for (int i = 0; i < 8; ++i) any |= acc_or[i];
      if (any == 0) {
        int32_t v = (dq[0] + 4) >> 3;
        int32_t px = v + 128;
        uint8_t b = static_cast<uint8_t>(px < 0 ? 0
                                         : (px > 255 ? 255 : px));
        for (int y = 0; y < 8; ++y)
          std::memset(dst + static_cast<int64_t>(y) * stride, b, 8);
        continue;
      }
      // pass 1 (columns): SIMD across the 8 columns, no transpose
      idct_1d_v(r[0], r[1], r[2], r[3], r[4], r[5], r[6], r[7],
                kConstBits - kPass1Bits, o);
      // pass 2 (rows): transpose so rows become lanes
      transpose8(o);
      idct_1d_v(o[0], o[1], o[2], o[3], o[4], o[5], o[6], o[7],
                kConstBits + kPass1Bits + 3, r);
      transpose8(r);
      for (int y = 0; y < 8; ++y) {
        v8si row = r[y] + 128;
        uint8_t* d = dst + static_cast<int64_t>(y) * stride;
        for (int x = 0; x < 8; ++x) {
          int32_t v = row[x];
          d[x] = static_cast<uint8_t>(v < 0 ? 0 : (v > 255 ? 255 : v));
        }
      }
    }
  }
}

}  // extern "C"
