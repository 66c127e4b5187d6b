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

struct HuffLut {
  int16_t sym[1 << 16];
  int8_t len[1 << 16];
  bool valid = false;

  // build canonical-code lookahead table from T.81 BITS/HUFFVAL
  void build(const uint8_t bits[16], const uint8_t* vals, int nvals) {
    std::memset(sym, 0, sizeof(sym));
    std::memset(len, 0, sizeof(len));
    int code = 0, k = 0;
    for (int ln = 1; ln <= 16; ++ln) {
      for (int i = 0; i < bits[ln - 1]; ++i) {
        if (k >= nvals) { valid = false; return; }
        int shift = 16 - ln;
        int base = code << shift;
        int count = 1 << shift;
        for (int j = 0; j < count; ++j) {
          sym[base + j] = vals[k];
          len[base + j] = static_cast<int8_t>(ln);
        }
        ++code;
        ++k;
      }
      code <<= 1;
    }
    valid = true;
  }
};

struct BitReader {
  const uint8_t* data;
  size_t size;
  size_t pos = 0;
  uint64_t acc = 0;
  int nbits = 0;
  bool exhausted = false;

  void fill(int need) {
    while (nbits < need) {
      uint8_t b = 0;
      if (pos < size) {
        b = data[pos++];
      } else {
        exhausted = true;
      }
      acc = ((acc << 8) | b) & 0xFFFFFFFFFFFFull;
      nbits += 8;
    }
  }
  int peek16() {
    fill(16);
    return static_cast<int>((acc >> (nbits - 16)) & 0xFFFF);
  }
  int read_bits(int n) {
    if (n == 0) return 0;
    fill(n);
    int v = static_cast<int>((acc >> (nbits - n)) & ((1u << n) - 1));
    nbits -= n;
    return v;
  }
};

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
            int look = br.peek16();
            int ln = dt.len[look];
            if (ln == 0) return -1;
            br.nbits -= ln;
            int s = dt.sym[look];
            int diff = s ? extend(br.read_bits(s), s) : 0;
            preds[ci] += diff;
            block[0] = static_cast<int16_t>(preds[ci]);
            // AC
            int k = 1;
            while (k < 64) {
              look = br.peek16();
              ln = at.len[look];
              if (ln == 0) return -1;
              br.nbits -= ln;
              int rs = at.sym[look];
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

}  // extern "C"
