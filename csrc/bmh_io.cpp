// Native runtime components for bmh_tpu: container framing, code-table
// packing, host-side canonical Huffman construction, and file verify.
//
// The reference implements its entire runtime in C++ (io_utilities.h,
// debug_utilities.h); these are the TPU framework's native equivalents for
// the host-side paths that stay off the device: at production scale
// (GiB streams -> tens of thousands of blocks) the per-block 256-entry
// work (two-queue Huffman, canonical tables, 5-bit length packing) and the
// container framing dominate Python-side time, so they live here behind a
// C ABI loaded via ctypes (no pybind11 in this image).
//
// C ABI contract (all little-endian, caller owns buffers; `a` = alphabet
// size, 256 plain or 257 under RLE0, <= 512):
//   bmh_code_lengths(freqs[a] i64, lens_out[a] u8, a)         -> max_len or -1
//   bmh_canonical_codes(lens[a] u8, codes_out[a] u32, a)      -> 0
//   bmh_pack_lens(lens[a] u8, present[a] u8, out, a)          -> packed bytes
//   bmh_unpack_lens(buf u8*, buflen, lens_out, present_out, a)-> consumed or -1
//   bmh_compare_files(p1, p2)                                 -> 1 equal, 0 not, -1 err
//   bmh_crc32(buf, len)                                       -> crc

#include <cstdint>
#include <cstdio>
#include <cstring>

namespace {

constexpr int kMaxAlphabet = 512;
constexpr int kMaxLen = 31;

}  // namespace

extern "C" {

// Optimal prefix-code lengths via the two-queue method over the sorted
// histogram.  Semantics match bmh_tpu.ops.huffman.code_lengths_from_hist
// (both optimal; equal total bits).  Returns max length, 0 if <=1 symbol,
// -1 if depth would exceed kMaxLen.
int bmh_code_lengths(const int64_t* freqs, uint8_t* lens_out, int alphabet) {
  if (alphabet < 1 || alphabet > kMaxAlphabet) return -1;
  int syms[kMaxAlphabet];
  int s = 0;
  for (int i = 0; i < alphabet; ++i) {
    lens_out[i] = 0;
    if (freqs[i] > 0) syms[s++] = i;
  }
  if (s <= 1) return 0;

  // stable sort leaves by (freq, symbol) — insertion sort is fine here
  int order[kMaxAlphabet];
  for (int i = 0; i < s; ++i) order[i] = syms[i];
  for (int i = 1; i < s; ++i) {
    int v = order[i];
    int j = i - 1;
    while (j >= 0 && (freqs[order[j]] > freqs[v] ||
                      (freqs[order[j]] == freqs[v] && order[j] > v))) {
      order[j + 1] = order[j];
      --j;
    }
    order[j + 1] = v;
  }

  int64_t weight[2 * kMaxAlphabet];
  int parent[2 * kMaxAlphabet];
  for (int i = 0; i < s; ++i) {
    weight[i] = freqs[order[i]];
    parent[i] = -1;
  }
  // two queues: q1 = leaves [q1h, s), q2 = merged nodes [q2h, q2t)
  int q1h = 0;
  int q2buf[kMaxAlphabet];
  int q2h = 0, q2t = 0;
  int next_id = s;
  for (int m = 0; m < s - 1; ++m) {
    int picked[2];
    for (int k = 0; k < 2; ++k) {
      if (q1h < s && (q2h == q2t || weight[q1h] <= weight[q2buf[q2h]])) {
        picked[k] = q1h++;
      } else {
        picked[k] = q2buf[q2h++];
      }
    }
    weight[next_id] = weight[picked[0]] + weight[picked[1]];
    parent[picked[0]] = next_id;
    parent[picked[1]] = next_id;
    parent[next_id] = -1;
    q2buf[q2t++] = next_id;
    ++next_id;
  }
  int total = 2 * s - 1;
  int depth[2 * kMaxAlphabet];
  depth[total - 1] = 0;
  int maxd = 0;
  for (int i = total - 2; i >= 0; --i) {  // parents always have larger ids
    depth[i] = depth[parent[i]] + 1;
    if (i < s && depth[i] > maxd) maxd = depth[i];
  }
  if (maxd > kMaxLen) return -1;
  for (int i = 0; i < s; ++i) lens_out[order[i]] = static_cast<uint8_t>(depth[i]);
  return maxd;
}

// Canonical code values: symbols ordered by (length, symbol).
int bmh_canonical_codes(const uint8_t* lens, uint32_t* codes_out, int alphabet) {
  memset(codes_out, 0, alphabet * sizeof(uint32_t));
  uint32_t code = 0;
  int prev = 0;
  for (int l = 1; l <= kMaxLen; ++l) {
    for (int sym = 0; sym < alphabet; ++sym) {
      if (lens[sym] != l) continue;
      code <<= (l - prev);
      prev = l;
      codes_out[sym] = code;
      ++code;
    }
  }
  return 0;
}

// Bitmap (ceil(a/8) B) + 5-bit lengths of present symbols, MSB-first.
// `out` must hold ceil(a/8) + ceil(5a/8) bytes.  Returns bytes written.
int bmh_pack_lens(const uint8_t* lens, const uint8_t* present, uint8_t* out,
                  int alphabet) {
  int bm = (alphabet + 7) / 8;
  memset(out, 0, static_cast<size_t>(bm + (5 * alphabet + 7) / 8));
  int npresent = 0;
  for (int sym = 0; sym < alphabet; ++sym) {
    if (present[sym]) {
      out[sym >> 3] |= static_cast<uint8_t>(1u << (sym & 7));
      ++npresent;
    }
  }
  int bitpos = 0;
  uint8_t* packed = out + bm;
  for (int sym = 0; sym < alphabet; ++sym) {
    if (!present[sym]) continue;
    for (int k = 4; k >= 0; --k) {
      if ((lens[sym] >> k) & 1) packed[bitpos >> 3] |= static_cast<uint8_t>(0x80u >> (bitpos & 7));
      ++bitpos;
    }
  }
  return bm + (5 * npresent + 7) / 8;
}

// Inverse of bmh_pack_lens.  Returns bytes consumed, or -1 on short buffer.
int bmh_unpack_lens(const uint8_t* buf, int buflen, uint8_t* lens_out,
                    uint8_t* present_out, int alphabet) {
  int bm = (alphabet + 7) / 8;
  if (buflen < bm) return -1;
  memset(lens_out, 0, alphabet);
  memset(present_out, 0, alphabet);
  int npresent = 0;
  for (int sym = 0; sym < alphabet; ++sym) {
    if ((buf[sym >> 3] >> (sym & 7)) & 1) {
      present_out[sym] = 1;
      ++npresent;
    }
  }
  int nbytes = (5 * npresent + 7) / 8;
  if (buflen < bm + nbytes) return -1;
  const uint8_t* packed = buf + bm;
  int bitpos = 0;
  for (int sym = 0; sym < alphabet; ++sym) {
    if (!present_out[sym]) continue;
    uint8_t v = 0;
    for (int k = 0; k < 5; ++k) {
      v = static_cast<uint8_t>((v << 1) | ((packed[bitpos >> 3] >> (7 - (bitpos & 7))) & 1));
      ++bitpos;
    }
    lens_out[sym] = v;
  }
  return bm + nbytes;
}

// Bit-exact file comparison (native equivalent of the reference's
// compare_files, debug_utilities.h:16-34).  1 equal, 0 different, -1 error.
int bmh_compare_files(const char* p1, const char* p2) {
  FILE* f1 = fopen(p1, "rb");
  if (!f1) return -1;
  FILE* f2 = fopen(p2, "rb");
  if (!f2) { fclose(f1); return -1; }
  constexpr size_t kBuf = 1 << 20;
  static thread_local uint8_t b1[kBuf], b2[kBuf];
  int result = 1;
  for (;;) {
    size_t n1 = fread(b1, 1, kBuf, f1);
    size_t n2 = fread(b2, 1, kBuf, f2);
    if (n1 != n2 || memcmp(b1, b2, n1) != 0) { result = 0; break; }
    if (n1 < kBuf) break;
  }
  fclose(f1);
  fclose(f2);
  return result;
}

// CRC32 (IEEE) for optional container integrity checks.
uint32_t bmh_crc32(const uint8_t* buf, uint64_t len) {
  static uint32_t table[256];
  static bool init = false;
  if (!init) {
    for (uint32_t i = 0; i < 256; ++i) {
      uint32_t c = i;
      for (int k = 0; k < 8; ++k) c = (c & 1) ? 0xEDB88320u ^ (c >> 1) : c >> 1;
      table[i] = c;
    }
    init = true;
  }
  uint32_t c = 0xFFFFFFFFu;
  for (uint64_t i = 0; i < len; ++i) c = table[(c ^ buf[i]) & 0xFF] ^ (c >> 8);
  return c ^ 0xFFFFFFFFu;
}

}  // extern "C"

extern "C" {

// RLE1 pre-BWT run collapse (bzip2-style, own wire format): a run of L >= 4
// equal bytes becomes chunks of "4 copies + u8 extra" with extra in
// [0, 251] covering 4..255 bytes per chunk; a trailing remainder < 4 is
// emitted raw.  Collapses the long-run inputs (Calgary `pic`) that force
// the prefix-doubling BWT to maximum rounds (the reference's worst case:
// 9.9 s on pic, main.cpp:51-58).  Returns output length; the caller only
// keeps the result when it is strictly smaller than the input.
uint64_t bmh_rle1_encode(const uint8_t* in, uint64_t n, uint8_t* out,
                         uint64_t cap) {
  uint64_t o = 0, i = 0;
  while (i < n) {
    uint64_t j = i + 1;
    while (j < n && in[j] == in[i]) ++j;
    uint64_t len = j - i;
    while (len >= 4) {
      uint64_t take = len > 255 ? 255 : len;
      if (o + 5 > cap) return cap + 1;  // would not fit == not smaller
      out[o] = out[o + 1] = out[o + 2] = out[o + 3] = in[i];
      out[o + 4] = (uint8_t)(take - 4);
      o += 5;
      len -= take;
    }
    for (uint64_t k = 0; k < len; ++k) {
      if (o >= cap) return cap + 1;
      out[o++] = in[i];
    }
    i = j;
  }
  return o;
}

// Inverse: 4 consecutive equal bytes are always a chunk marker whose next
// byte is the extra count (the encoder emits no other 4-runs).  Returns
// decoded length, or cap+1 on overflow / truncated count byte.
uint64_t bmh_rle1_decode(const uint8_t* in, uint64_t n, uint8_t* out,
                         uint64_t cap) {
  uint64_t o = 0, i = 0;
  while (i < n) {
    uint8_t v = in[i];
    if (i + 3 < n && in[i + 1] == v && in[i + 2] == v && in[i + 3] == v) {
      if (i + 4 >= n) return cap + 1;  // truncated chunk
      uint64_t total = 4u + in[i + 4];
      if (o + total > cap) return cap + 1;
      for (uint64_t k = 0; k < total; ++k) out[o++] = v;
      i += 5;
    } else {
      if (o >= cap) return cap + 1;
      out[o++] = v;
      ++i;
    }
  }
  return o;
}

}  // extern "C"
