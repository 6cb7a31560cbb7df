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
// C ABI contract (all little-endian, caller owns buffers):
//   bmh_code_lengths(freqs[256] i64, lens_out[256] u8)        -> max_len or -1
//   bmh_canonical_codes(lens[256] u8, codes_out[256] u32)     -> 0
//   bmh_pack_lens(lens[256] u8, out[192] u8)                  -> packed bytes
//   bmh_unpack_lens(buf u8*, buflen, lens_out[256] u8)        -> consumed or -1
//   bmh_pack_container: write header+table+blocks to path     -> 0 or -1
//   bmh_compare_files(p1, p2)                                 -> 1 equal, 0 not, -1 err
//   bmh_crc32(buf, len)                                       -> crc

#include <cstdint>
#include <cstdio>
#include <cstring>

namespace {

constexpr int kAlphabet = 256;
constexpr int kMaxLen = 31;

}  // namespace

extern "C" {

// Optimal prefix-code lengths via the two-queue method over the sorted
// histogram.  Semantics match bmh_tpu.ops.huffman.code_lengths_from_hist
// (both optimal; equal total bits).  Returns max length, 0 if <=1 symbol,
// -1 if depth would exceed kMaxLen.
int bmh_code_lengths(const int64_t* freqs, uint8_t* lens_out) {
  int syms[kAlphabet];
  int s = 0;
  for (int i = 0; i < kAlphabet; ++i) {
    lens_out[i] = 0;
    if (freqs[i] > 0) syms[s++] = i;
  }
  if (s <= 1) return 0;

  // stable sort leaves by (freq, symbol) — insertion sort is fine for 256
  int order[kAlphabet];
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

  int64_t weight[2 * kAlphabet];
  int parent[2 * kAlphabet];
  for (int i = 0; i < s; ++i) {
    weight[i] = freqs[order[i]];
    parent[i] = -1;
  }
  // two queues: q1 = leaves [q1h, s), q2 = merged nodes [q2h, q2t)
  int q1h = 0;
  int q2buf[kAlphabet];
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
  int depth[2 * kAlphabet];
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
int bmh_canonical_codes(const uint8_t* lens, uint32_t* codes_out) {
  memset(codes_out, 0, kAlphabet * sizeof(uint32_t));
  uint32_t code = 0;
  int prev = 0;
  for (int l = 1; l <= kMaxLen; ++l) {
    for (int sym = 0; sym < kAlphabet; ++sym) {
      if (lens[sym] != l) continue;
      code <<= (l - prev);
      prev = l;
      codes_out[sym] = code;
      ++code;
    }
  }
  return 0;
}

// Bitmap (32 B) + 5-bit lengths of present symbols, MSB-first.  `out` must
// hold 32 + 160 = 192 bytes.  Returns bytes written.
int bmh_pack_lens(const uint8_t* lens, const uint8_t* present, uint8_t* out) {
  memset(out, 0, 192);
  int npresent = 0;
  for (int sym = 0; sym < kAlphabet; ++sym) {
    if (present[sym]) {
      out[sym >> 3] |= static_cast<uint8_t>(1u << (sym & 7));
      ++npresent;
    }
  }
  int bitpos = 0;
  uint8_t* packed = out + 32;
  for (int sym = 0; sym < kAlphabet; ++sym) {
    if (!present[sym]) continue;
    for (int k = 4; k >= 0; --k) {
      if ((lens[sym] >> k) & 1) packed[bitpos >> 3] |= static_cast<uint8_t>(0x80u >> (bitpos & 7));
      ++bitpos;
    }
  }
  return 32 + (5 * npresent + 7) / 8;
}

// Inverse of bmh_pack_lens.  Returns bytes consumed, or -1 on short buffer.
int bmh_unpack_lens(const uint8_t* buf, int buflen, uint8_t* lens_out,
                    uint8_t* present_out) {
  if (buflen < 32) return -1;
  memset(lens_out, 0, kAlphabet);
  memset(present_out, 0, kAlphabet);
  int npresent = 0;
  for (int sym = 0; sym < kAlphabet; ++sym) {
    if ((buf[sym >> 3] >> (sym & 7)) & 1) {
      present_out[sym] = 1;
      ++npresent;
    }
  }
  int nbytes = (5 * npresent + 7) / 8;
  if (buflen < 32 + nbytes) return -1;
  const uint8_t* packed = buf + 32;
  int bitpos = 0;
  for (int sym = 0; sym < kAlphabet; ++sym) {
    if (!present_out[sym]) continue;
    uint8_t v = 0;
    for (int k = 0; k < 5; ++k) {
      v = static_cast<uint8_t>((v << 1) | ((packed[bitpos >> 3] >> (7 - (bitpos & 7))) & 1));
      ++bitpos;
    }
    lens_out[sym] = v;
  }
  return 32 + nbytes;
}

// Assemble and write a .bzt container in one pass:
// header(24) + u32 sizes table + concatenated pre-framed blocks.
int bmh_pack_container(const char* path, uint32_t block_size, uint64_t total_size,
                       uint32_t n_blocks, const uint8_t* const* blocks,
                       const uint32_t* sizes) {
  FILE* f = fopen(path, "wb");
  if (!f) return -1;
  uint8_t header[24];
  memcpy(header, "BZT1", 4);
  header[4] = 1;  // version
  header[5] = 0;  // flags
  header[6] = header[7] = 0;
  memcpy(header + 8, &block_size, 4);
  memcpy(header + 12, &n_blocks, 4);
  memcpy(header + 16, &total_size, 8);
  if (fwrite(header, 1, 24, f) != 24) { fclose(f); return -1; }
  if (n_blocks && fwrite(sizes, 4, n_blocks, f) != n_blocks) { fclose(f); return -1; }
  for (uint32_t i = 0; i < n_blocks; ++i) {
    if (fwrite(blocks[i], 1, sizes[i], f) != sizes[i]) { fclose(f); return -1; }
  }
  return fclose(f) == 0 ? 0 : -1;
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
