// Native FLAC decoder — host-side hot path for the batch chunk loader.
//
// Role: the reference's ASVspoof corpora are FLAC trees decoded through
// librosa/libsndfile (reference/ASV_dl_func.py:63-75, :195, :406). This
// implements the same spec subset as the portable Python codec
// (audioanalysisdetector_tpu/io/flac.py): 8..32-bit samples, 1-8 channels,
// CONSTANT / VERBATIM / FIXED(0-4) / LPC(1-32) subframes, RICE and RICE2
// residual partitions with escapes, wasted bits, all four stereo modes.
// Frame-header CRC-8 and frame CRC-16 are verified. Output is float32 mono
// (librosa scaling: x / 2^(bps-1), channels averaged).
//
// Compiled together with wavloader.cpp into libwavloader.so; the batch
// loader dispatches here on the .flac extension.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

namespace flacdec {

struct StreamInfo {
  uint32_t sample_rate = 0;
  int channels = 0;
  int bits_per_sample = 0;
  int64_t total_samples = 0;
};

constexpr uint32_t kSync = 0x3FFE;

const uint16_t* crc16_table() {
  static uint16_t table[256];
  static bool init = false;
  if (!init) {
    for (int byte = 0; byte < 256; ++byte) {
      uint32_t crc = byte << 8;
      for (int i = 0; i < 8; ++i)
        crc = (crc & 0x8000) ? ((crc << 1) ^ 0x8005) & 0xFFFF : (crc << 1) & 0xFFFF;
      table[byte] = (uint16_t)crc;
    }
    init = true;
  }
  return table;
}

const uint8_t* crc8_table() {
  static uint8_t table[256];
  static bool init = false;
  if (!init) {
    for (int byte = 0; byte < 256; ++byte) {
      uint32_t crc = byte;
      for (int i = 0; i < 8; ++i)
        crc = (crc & 0x80) ? ((crc << 1) ^ 0x07) & 0xFF : (crc << 1) & 0xFF;
      table[byte] = (uint8_t)crc;
    }
    init = true;
  }
  return table;
}

uint8_t crc8(const uint8_t* p, size_t n) {
  const uint8_t* t = crc8_table();
  uint8_t crc = 0;
  for (size_t i = 0; i < n; ++i) crc = t[crc ^ p[i]];
  return crc;
}

// slice-by-16 CRC-16 (poly 0x8005, MSB-first): t16[k][b] = CRC of byte b
// followed by k zero bytes — verifying whole frames costs well under
// 1 ns/byte instead of ~4 (CRC was 40% of decode time with the
// byte-at-a-time loop; 16 independent table lookups per iteration keep
// the load ports busy across the 2-byte CRC dependency chain)
const uint16_t (*crc16_tables())[256] {
  static uint16_t t16[16][256];
  static bool init = false;
  if (!init) {
    const uint16_t* t0 = crc16_table();
    for (int b = 0; b < 256; ++b) t16[0][b] = t0[b];
    for (int k = 1; k < 16; ++k)
      for (int b = 0; b < 256; ++b) {
        const uint16_t c = t16[k - 1][b];
        t16[k][b] = (uint16_t)((c << 8) ^ t0[c >> 8]);
      }
    init = true;
  }
  return t16;
}

uint16_t crc16(const uint8_t* p, size_t n) {
  const uint16_t(*T)[256] = crc16_tables();
  uint16_t crc = 0;
  while (n >= 16) {
    crc = T[15][p[0] ^ (crc >> 8)] ^ T[14][p[1] ^ (crc & 0xFF)] ^
          T[13][p[2]] ^ T[12][p[3]] ^ T[11][p[4]] ^ T[10][p[5]] ^
          T[9][p[6]] ^ T[8][p[7]] ^ T[7][p[8]] ^ T[6][p[9]] ^
          T[5][p[10]] ^ T[4][p[11]] ^ T[3][p[12]] ^ T[2][p[13]] ^
          T[1][p[14]] ^ T[0][p[15]];
    p += 16;
    n -= 16;
  }
  const uint16_t* t0 = crc16_table();
  while (n--) crc = t0[(crc >> 8) ^ *p++] ^ (uint16_t)(crc << 8);
  return crc;
}

// Left-aligned 64-bit bit reader: `acc` holds the next `n` bits in its MSBs.
// Refills 8 bytes per pass (single bswap'd load on the fast path) and reads
// unary runs with CLZ — the Rice-decode hot loop touches memory once per
// ~7 decoded bytes instead of once per bit-group.
struct BitReader {
  const uint8_t* data;
  size_t size;
  size_t byte;
  uint64_t acc = 0;
  int n = 0;
  bool fail = false;

  BitReader(const uint8_t* d, size_t s, size_t offset)
      : data(d), size(s), byte(offset) {}

  inline void refill() {
    if (byte + 8 <= size) {  // bulk path: one 64-bit load, keep whole bytes
      uint64_t w;
      memcpy(&w, data + byte, 8);
      w = __builtin_bswap64(w);
      const int k = (64 - n) >> 3;       // whole bytes that fit
      const int excess = (64 - n) - 8 * k;  // stray sub-byte bits to drop
      acc |= (w >> n) & ~((1ull << excess) - 1);
      byte += k;
      n += 8 * k;
      return;
    }
    while (n <= 56 && byte < size) {
      acc |= (uint64_t)data[byte++] << (56 - n);
      n += 8;
    }
  }

  inline uint32_t read(int bits) {  // 0 < bits <= 32
    if (n < bits) {
      refill();
      if (n < bits) {
        fail = true;
        return 0;
      }
    }
    uint32_t v = (uint32_t)(acc >> (64 - bits));
    acc <<= bits;
    n -= bits;
    return v;
  }

  inline int32_t read_signed(int bits) {
    uint32_t v = read(bits);
    if (bits < 32 && (v >> (bits - 1))) return (int32_t)(v - (1u << bits));
    return (int32_t)v;
  }

  // sample reads can need up to 33 bits (32-bit stereo side channel:
  // bps 32 + 1); read() tops out at 32, so wide reads split in two
  inline int64_t read_signed_long(int bits) {  // 0 < bits <= 57
    if (bits <= 32) return (int64_t)read_signed(bits);
    const uint64_t hi = read(bits - 32);
    const uint64_t v = (hi << 32) | (uint64_t)read(32);
    if (v >> (bits - 1)) return (int64_t)v - ((int64_t)1 << bits);
    return (int64_t)v;
  }

  // shift that tolerates s == 64 (a unary run ending exactly at a full
  // 64-bit window makes lz + 1 == 64; `x << 64` is UB — on x86 the count
  // masks to 0 and stale bits survive into the next refill)
  static inline uint64_t shl64(uint64_t v, int s) { return s >= 64 ? 0 : v << s; }

  inline uint32_t read_unary() {
    uint32_t q = 0;
    for (;;) {
      if (n == 0) {
        refill();
        if (n == 0) {
          fail = true;
          return 0;
        }
      }
      if (acc == 0) {  // all valid bits are zero
        q += n;
        n = 0;
        continue;
      }
      int lz = __builtin_clzll(acc);
      if (lz >= n) {
        q += n;
        acc = 0;
        n = 0;
        continue;
      }
      q += lz;
      acc = shl64(acc, lz + 1);
      n -= lz + 1;
      return q;
    }
  }

  // fused unary-quotient + remainder read -> zigzag-coded Rice value
  inline uint32_t read_rice(int param) {
    if (n < 44) refill();  // typical codeword (q + 1 + param) fits after this
    if (acc != 0) {
      const int lz = __builtin_clzll(acc);
      if (lz + 1 + param <= n) {  // fast path: whole codeword is buffered
        const uint64_t a = shl64(acc, lz + 1);
        const uint32_t rem = param ? (uint32_t)(a >> (64 - param)) : 0;
        acc = param ? (a << param) : a;
        n -= lz + 1 + param;
        return ((uint32_t)lz << param) | rem;
      }
    }
    uint32_t q = 0;
    for (;;) {
      if (n == 0) {
        refill();
        if (n == 0) {
          fail = true;
          return 0;
        }
      }
      if (acc == 0) {
        q += n;
        n = 0;
        continue;
      }
      const int lz = __builtin_clzll(acc);
      if (lz >= n) {
        q += n;
        acc = 0;
        n = 0;
        continue;
      }
      q += lz;
      acc = shl64(acc, lz + 1);
      n -= lz + 1;
      break;
    }
    if (param == 0) return q;
    if (n < param) {
      refill();
      if (n < param) {
        fail = true;
        return 0;
      }
    }
    const uint32_t rem = (uint32_t)(acc >> (64 - param));
    acc <<= param;
    n -= param;
    return (q << param) | rem;
  }

  void align() {
    // drop the partial byte: valid bits were loaded from `data` ending at
    // `byte`, so rewind to the byte boundary after the consumed position
    byte -= n / 8;
    n = 0;
    acc = 0;
  }

  // consumed position in bytes; valid only at byte-aligned points (n % 8 == 0)
  size_t pos_bytes() const { return byte - (size_t)(n / 8); }
};

bool read_utf8_number(BitReader& br, uint64_t* out) {
  uint32_t b0 = br.read(8);
  if (br.fail) return false;
  if (b0 < 0x80) {
    *out = b0;
    return true;
  }
  int n_extra = 0;
  uint32_t mask = 0x40;
  while (b0 & mask) {
    ++n_extra;
    mask >>= 1;
  }
  if (n_extra == 0 || n_extra > 6) return false;
  uint64_t val = b0 & (mask - 1);
  for (int i = 0; i < n_extra; ++i) {
    uint32_t b = br.read(8);
    if (br.fail || (b & 0xC0) != 0x80) return false;
    val = (val << 6) | (b & 0x3F);
  }
  *out = val;
  return true;
}

// 'fLaC' + metadata blocks -> streaminfo + first frame byte offset.
bool parse_stream_header(const uint8_t* data, size_t size, StreamInfo* info,
                         size_t* frame_offset) {
  if (size < 8 || memcmp(data, "fLaC", 4) != 0) return false;
  size_t pos = 4;
  bool have_info = false;
  for (;;) {
    if (pos + 4 > size) return false;
    const bool last = data[pos] & 0x80;
    const int btype = data[pos] & 0x7F;
    const uint32_t length =
        ((uint32_t)data[pos + 1] << 16) | ((uint32_t)data[pos + 2] << 8) | data[pos + 3];
    pos += 4;
    if (pos + length > size) return false;
    if (btype == 0 && length >= 34) {
      BitReader br(data, size, pos);
      br.read(16);  // min block size
      br.read(16);  // max block size
      br.read(24);  // min frame size
      br.read(24);  // max frame size
      info->sample_rate = br.read(20);
      info->channels = (int)br.read(3) + 1;
      info->bits_per_sample = (int)br.read(5) + 1;
      info->total_samples = ((int64_t)br.read(4) << 32) | (int64_t)br.read(32);
      have_info = !br.fail;
    }
    pos += length;
    if (last) break;
  }
  *frame_offset = pos;
  return have_info && info->sample_rate > 0;
}

// Decode `count` Rice codewords into zigzag-decoded samples with a
// REGISTER-LOCAL bit cursor. read_rice round-trips the reader state
// through memory on every call and its `n < 44` guard refills every ~2
// codewords; here the cursor (byte/acc/n) lives in locals for the whole
// partition, refills amortize over however many codewords the 64-bit
// window holds (~4 at typical params), and the loop-carried chain is just
// clz -> t -> acc <<= t with a rare-taken guard for t == 64 (x86 shifts
// mask the count; without the guard stale bits would survive).
// Long zero runs (quotient > buffered bits) and the end-of-buffer tail
// fall back to the generic reader. Measured on the FIXED-predictor
// corpus of benchmarks/bench_decode_scaling.py: 5.2 -> 3.4 ns/codeword
// standalone at param 11 (together with the -march=native build flag),
// dominating whole-utterance decode cost.
template <typename S>
static void rice_decode_run(BitReader& br, const int param, const int count,
                            S* out) {
  const uint8_t* const data = br.data;
  const size_t size = br.size;
  size_t byte = br.byte;
  uint64_t acc = br.acc;
  int n = br.n;
  S* p = out;
  S* const end = out + count;
  const uint32_t mask = (uint32_t)((1u << param) - 1);
  while (p < end) {
    if (n < 57 && byte + 8 <= size) {  // top up: one bswap'd 64-bit load
      uint64_t w;
      memcpy(&w, data + byte, 8);
      w = __builtin_bswap64(w);
      const int k = (64 - n) >> 3;
      const int excess = (64 - n) - 8 * k;
      acc |= (w >> n) & ~((1ull << excess) - 1);
      byte += k;
      n += 8 * k;
    }
    for (;;) {
      if (acc == 0) break;  // >= n-bit zero run: refill or generic path
      const int lz = __builtin_clzll(acc);
      const int t = lz + 1 + param;  // whole codeword length in bits
      if (t > n) break;
      // remainder extraction is OFF the loop-carried chain (it reads the
      // pre-shift acc)
      const uint32_t rem = (uint32_t)(acc >> (64 - t)) & mask;
      if (__builtin_expect(t == 64, 0)) acc = 0;
      else acc <<= t;
      n -= t;
      const uint32_t v = ((uint32_t)lz << param) | rem;
      *p++ = (S)((S)(v >> 1) ^ -(S)(v & 1));
      if (p >= end) goto done;
    }
    if (n < 57 && byte + 8 <= size) continue;  // window refillable
    // long zero run or end-of-buffer tail: generic reader handles it
    br.byte = byte;
    br.acc = acc;
    br.n = n;
    {
      const uint32_t v = br.read_rice(param);
      byte = br.byte;
      acc = br.acc;
      n = br.n;
      if (br.fail) break;
      *p++ = (S)((S)(v >> 1) ^ -(S)(v & 1));
    }
  }
done:
  br.byte = byte;
  br.acc = acc;
  br.n = n;
}

// The sample datapath is templated: S = int32_t for bps <= 26 (residuals,
// stereo decorrelation, and wasted-bit shifts all fit — libFLAC makes the
// same split), int64_t for deeper streams. The int32 instantiation halves
// the Rice loop's store traffic and lets the float conversion vectorize
// (measured ~15% on FIXED streams, ~10% on LPC, on top of the ~15% from
// the order-specialized LPC restore below).
template <typename S>
bool decode_residual(BitReader& br, int block_size, int order, S* out) {
  const uint32_t method = br.read(2);
  if (method > 1) return false;
  const int param_bits = method == 0 ? 4 : 5;
  const uint32_t escape = (1u << param_bits) - 1;
  const int part_order = (int)br.read(4);
  const int n_parts = 1 << part_order;
  if (block_size % n_parts || (block_size >> part_order) <= order) return false;
  int idx = 0;
  for (int p = 0; p < n_parts; ++p) {
    int count = (block_size >> part_order) - (p == 0 ? order : 0);
    const uint32_t param = br.read(param_bits);
    if (param == escape) {
      const int raw_bits = (int)br.read(5);
      if (raw_bits == 0) {
        for (int i = 0; i < count; ++i) out[idx + i] = 0;
      } else {
        for (int i = 0; i < count; ++i) out[idx + i] = (S)br.read_signed(raw_bits);
      }
    } else {
      rice_decode_run(br, (int)param, count, out + idx);
    }
    idx += count;
    if (br.fail) return false;
  }
  return true;
}

// LPC restore specialized per order: a compile-time ORDER lets the compiler
// fully unroll the inner MAC chain and keep the coefficients in registers —
// the generic loop was 51% of LPC-stream decode self-time (order 8 is the
// libFLAC default that real ASVspoof corpora use).
template <int ORDER, typename S>
static void restore_lpc_t(const int64_t* coeffs, int shift, const S* res,
                          S* out, int n) {
  for (int i = ORDER; i < n; ++i) {
    int64_t acc = 0;
    for (int j = 0; j < ORDER; ++j) acc += coeffs[j] * (int64_t)out[i - 1 - j];
    out[i] = (S)(res[i - ORDER] + (acc >> shift));
  }
}

template <typename S>
static void restore_lpc(const int64_t* coeffs, int order, int shift,
                        const S* res, S* out, int n) {
  switch (order) {
    case 1: return restore_lpc_t<1, S>(coeffs, shift, res, out, n);
    case 2: return restore_lpc_t<2, S>(coeffs, shift, res, out, n);
    case 3: return restore_lpc_t<3, S>(coeffs, shift, res, out, n);
    case 4: return restore_lpc_t<4, S>(coeffs, shift, res, out, n);
    case 5: return restore_lpc_t<5, S>(coeffs, shift, res, out, n);
    case 6: return restore_lpc_t<6, S>(coeffs, shift, res, out, n);
    case 7: return restore_lpc_t<7, S>(coeffs, shift, res, out, n);
    case 8: return restore_lpc_t<8, S>(coeffs, shift, res, out, n);
    case 9: return restore_lpc_t<9, S>(coeffs, shift, res, out, n);
    case 10: return restore_lpc_t<10, S>(coeffs, shift, res, out, n);
    case 11: return restore_lpc_t<11, S>(coeffs, shift, res, out, n);
    case 12: return restore_lpc_t<12, S>(coeffs, shift, res, out, n);
    default:
      for (int i = order; i < n; ++i) {
        int64_t acc = 0;
        for (int j = 0; j < order; ++j) acc += coeffs[j] * (int64_t)out[i - 1 - j];
        out[i] = (S)(res[i - order] + (acc >> shift));
      }
  }
}

template <typename S>
bool decode_subframe(BitReader& br, int block_size, int bps,
                     std::vector<S>& out, std::vector<S>& scratch) {
  if (br.read(1)) return false;
  const uint32_t stype = br.read(6);
  int wasted = 0;
  if (br.read(1)) wasted = (int)br.read_unary() + 1;
  const int eff = bps - wasted;
  if (eff <= 0 || eff > 33) return false;
  out.resize(block_size);

  if (stype == 0) {  // CONSTANT
    const S v = (S)br.read_signed_long(eff);
    for (int i = 0; i < block_size; ++i) out[i] = v;
  } else if (stype == 1) {  // VERBATIM
    for (int i = 0; i < block_size; ++i) out[i] = (S)br.read_signed_long(eff);
  } else if (stype >= 8 && stype <= 12) {  // FIXED
    const int order = (int)stype - 8;
    for (int i = 0; i < order; ++i) out[i] = (S)br.read_signed_long(eff);
    scratch.resize(block_size);
    if (!decode_residual(br, block_size, order, scratch.data())) return false;
    switch (order) {
      case 0:
        for (int i = 0; i < block_size; ++i) out[i] = scratch[i];
        break;
      case 1:
        for (int i = 1; i < block_size; ++i) out[i] = scratch[i - 1] + out[i - 1];
        break;
      case 2:
        for (int i = 2; i < block_size; ++i)
          out[i] = scratch[i - 2] + 2 * out[i - 1] - out[i - 2];
        break;
      case 3:
        for (int i = 3; i < block_size; ++i)
          out[i] = scratch[i - 3] + 3 * out[i - 1] - 3 * out[i - 2] + out[i - 3];
        break;
      case 4:
        for (int i = 4; i < block_size; ++i)
          out[i] = scratch[i - 4] + 4 * out[i - 1] - 6 * out[i - 2] +
                   4 * out[i - 3] - out[i - 4];
        break;
    }
  } else if (stype >= 32) {  // LPC
    const int order = (int)(stype & 0x1F) + 1;
    for (int i = 0; i < order; ++i) out[i] = (S)br.read_signed_long(eff);
    const int precision = (int)br.read(4) + 1;
    if (precision == 16) return false;  // escape value
    const int shift = br.read_signed(5);
    if (shift < 0) return false;
    int64_t coeffs[32];
    for (int j = 0; j < order; ++j) coeffs[j] = br.read_signed(precision);
    scratch.resize(block_size);
    if (!decode_residual(br, block_size, order, scratch.data())) return false;
    restore_lpc(coeffs, order, shift, scratch.data(), out.data(), block_size);
  } else {
    return false;  // reserved type
  }
  if (wasted)
    for (int i = 0; i < block_size; ++i) out[i] <<= wasted;
  return !br.fail;
}

// Decode one frame at `pos`. On success fills `channels` vectors of equal
// length (after stereo decorrelation) and advances *pos past the frame CRC.
template <typename S>
bool decode_frame(const uint8_t* data, size_t size, size_t* pos,
                  const StreamInfo& info,
                  std::vector<std::vector<S>>& chans,
                  std::vector<S>& scratch, int* block_size_out) {
  const size_t start = *pos;
  BitReader br(data, size, start);
  if (br.read(14) != kSync || br.read(1)) return false;
  br.read(1);  // blocking strategy
  const uint32_t bs_code = br.read(4);
  const uint32_t sr_code = br.read(4);
  const uint32_t chan_code = br.read(4);
  const uint32_t size_code = br.read(3);
  if (br.read(1)) return false;
  uint64_t frame_no;
  if (!read_utf8_number(br, &frame_no)) return false;

  int block_size;
  if (bs_code == 0) return false;
  else if (bs_code == 1) block_size = 192;
  else if (bs_code <= 5) block_size = 576 << (bs_code - 2);
  else if (bs_code == 6) block_size = (int)br.read(8) + 1;
  else if (bs_code == 7) block_size = (int)br.read(16) + 1;
  else block_size = 256 << (bs_code - 8);

  if (sr_code == 12) br.read(8);
  else if (sr_code == 13 || sr_code == 14) br.read(16);
  else if (sr_code == 15) return false;

  int bps = info.bits_per_sample;
  switch (size_code) {
    case 0: break;
    case 1: bps = 8; break;
    case 2: bps = 12; break;
    case 4: bps = 16; break;
    case 5: bps = 20; break;
    case 6: bps = 24; break;
    case 7: bps = 32; break;
    default: return false;
  }

  const size_t header_end = br.pos_bytes();
  const uint32_t expect_crc8 = br.read(8);
  if (br.fail || crc8(data + start, header_end - start) != expect_crc8) return false;

  int channels;
  int bps_add[8] = {0};
  if (chan_code <= 7) {
    channels = (int)chan_code + 1;
  } else if (chan_code == 8) {  // left/side
    channels = 2;
    bps_add[1] = 1;
  } else if (chan_code == 9) {  // right/side
    channels = 2;
    bps_add[0] = 1;
  } else if (chan_code == 10) {  // mid/side
    channels = 2;
    bps_add[1] = 1;
  } else {
    return false;
  }
  if (channels != info.channels) return false;

  chans.resize(channels);
  for (int c = 0; c < channels; ++c)
    if (!decode_subframe(br, block_size, bps + bps_add[c], chans[c], scratch))
      return false;
  br.align();
  const size_t frame_end = br.pos_bytes();
  const uint32_t expect_crc16 = br.read(16);
  if (br.fail || crc16(data + start, frame_end - start) != expect_crc16) return false;

  if (chan_code == 8) {  // left/side -> right = left - side
    for (int i = 0; i < block_size; ++i) chans[1][i] = chans[0][i] - chans[1][i];
  } else if (chan_code == 9) {  // side/right -> left = right + side
    for (int i = 0; i < block_size; ++i) chans[0][i] = chans[1][i] + chans[0][i];
  } else if (chan_code == 10) {  // mid/side
    for (int i = 0; i < block_size; ++i) {
      const int64_t mid = chans[0][i], side = chans[1][i];
      const int64_t lr_sum = (mid << 1) | (side & 1);
      chans[0][i] = (S)((lr_sum + side) >> 1);
      chans[1][i] = (S)((lr_sum - side) >> 1);
    }
  }
  *pos = br.pos_bytes();
  *block_size_out = block_size;
  return true;
}

// Decode loop over frames, templated on the sample type (see
// decode_residual's note on the int32/int64 split).
template <typename S>
long decode_chunk_impl(const std::vector<uint8_t>& buf, size_t pos,
                       const StreamInfo& info, long start_frame,
                       long n_samples, float* out) {
  const float scale =
      1.0f / (float)(1ull << (info.bits_per_sample - 1)) / (float)info.channels;
  // thread-local for the same reason as flac_decode_chunk's file buffer:
  // one allocation per worker thread, not per decoded file
  static thread_local std::vector<std::vector<S>> chans;
  static thread_local std::vector<S> scratch;
  long sample_pos = 0;  // absolute sample index at frame start
  long written = 0;
  const long stop = start_frame + n_samples;
  while (pos < buf.size() && sample_pos < stop) {
    int block_size;
    if (!decode_frame<S>(buf.data(), buf.size(), &pos, info, chans, scratch,
                         &block_size))
      return written > 0 ? written : -2;
    const long lo = start_frame > sample_pos ? start_frame : sample_pos;
    const long hi = stop < sample_pos + block_size ? stop : sample_pos + block_size;
    if (info.channels == 1) {  // mono fast path: vectorizable convert
      const S* ch = chans[0].data();
      for (long s = lo; s < hi; ++s)
        out[s - start_frame] = (float)ch[s - sample_pos] * scale;
      written += hi > lo ? hi - lo : 0;
    } else {
      for (long s = lo; s < hi; ++s) {
        int64_t acc = 0;
        for (int c = 0; c < info.channels; ++c) acc += chans[c][s - sample_pos];
        out[s - start_frame] = (float)acc * scale;
        ++written;
      }
    }
    sample_pos += block_size;
    if (info.total_samples > 0 && sample_pos >= info.total_samples) break;
  }
  return written;
}

bool read_file(const char* path, std::vector<uint8_t>* buf) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  fseek(f, 0, SEEK_END);
  const long sz = ftell(f);
  fseek(f, 0, SEEK_SET);
  if (sz <= 0) {
    fclose(f);
    return false;
  }
  buf->resize((size_t)sz);
  const bool ok = fread(buf->data(), 1, (size_t)sz, f) == (size_t)sz;
  fclose(f);
  return ok;
}

}  // namespace flacdec

extern "C" {

// Header-only probe. Returns 0 on success, negative on error.
int flac_info(const char* path, int64_t* frames, int32_t* sample_rate,
              int32_t* channels) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  uint8_t head[65536];
  const size_t got = fread(head, 1, sizeof(head), f);
  fclose(f);
  flacdec::StreamInfo info;
  size_t off;
  if (!flacdec::parse_stream_header(head, got, &info, &off)) {
    // metadata larger than the fast-path buffer (cover art, big padding):
    // the header walk needs every block present, so retry on the full file
    std::vector<uint8_t> buf;
    if (!flacdec::read_file(path, &buf) ||
        !flacdec::parse_stream_header(buf.data(), buf.size(), &info, &off))
      return -2;
  }
  *frames = info.total_samples;
  *sample_rate = (int32_t)info.sample_rate;
  *channels = (int32_t)info.channels;
  return 0;
}

// Decode [start_frame, start_frame + n_samples) as float32 mono into `out`.
// Returns samples written (>= 0) or a negative error:
//   -1 open/read error, -2 malformed stream, -3 sample-rate mismatch.
long flac_decode_chunk(const char* path, long start_frame, long n_samples,
                       int32_t expected_sr, float* out) {
  // thread-local: batch decode calls this once per file per worker thread;
  // reusing the buffer keeps its capacity (no per-file malloc + the
  // vector's zero-fill of grown bytes only happens when a larger file
  // arrives, not per call)
  static thread_local std::vector<uint8_t> buf;
  if (!flacdec::read_file(path, &buf)) return -1;
  flacdec::StreamInfo info;
  size_t pos;
  if (!flacdec::parse_stream_header(buf.data(), buf.size(), &info, &pos)) return -2;
  if (expected_sr > 0 && (int32_t)info.sample_rate != expected_sr) return -3;
  if (info.channels < 1 || info.channels > 8 || info.bits_per_sample < 4) return -2;

  if (info.bits_per_sample <= 26)
    return flacdec::decode_chunk_impl<int32_t>(buf, pos, info, start_frame,
                                               n_samples, out);
  return flacdec::decode_chunk_impl<int64_t>(buf, pos, info, start_frame,
                                             n_samples, out);
}

}  // extern "C"
