// Native batch WAV loader — the framework's host-side data-loading hot path.
//
// Role: the reference spends its input time in per-process librosa decodes
// fanned out by joblib (reference/ASV_dl_func.py:1031-1049). Here the batch
// fill is one C++ call: each worker thread seeks into its file, decodes PCM
// to float32 mono (librosa scaling: int16 / 32768), and writes directly into
// the caller-provided pinned batch buffer — no Python objects, no GIL, no
// per-file process spawn.
//
// Supports canonical RIFF/WAVE with 8/16/24/32-bit integer PCM and 32-bit
// float, mono or multi-channel (averaged to mono), plus FLAC via
// flacdec.cpp (dispatch on extension). Other containers stay on the Python
// fallback path.
//
// Build: g++ -O3 -shared -fPIC -std=c++17 -pthread wavloader.cpp flacdec.cpp -o libwavloader.so

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

// FLAC support (flacdec.cpp, compiled into the same library)
extern "C" long flac_decode_chunk(const char* path, long start_frame,
                                  long n_samples, int32_t expected_sr, float* out);
extern "C" int flac_info(const char* path, int64_t* frames, int32_t* sample_rate,
                         int32_t* channels);

namespace {

bool has_flac_ext(const char* path) {
  const size_t len = strlen(path);
  if (len < 5) return false;
  const char* ext = path + len - 5;
  return (ext[0] == '.') && (ext[1] == 'f' || ext[1] == 'F') &&
         (ext[2] == 'l' || ext[2] == 'L') && (ext[3] == 'a' || ext[3] == 'A') &&
         (ext[4] == 'c' || ext[4] == 'C');
}

struct WavFormat {
  uint16_t audio_format = 0;  // 1 = PCM, 3 = IEEE float
  uint16_t channels = 0;
  uint32_t sample_rate = 0;
  uint16_t bits_per_sample = 0;
  long data_offset = 0;  // byte offset of PCM payload
  uint32_t data_bytes = 0;
};

bool read_header(FILE* f, WavFormat* fmt) {
  char riff[4], wave[4];
  uint32_t riff_size;
  if (fread(riff, 1, 4, f) != 4 || memcmp(riff, "RIFF", 4) != 0) return false;
  if (fread(&riff_size, 4, 1, f) != 1) return false;
  if (fread(wave, 1, 4, f) != 4 || memcmp(wave, "WAVE", 4) != 0) return false;

  bool have_fmt = false;
  while (true) {
    char id[4];
    uint32_t size;
    if (fread(id, 1, 4, f) != 4 || fread(&size, 4, 1, f) != 1) return false;
    if (memcmp(id, "fmt ", 4) == 0) {
      uint8_t buf[16];
      if (size < 16 || fread(buf, 1, 16, f) != 16) return false;
      memcpy(&fmt->audio_format, buf + 0, 2);
      memcpy(&fmt->channels, buf + 2, 2);
      memcpy(&fmt->sample_rate, buf + 4, 4);
      memcpy(&fmt->bits_per_sample, buf + 14, 2);
      // skip extension bytes INCLUDING the word-alignment pad (an odd
      // fmt size would otherwise misalign every subsequent chunk header)
      if (size > 16) fseek(f, (size - 16) + (size & 1), SEEK_CUR);
      have_fmt = true;
    } else if (memcmp(id, "data", 4) == 0) {
      fmt->data_offset = ftell(f);
      fmt->data_bytes = size;
      return have_fmt;
    } else {
      fseek(f, size + (size & 1), SEEK_CUR);  // chunks are word-aligned
    }
  }
}

// Only these widths are decodable; anything else (incl. bits < 8, whose
// bytes_per_sample would be 0 and divide-by-zero-crash the process) must
// be rejected BEFORE any frame arithmetic.
inline bool fmt_supported(const WavFormat& fmt) {
  return fmt.channels > 0 &&
         (fmt.bits_per_sample == 8 || fmt.bits_per_sample == 16 ||
          fmt.bits_per_sample == 24 || fmt.bits_per_sample == 32);
}

// Decode `n_frames` frames starting at `start_frame` into mono float32.
// Returns frames actually written (remainder left as-is in `out`).
long decode_into(FILE* f, const WavFormat& fmt, long start_frame, long n_frames,
                 float* out) {
  const int ch = fmt.channels;
  const int bytes_per_sample = fmt.bits_per_sample / 8;
  const long frame_bytes = (long)bytes_per_sample * ch;
  const long total_frames = fmt.data_bytes / frame_bytes;
  if (start_frame >= total_frames) return 0;
  const long avail = total_frames - start_frame;
  const long todo = n_frames < avail ? n_frames : avail;

  fseek(f, fmt.data_offset + start_frame * frame_bytes, SEEK_SET);
  std::vector<uint8_t> raw(todo * frame_bytes);
  const long got_bytes = (long)fread(raw.data(), 1, raw.size(), f);
  const long got = got_bytes / frame_bytes;

  // fast path: 16-bit mono (the common ASVspoof layout) auto-vectorizes
  if (fmt.bits_per_sample == 16 && ch == 1) {
    const int16_t* s = reinterpret_cast<const int16_t*>(raw.data());
    constexpr float kScale = 1.0f / 32768.0f;
    for (long i = 0; i < got; ++i) out[i] = s[i] * kScale;
    return got;
  }

  const float inv_ch = 1.0f / ch;
  for (long i = 0; i < got; ++i) {
    float acc = 0.0f;
    const uint8_t* p = raw.data() + i * frame_bytes;
    for (int c = 0; c < ch; ++c, p += bytes_per_sample) {
      float v = 0.0f;
      switch (fmt.bits_per_sample) {
        case 16: {
          int16_t s;
          memcpy(&s, p, 2);
          v = s / 32768.0f;
          break;
        }
        case 32: {
          if (fmt.audio_format == 3) {
            memcpy(&v, p, 4);
          } else {
            int32_t s;
            memcpy(&s, p, 4);
            v = s / 2147483648.0f;
          }
          break;
        }
        case 24: {
          int32_t s = (p[0] | (p[1] << 8) | (p[2] << 16));
          if (s & 0x800000) s -= 0x1000000;
          v = s / 8388608.0f;
          break;
        }
        case 8:
          v = ((int)p[0] - 128) / 128.0f;
          break;
        default:
          return -2;
      }
      acc += v;
    }
    out[i] = acc * inv_ch;
  }
  return got;
}

}  // namespace

extern "C" {

// Header-only probe. Returns 0 on success.
int wav_info(const char* path, int64_t* frames, int32_t* sample_rate,
             int32_t* channels) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  WavFormat fmt;
  const bool ok = read_header(f, &fmt);
  fclose(f);
  if (!ok || !fmt_supported(fmt)) return -2;
  *frames = (int64_t)(fmt.data_bytes / ((fmt.bits_per_sample / 8) * fmt.channels));
  *sample_rate = (int32_t)fmt.sample_rate;
  *channels = (int32_t)fmt.channels;
  return 0;
}

// Decode fixed-length chunks in parallel, writing DIRECTLY into the
// caller's full (B, n_samples) float32 batch buffer. `rows[j]` is the
// destination row for `paths[j]` (NULL -> identity, j -> row j). Rows the
// decoder completes are fully defined on return (short reads zero-padded
// in place, so the caller can hand over an UNINITIALIZED buffer — no
// host-side pre-zero + row-copy pass, which at 128 KB/row was costing more
// memory traffic than the decode itself). Failed rows (nonzero status) are
// left untouched for the caller's Python fallback.
// status[j]: 0 ok, 1 open/header error, 2 bad format, 3 sample-rate mismatch.
int load_chunk_batch_rows(const char** paths, const double* start_seconds,
                          const int32_t* rows, int32_t batch, int32_t n_samples,
                          int32_t expected_sr, float* out, int32_t* status,
                          int32_t n_threads) {
  if (n_threads <= 0) n_threads = (int32_t)std::thread::hardware_concurrency();
  if (n_threads <= 0) n_threads = 4;
  if (n_threads > 16) n_threads = 16;  // thread-spawn cost dominates beyond this
  // amortize spawn cost: keep >= 8 files per worker
  while (n_threads > 1 && batch / n_threads < 8) n_threads /= 2;

  // Group same-path FLAC requests: FLAC has no per-frame seek, so decoding
  // chunk k of a file replays frames 0..k — with the dataset's one-row-per-
  // 2-s-chunk layout (reference/ASV_dl_func.py:247-340) a 6-s file would be
  // decoded 3x per batch. One span decode per file + per-row slicing makes
  // multi-chunk FLAC cost ~one decode of the covered span instead.
  // `groups` is CSR over batch indices: singletons for WAV (seekable) and
  // lone FLAC chunks; multi-entry runs for repeated FLAC paths.
  std::vector<int32_t> group_items;
  std::vector<int32_t> group_off(1, 0);
  {
    std::unordered_map<std::string, std::vector<int32_t>> flac_groups;
    std::vector<int32_t> order;  // first-appearance order of keys
    order.reserve(batch);
    for (int32_t j = 0; j < batch; ++j) {
      if (has_flac_ext(paths[j])) {
        auto& v = flac_groups[paths[j]];
        if (v.empty()) order.push_back(j);  // j is the group's representative
        v.push_back(j);
      } else {
        order.push_back(~j);  // singleton WAV marker
      }
    }
    group_items.reserve(batch);
    for (const int32_t key : order) {
      if (key < 0) {
        group_items.push_back(~key);
      } else {
        const auto& v = flac_groups[paths[key]];
        group_items.insert(group_items.end(), v.begin(), v.end());
      }
      group_off.push_back((int32_t)group_items.size());
    }
  }
  const int32_t n_groups = (int32_t)group_off.size() - 1;
  std::atomic<int32_t> next(0);

  auto worker = [&]() {
    std::vector<float> scratch;
    while (true) {
      const int32_t g = next.fetch_add(1);
      if (g >= n_groups) break;
      const int32_t* items = group_items.data() + group_off[g];
      const int32_t count = group_off[g + 1] - group_off[g];

      // Per-worker scratch cap for grouped span decode: 32M samples = 128 MB
      // (~33 min @ 16 kHz). Without a cap, two chunks of one file with widely
      // separated starts (e.g. 0 s and 3600 s) would allocate and decode the
      // whole intervening span; past the cap fall back to per-chunk decode
      // (FLAC replays frames 0..start per chunk — slower, but bounded memory).
      constexpr long kMaxSpanSamples = 32L * 1024 * 1024;

      bool span_ok = count > 1;
      long span_lo = 0, span_hi = 0;
      if (count > 1) {  // multi-chunk FLAC file: one span decode, slice rows
        span_lo = (long)(start_seconds[items[0]] * expected_sr + 0.5);
        span_hi = span_lo;
        for (int32_t k = 0; k < count; ++k) {
          const long s = (long)(start_seconds[items[k]] * expected_sr + 0.5);
          if (s < span_lo) span_lo = s;
          if (s > span_hi) span_hi = s;
        }
        span_hi += n_samples;
        span_ok = span_hi - span_lo <= kMaxSpanSamples;
      }
      if (count > 1 && !span_ok) {  // too sparse: per-chunk decode each row
        for (int32_t k = 0; k < count; ++k) {
          const int32_t j = items[k];
          float* dst = out + (long)(rows ? rows[j] : j) * n_samples;
          const long start = (long)(start_seconds[j] * expected_sr + 0.5);
          const long got1 =
              flac_decode_chunk(paths[j], start, n_samples, expected_sr, dst);
          if (got1 < 0) {
            status[j] = (int32_t)(-got1);
            continue;
          }
          status[j] = 0;
          if (got1 < n_samples)
            memset(dst + got1, 0, sizeof(float) * (size_t)(n_samples - got1));
        }
        continue;
      }
      if (count > 1) {
        scratch.resize((size_t)(span_hi - span_lo));
        const long got = flac_decode_chunk(paths[items[0]], span_lo,
                                           span_hi - span_lo, expected_sr,
                                           scratch.data());
        for (int32_t k = 0; k < count; ++k) {
          const int32_t j = items[k];
          if (got < 0) {
            status[j] = (int32_t)(-got);
            continue;
          }
          float* dst = out + (long)(rows ? rows[j] : j) * n_samples;
          const long start = (long)(start_seconds[j] * expected_sr + 0.5);
          const long off = start - span_lo;
          long avail = got - off;
          if (avail < 0) avail = 0;
          if (avail > n_samples) avail = n_samples;
          if (avail < n_samples && got < span_hi - span_lo) {
            // Span came up short (clean EOF or a mid-stream decode failure
            // past some frame) and this chunk did not get its full slice.
            // The span return value cannot distinguish the two causes, but
            // the single-chunk path CAN (clean EOF -> zero-padded ok row;
            // failure before the chunk -> negative status -> Python
            // fallback -> row dropped). Re-decode just this chunk so
            // grouped and ungrouped batches are behavior-identical —
            // corrupt tails must not become silent all-zero "ok" rows.
            const long got1 =
                flac_decode_chunk(paths[j], start, n_samples, expected_sr, dst);
            if (got1 < 0) {
              status[j] = (int32_t)(-got1);
              continue;
            }
            status[j] = 0;
            if (got1 < n_samples)
              memset(dst + got1, 0, sizeof(float) * (size_t)(n_samples - got1));
            continue;
          }
          status[j] = 0;
          if (avail > 0) memcpy(dst, scratch.data() + off, sizeof(float) * (size_t)avail);
          if (avail < n_samples)
            memset(dst + avail, 0, sizeof(float) * (size_t)(n_samples - avail));
        }
        continue;
      }

      const int32_t j = items[0];
      status[j] = 0;
      float* dst = out + (long)(rows ? rows[j] : j) * n_samples;
      long got = -2;
      if (has_flac_ext(paths[j])) {
        const long start = (long)(start_seconds[j] * expected_sr + 0.5);
        got = flac_decode_chunk(paths[j], start, n_samples, expected_sr, dst);
        if (got < 0) {
          status[j] = (int32_t)(-got);
          continue;
        }
      } else {
        FILE* f = fopen(paths[j], "rb");
        if (!f) {
          status[j] = 1;
          continue;
        }
        WavFormat fmt;
        if (!read_header(f, &fmt) || !fmt_supported(fmt)) {
          status[j] = 2;
          fclose(f);
          continue;
        }
        if ((int32_t)fmt.sample_rate != expected_sr) {
          status[j] = 3;
          fclose(f);
          continue;
        }
        const long start = (long)(start_seconds[j] * fmt.sample_rate + 0.5);
        got = decode_into(f, fmt, start, n_samples, dst);
        fclose(f);
        if (got < 0) {
          status[j] = 2;
          continue;
        }
      }
      if (got < n_samples)  // short file: zero-pad in place
        memset(dst + got, 0, sizeof(float) * (size_t)(n_samples - got));
    }
  };

  std::vector<std::thread> threads;
  const int32_t n = n_threads < n_groups ? n_threads : n_groups;
  threads.reserve(n);
  for (int32_t t = 0; t < n; ++t) threads.emplace_back(worker);
  for (auto& th : threads) th.join();
  return 0;
}

// Back-compat contiguous entry (caller-zeroed buffer, row j <- paths[j]).
int load_chunk_batch(const char** paths, const double* start_seconds,
                     int32_t batch, int32_t n_samples, int32_t expected_sr,
                     float* out, int32_t* status, int32_t n_threads) {
  return load_chunk_batch_rows(paths, start_seconds, nullptr, batch, n_samples,
                               expected_sr, out, status, n_threads);
}

}  // extern "C"
