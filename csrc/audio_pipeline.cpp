// Native raw-audio loader: wav read + augmentation + dB-normalize + int16
// scaling on a real thread pool (no GIL).
//
// Role: the host-side job of device-frontend training
// (train_conf.device_frontend — ppasr_tpu/ops/frontend.py runs
// fbank/SpecAugment on the accelerator; this file covers everything before
// it). The reference delegates this stage to paddle.io.DataLoader worker
// subprocesses (reference ppasr/trainer.py:107-112); the Python thread
// loader (ppasr_tpu/data/loader.py) is GIL-bound in the numpy transform
// chain. Here each utterance is fully processed in C++:
//
//   read PCM wav  (reference audio.py:55-71 soundfile path; PCM 8/16/24/32)
//   -> slice [start,end]              (audio.py:74-107 slice_from_file)
//   -> noise overlays at SNR          (noise_perturb.py:25-55 + add_noise
//                                      audio.py:452-480)
//   -> speed via linear interp        (speed_perturb.py + audio.py:266-285)
//   -> time shift, zero fill          (shift_perturb.py + audio.py:347-367)
//   -> volume gain dBFS               (volume_perturb.py + audio.py:256-264)
//   -> RMS-normalize to target_db     (audio_featurizer.py:35-38 prep)
//   -> int16-scale floats             (audio.py:552-574 to('int16'))
//
// Randomness (which noise file, SNR, rate, shift...) is drawn by the PYTHON
// caller and passed per item, so the distribution lives in one place
// (data/augmentor) and C++ stays deterministic and unit-testable.
//
// C ABI only (ctypes binding in ppasr_tpu/data/native_pipeline.py).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

// ------------------------------------------------------------------ wav read

struct Wav {
  std::vector<float> samples;  // mono float32 in [-1, 1]
  int sample_rate = 0;
};

uint32_t rd_u32(const uint8_t* p) {
  return (uint32_t)p[0] | ((uint32_t)p[1] << 8) | ((uint32_t)p[2] << 16) |
         ((uint32_t)p[3] << 24);
}
uint16_t rd_u16(const uint8_t* p) {
  return (uint16_t)((uint32_t)p[0] | ((uint32_t)p[1] << 8));
}

// Minimal RIFF/WAVE PCM (+ IEEE float) reader. Returns false on anything
// exotic — the Python wrapper falls back to the soundfile-equivalent path.
bool read_wav(const char* path, Wav* out, double start_s, double end_s) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  uint8_t hdr[12];
  if (std::fread(hdr, 1, 12, f) != 12 || std::memcmp(hdr, "RIFF", 4) != 0 ||
      std::memcmp(hdr + 8, "WAVE", 4) != 0) {
    std::fclose(f);
    return false;
  }
  uint16_t fmt = 0, channels = 0, bits = 0;
  uint32_t rate = 0;
  long data_pos = -1;
  uint32_t data_len = 0;
  uint8_t ch[8];
  while (std::fread(ch, 1, 8, f) == 8) {
    uint32_t sz = rd_u32(ch + 4);
    if (std::memcmp(ch, "fmt ", 4) == 0) {
      std::vector<uint8_t> buf(sz);
      if (std::fread(buf.data(), 1, sz, f) != sz) break;
      if (sz < 16) break;
      fmt = rd_u16(&buf[0]);
      channels = rd_u16(&buf[2]);
      rate = rd_u32(&buf[4]);
      bits = rd_u16(&buf[14]);
      if (fmt == 0xFFFE && sz >= 40)  // WAVE_FORMAT_EXTENSIBLE
        fmt = rd_u16(&buf[24]);
    } else if (std::memcmp(ch, "data", 4) == 0) {
      data_pos = std::ftell(f);
      data_len = sz;
      if (std::fseek(f, (long)((sz + 1) & ~1u), SEEK_CUR) != 0) break;
    } else {
      if (std::fseek(f, (long)((sz + 1) & ~1u), SEEK_CUR) != 0) break;
    }
  }
  if (data_pos < 0 || channels == 0 || rate == 0 ||
      !((fmt == 1 && (bits == 8 || bits == 16 || bits == 24 || bits == 32)) ||
        (fmt == 3 && bits == 32))) {
    std::fclose(f);
    return false;
  }
  const int bytes_per = bits / 8;
  const uint32_t frame_bytes = (uint32_t)bytes_per * channels;
  uint32_t n_frames = data_len / frame_bytes;
  uint32_t f0 = 0, f1 = n_frames;
  if (start_s >= 0.0) f0 = std::min(n_frames, (uint32_t)(start_s * rate));
  if (end_s >= 0.0) f1 = std::min(n_frames, (uint32_t)(end_s * rate));
  if (f1 < f0) f1 = f0;
  std::fseek(f, data_pos + (long)f0 * (long)frame_bytes, SEEK_SET);
  uint32_t want = f1 - f0;
  std::vector<uint8_t> raw((size_t)want * frame_bytes);
  size_t got = std::fread(raw.data(), 1, raw.size(), f);
  std::fclose(f);
  want = (uint32_t)(got / frame_bytes);

  out->sample_rate = (int)rate;
  out->samples.resize(want);
  const uint8_t* p = raw.data();
  for (uint32_t i = 0; i < want; ++i, p += frame_bytes) {
    // channel 0..C-1 averaged like the Python reader's channel mean
    double acc = 0.0;
    for (int c = 0; c < channels; ++c) {
      const uint8_t* s = p + (size_t)c * bytes_per;
      double v = 0.0;
      if (fmt == 3) {  // float32
        float fv;
        std::memcpy(&fv, s, 4);
        v = fv;
      } else if (bits == 16) {
        v = (double)(int16_t)rd_u16(s) / 32768.0;
      } else if (bits == 32) {
        v = (double)(int32_t)rd_u32(s) / 2147483648.0;
      } else if (bits == 8) {
        // 8-bit PCM is unsigned; python path: (u8-128)*256 as int16
        v = (double)(((int)s[0] - 128) * 256) / 32768.0;
      } else {  // 24-bit
        int32_t iv = ((int32_t)s[0] << 8) | ((int32_t)s[1] << 16) |
                     ((int32_t)s[2] << 24);
        v = (double)(iv >> 8) / 8388608.0;
      }
      acc += v;
    }
    out->samples[i] = (float)(acc / channels);
  }
  return true;
}

// -------------------------------------------------------------- transforms

double rms_db(const std::vector<float>& x) {
  if (x.empty()) return -1e30;
  double acc = 0.0;
  for (float v : x) acc += (double)v * v;
  double ms = acc / (double)x.size();
  if (ms <= 0.0) return -1e30;
  return 10.0 * std::log10(ms);
}

void gain_db(std::vector<float>& x, double g) {
  float k = (float)std::pow(10.0, g / 20.0);
  for (float& v : x) v *= k;
}

// audio.py:266-285 change_speed: new_indices = linspace(0, old_len, new_len)
// (endpoint INCLUDED — np.interp clamps the final index to the last sample)
void change_speed(std::vector<float>& x, double rate) {
  if (rate == 1.0 || x.empty()) return;
  size_t old_len = x.size();
  size_t new_len = (size_t)((double)old_len / rate);
  if (new_len < 1) {
    x.clear();
    return;
  }
  std::vector<float> out(new_len);
  double step = new_len > 1 ? (double)old_len / (double)(new_len - 1) : 0.0;
  for (size_t i = 0; i < new_len; ++i) {
    double pos = step * (double)i;
    size_t i0 = (size_t)pos;
    if (i0 >= old_len - 1) {
      out[i] = x[old_len - 1];
    } else {
      double frac = pos - (double)i0;
      out[i] = (float)((1.0 - frac) * x[i0] + frac * x[i0 + 1]);
    }
  }
  x.swap(out);
}

// audio.py:347-367 shift with zero fill
void shift_samples(std::vector<float>& x, long s) {
  long n = (long)x.size();
  if (s == 0 || n == 0 || std::labs(s) > n) return;
  if (s > 0) {
    std::memmove(x.data() + s, x.data(), (size_t)(n - s) * sizeof(float));
    std::fill(x.begin(), x.begin() + s, 0.0f);
  } else {
    std::memmove(x.data(), x.data() - s, (size_t)(n + s) * sizeof(float));
    std::fill(x.end() + s, x.end(), 0.0f);
  }
}

// noise_perturb.py wrap-pad + audio.py:452-480 add_noise. offset_frac in
// [0,1) stands in for random_subsegment's uniform start draw.
bool add_noise(std::vector<float>& x, int sr, const char* noise_path,
               double snr_db_v, double offset_frac) {
  Wav nz;
  if (!read_wav(noise_path, &nz, -1.0, -1.0)) return false;
  if (nz.sample_rate != sr || nz.samples.empty()) return false;  // python
  // path resamples mismatched noise; keep native fast path strict
  size_t need = x.size();
  std::vector<float>& ns = nz.samples;
  if (ns.size() < need + 1) {  // wrap-pad (np.tile)[:n+1]
    size_t reps = (need + 1 + ns.size() - 1) / ns.size();
    std::vector<float> tiled;
    tiled.reserve(ns.size() * reps);
    for (size_t r = 0; r < reps; ++r)
      tiled.insert(tiled.end(), ns.begin(), ns.end());
    tiled.resize(need + 1);
    ns.swap(tiled);
  }
  double n_rms = rms_db(ns);
  double a_rms = rms_db(x);
  double g = std::min(a_rms - n_rms - snr_db_v, 300.0);
  float k = (float)std::pow(10.0, g / 20.0);
  size_t max_off = ns.size() - need;
  size_t off = (size_t)(offset_frac * (double)max_off);
  if (off > max_off) off = max_off;
  for (size_t i = 0; i < need; ++i) x[i] += k * ns[off + i];
  return true;
}

// ---------------------------------------------------------------- batch job

struct ItemSpec {
  const char* path;
  double start_s, end_s;
  // up to max_noise overlays, unused entries have null path
  const char* const* noise_paths;
  const double* snr_db;
  const double* noise_offset_frac;
  int n_noise;
  double speed_rate;
  double shift_ms;
  double volume_gain_db;
};

// returns produced length, or -1 when the item needs the Python fallback
long process_item(const ItemSpec& it, int target_rate, double target_db,
                  int do_normalize, float* out, long max_samples) {
  Wav w;
  if (!read_wav(it.path, &w, it.start_s, it.end_s)) return -1;
  if (w.sample_rate != target_rate) return -1;  // resample → Python path
  std::vector<float>& x = w.samples;
  if (x.empty()) return -1;

  for (int k = 0; k < it.n_noise; ++k) {
    if (it.noise_paths[k] && it.noise_paths[k][0]) {
      if (!add_noise(x, w.sample_rate, it.noise_paths[k], it.snr_db[k],
                     it.noise_offset_frac[k]))
        return -1;
    }
  }
  if (it.speed_rate > 0.0 && it.speed_rate != 1.0)
    change_speed(x, it.speed_rate);
  if (it.shift_ms != 0.0)
    shift_samples(x, (long)(it.shift_ms * w.sample_rate / 1000.0));
  if (it.volume_gain_db != 0.0) gain_db(x, it.volume_gain_db);
  if (do_normalize) {
    double g = target_db - rms_db(x);
    gain_db(x, std::min(g, 300.0));
  }
  long n = (long)std::min<size_t>(x.size(), (size_t)max_samples);
  for (long i = 0; i < n; ++i) {
    // float32 [-1,1] → int16-scaled float with clipping (audio.py:552-574)
    float v = x[(size_t)i] * 32768.0f;
    out[i] = std::min(std::max(v, -32768.0f), 32767.0f);
  }
  return n;
}

}  // namespace

extern "C" {

// Fills out[n, max_samples] (caller-zeroed) and out_lens[n].
// out_lens[i] = -1 → caller must produce item i via the Python path.
// Per-item noise arrays are flattened [n, max_noise].
int ap_load_batch(const char* const* paths, int n, const double* starts,
                  const double* ends, const char* const* noise_paths,
                  const double* snr_db, const double* noise_offset_frac,
                  const int* n_noise, int max_noise,
                  const double* speed_rates, const double* shifts_ms,
                  const double* volume_gains_db, int target_rate,
                  double target_db, int do_normalize, float* out,
                  long long* out_lens, long long max_samples, int n_threads) {
  std::atomic<int> next(0);
  if (n_threads < 1) n_threads = 1;
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      ItemSpec it;
      it.path = paths[i];
      it.start_s = starts ? starts[i] : -1.0;
      it.end_s = ends ? ends[i] : -1.0;
      std::vector<const char*> np_(max_noise, nullptr);
      for (int k = 0; k < max_noise; ++k)
        np_[(size_t)k] = noise_paths ? noise_paths[i * max_noise + k] : nullptr;
      it.noise_paths = np_.data();
      it.snr_db = snr_db ? snr_db + (size_t)i * max_noise : nullptr;
      it.noise_offset_frac =
          noise_offset_frac ? noise_offset_frac + (size_t)i * max_noise
                            : nullptr;
      it.n_noise = n_noise ? n_noise[i] : 0;
      it.speed_rate = speed_rates ? speed_rates[i] : 1.0;
      it.shift_ms = shifts_ms ? shifts_ms[i] : 0.0;
      it.volume_gain_db = volume_gains_db ? volume_gains_db[i] : 0.0;
      out_lens[i] = process_item(it, target_rate, target_db, do_normalize,
                                 out + (size_t)i * (size_t)max_samples,
                                 (long)max_samples);
    }
  };
  std::vector<std::thread> pool;
  int nt = std::min(n_threads, n);
  pool.reserve((size_t)nt);
  for (int t = 0; t < nt; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return 0;
}

}  // extern "C"
