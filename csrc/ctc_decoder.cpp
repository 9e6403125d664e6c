// Native CTC prefix beam-search decoder with n-gram LM shallow fusion.
//
// The TPU-native equivalent of the reference's paddlespeech_ctcdecoders SWIG
// extension (ppasr/decoders/swig_wrapper.py: Scorer,
// ctc_beam_search_decoding_batch, CtcBeamSearchDecoderBatch): offline batch
// decoding with an utterance-parallel thread pool, stateful streaming
// decoders, cutoff_prob/cutoff_top_n pruning and char-level ARPA LM fusion
// (alpha/beta weights). Exposed through a plain C ABI consumed via ctypes
// (ppasr_tpu/decoders/native.py).
//
// Algorithm matches the host numpy oracle (ppasr_tpu/decoders/beam_search.py)
// exactly; scores are log_e.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <fstream>
#include <functional>
#include <memory>
#include <mutex>
#include <sstream>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

namespace {

constexpr double kLog0 = -1e30;
constexpr double kLn10 = 2.302585092994046;

inline double LogAdd(double a, double b) {
  if (a <= kLog0 / 2) return b;
  if (b <= kLog0 / 2) return a;
  double m = std::max(a, b);
  return m + std::log(std::exp(a - m) + std::exp(b - m));
}

// ----------------------------------------------------------------- LM

// Scoring interface shared by the ARPA loader and the KenLM-binary loader.
class LmBase {
 public:
  virtual ~LmBase() = default;
  // log10 P(tok | context) with Katz backoff; tokens are ASR vocab ids.
  virtual double Score(const std::vector<int>& context, int tok) const = 0;
};

// Char-level ARPA n-gram LM with backoff. Tokens are vocab ids; the ARPA
// file's string tokens are mapped through the vocab list at load time.
class NgramLM : public LmBase {
 public:
  int order = 0;

  // key: packed ids (little sequence), value: (log10 prob, log10 backoff)
  struct Entry { float logp; float backoff; };

  bool Load(const std::string& path,
            const std::vector<std::string>& vocab) {
    std::unordered_map<std::string, int> tok2id;
    for (size_t i = 0; i < vocab.size(); ++i) tok2id[vocab[i]] = (int)i;
    std::ifstream f(path);
    if (!f.is_open()) return false;
    std::string line;
    int section = 0;
    while (std::getline(f, line)) {
      // trim \r
      while (!line.empty() && (line.back() == '\r' || line.back() == '\n'))
        line.pop_back();
      if (line.empty()) continue;
      if (line[0] == '\\') {
        if (line == "\\end\\") break;
        size_t pos = line.find("-grams:");
        if (pos != std::string::npos) {
          section = std::stoi(line.substr(1, pos - 1));
          order = std::max(order, section);
          tables_.resize(order + 1);
        }
        continue;
      }
      if (section == 0) continue;
      // logp \t tokens \t backoff?
      std::istringstream ss(line);
      std::string field;
      if (!std::getline(ss, field, '\t')) continue;
      float logp = std::strtof(field.c_str(), nullptr);
      if (!std::getline(ss, field, '\t')) continue;
      std::istringstream toks(field);
      std::string tok;
      std::vector<int> ids;
      bool ok = true;
      while (toks >> tok) {
        auto it = tok2id.find(tok);
        if (it == tok2id.end()) { ok = false; break; }  // <s>, <unk>, OOV
        ids.push_back(it->second);
      }
      if (!ok || (int)ids.size() != section) continue;
      float backoff = 0.f;
      if (std::getline(ss, field, '\t'))
        backoff = std::strtof(field.c_str(), nullptr);
      tables_[section][Pack(ids)] = Entry{logp, backoff};
    }
    return order > 0;
  }

  // log10 P(tok | context), full backoff (mirrors NgramScorer in
  // ppasr_tpu/decoders/lm.py)
  double Score(const std::vector<int>& context, int tok) const override {
    int max_ctx = std::min<int>((int)context.size(), order - 1);
    for (int n = max_ctx + 1; n >= 1; --n) {
      std::vector<int> ng(context.end() - (n - 1), context.end());
      ng.push_back(tok);
      auto it = tables_[n].find(Pack(ng));
      if (it != tables_[n].end()) {
        double logp = it->second.logp;
        // add backoffs of skipped longer contexts
        for (int m = n; m <= max_ctx; ++m) {
          std::vector<int> ctx(context.end() - m, context.end());
          auto bt = tables_[m].find(Pack(ctx));
          if (bt != tables_[m].end()) logp += bt->second.backoff;
        }
        return logp;
      }
    }
    return -6.0;  // OOV penalty
  }

 private:
  static std::string Pack(const std::vector<int>& ids) {
    return std::string(reinterpret_cast<const char*>(ids.data()),
                       ids.size() * sizeof(int));
  }
  std::vector<std::unordered_map<std::string, Entry>> tables_;
};

// KenLM probing-format binary (.klm) — the format the reference's Scorer
// auto-downloads (ppasr/decoders/beam_search_decoder.py:10-29). Layout and
// hashing mirror ppasr_tpu/decoders/klm.py (format version 5, PROBING):
// Sanity header, FixedWidthParameters, counts, probing vocab
// (murmur64a(word) -> id), unigram prob/backoff array, one open-addressing
// table per order with KenLM's chained word hash as key.
class KlmLM : public LmBase {
 public:
  int order = 0;

  bool Load(const std::string& path,
            const std::vector<std::string>& vocab) {
    std::ifstream f(path, std::ios::binary);
    if (!f.is_open()) return false;
    buf_.assign(std::istreambuf_iterator<char>(f),
                std::istreambuf_iterator<char>());
    static const char kMagic[] =
        "mmap lm http://kheafield.com/code format version 5\n";
    const size_t kMagicLen = sizeof(kMagic);  // includes trailing \0
    if (buf_.size() < 128 ||
        std::memcmp(buf_.data(), kMagic, kMagicLen) != 0)
      return false;
    size_t off = 56;  // ALIGN8(magic)
    float zero, one, half;
    std::memcpy(&zero, buf_.data() + off, 4);
    std::memcpy(&one, buf_.data() + off + 4, 4);
    std::memcpy(&half, buf_.data() + off + 8, 4);
    if (zero != 0.f || one != 1.f || half != -0.5f) return false;
    off = 88;
    order = (unsigned char)buf_[off];
    std::memcpy(&multiplier_, buf_.data() + off + 4, 4);
    int model_type;
    std::memcpy(&model_type, buf_.data() + off + 8, 4);
    if (model_type != 0) return false;  // PROBING only
    off += 20;
    counts_.resize(order);
    std::memcpy(counts_.data(), buf_.data() + off, 8 * order);
    off = (off + 8 * order + 7) & ~size_t(7);

    std::memcpy(&bound_, buf_.data() + off + 4, 4);
    off += 8;
    vocab_buckets_ = Buckets(bound_ - 1);
    vocab_off_ = off;
    off += vocab_buckets_ * 12;
    uni_off_ = off;
    off += (size_t)(bound_ + 1) * 8;
    table_off_.resize(order + 1);
    table_buckets_.resize(order + 1);
    for (int n = 2; n <= order; ++n) {
      table_off_[n] = off;
      table_buckets_[n] = Buckets(counts_[n - 1]);
      off += table_buckets_[n] * (n == order ? 12 : 16);
    }
    if (off > buf_.size()) return false;

    // sanity: unigram log10 probs must be finite and non-positive
    for (uint32_t w = 1; w < bound_; ++w) {
      float p;
      std::memcpy(&p, buf_.data() + uni_off_ + (size_t)w * 8, 4);
      if (!(p <= 1e-4f) || p < -50.f) return false;
    }

    wid_.resize(vocab.size());
    for (size_t i = 0; i < vocab.size(); ++i) {
      uint32_t w = WordId(vocab[i]);
      wid_[i] = (w == 0) ? -1 : (int)w;  // kenlm 0 = <unk> -> ASR OOV
    }
    return true;
  }

  double Score(const std::vector<int>& context, int tok) const override {
    int w = wid_[tok];
    if (w < 0) return -6.0;
    std::vector<int> ctx;
    int start = std::max<int>(0, (int)context.size() - (order - 1));
    for (size_t i = start; i < context.size(); ++i)
      if (wid_[context[i]] >= 0) ctx.push_back(wid_[context[i]]);
    int max_ctx = std::min<int>((int)ctx.size(), order - 1);
    for (int n = max_ctx + 1; n >= 1; --n) {
      std::vector<int> ng(ctx.end() - (n - 1), ctx.end());
      ng.push_back(w);
      float p, bo;
      if (Lookup(ng, &p, &bo)) {
        double logp = p;
        for (int m = n; m <= max_ctx; ++m) {
          std::vector<int> c(ctx.end() - m, ctx.end());
          if (Lookup(c, &p, &bo)) logp += bo;
        }
        return logp;
      }
    }
    return -6.0;
  }

 private:
  size_t Buckets(uint64_t entries) const {
    uint64_t b = (uint64_t)(multiplier_ * (float)entries);
    return (size_t)std::max<uint64_t>(entries + 1, b);
  }

  static uint64_t Murmur64A(const void* data, size_t len) {
    const uint64_t m = 0xC6A4A7935BD1E995ull;
    const int r = 47;
    uint64_t h = 0 ^ (len * m);
    const unsigned char* p = (const unsigned char*)data;
    const unsigned char* end = p + (len & ~size_t(7));
    for (; p != end; p += 8) {
      uint64_t k;
      std::memcpy(&k, p, 8);
      k *= m; k ^= k >> r; k *= m;
      h ^= k; h *= m;
    }
    size_t rest = len & 7;
    if (rest) {
      uint64_t k = 0;
      std::memcpy(&k, p, rest);
      h ^= k; h *= m;
    }
    h ^= h >> r; h *= m; h ^= h >> r;
    return h;
  }

  uint32_t WordId(const std::string& w) const {
    uint64_t h = Murmur64A(w.data(), w.size());
    size_t s = h % vocab_buckets_;
    for (;;) {
      uint64_t k;
      std::memcpy(&k, buf_.data() + vocab_off_ + s * 12, 8);
      if (k == h) {
        uint32_t v;
        std::memcpy(&v, buf_.data() + vocab_off_ + s * 12 + 8, 4);
        return v;
      }
      if (k == 0) return 0;
      s = (s + 1) % vocab_buckets_;
    }
  }

  // (prob, backoff) of an n-gram of kenlm word ids
  bool Lookup(const std::vector<int>& ids, float* p, float* bo) const {
    int n = (int)ids.size();
    if (n == 1) {
      if ((uint32_t)ids[0] >= bound_) return false;
      std::memcpy(p, buf_.data() + uni_off_ + (size_t)ids[0] * 8, 4);
      std::memcpy(bo, buf_.data() + uni_off_ + (size_t)ids[0] * 8 + 4, 4);
      return true;
    }
    if (n > order) return false;
    // chained hash, newest word first
    uint64_t h = (uint64_t)ids[n - 1];
    for (int i = n - 2; i >= 0; --i)
      h = h * 8978948897894561157ull + (uint64_t)ids[i];
    if (h == 0) h = 1;
    size_t stride = (n == order) ? 12 : 16;
    size_t nb = table_buckets_[n];
    size_t base = table_off_[n];
    size_t s = (size_t)(h % nb);
    for (;;) {
      uint64_t k;
      std::memcpy(&k, buf_.data() + base + s * stride, 8);
      if (k == h) {
        std::memcpy(p, buf_.data() + base + s * stride + 8, 4);
        if (n < order)
          std::memcpy(bo, buf_.data() + base + s * stride + 12, 4);
        else
          *bo = 0.f;
        return true;
      }
      if (k == 0) return false;
      s = (s + 1) % nb;
    }
  }

  std::vector<char> buf_;
  std::vector<uint64_t> counts_;
  std::vector<size_t> table_off_, table_buckets_;
  std::vector<int> wid_;
  float multiplier_ = 1.5f;
  uint32_t bound_ = 0;
  size_t vocab_off_ = 0, vocab_buckets_ = 0, uni_off_ = 0;
};

// ------------------------------------------------------- beam search core

struct BeamValue {
  double p_b = kLog0;
  double p_nb = kLog0;
  double Total() const { return LogAdd(p_b, p_nb); }
};

struct PrefixHash {
  size_t operator()(const std::vector<int>& v) const {
    size_t h = 1469598103934665603ull;
    for (int x : v) {
      h ^= (size_t)(x + 1);
      h *= 1099511628211ull;
    }
    return h;
  }
};

using Beams = std::unordered_map<std::vector<int>, BeamValue, PrefixHash>;

struct DecoderConfig {
  int vocab_size = 0;
  int blank = 0;
  int beam_size = 300;
  int cutoff_top_n = 40;
  double cutoff_prob = 0.99;
  double alpha = 2.2;
  double beta = 4.3;
  const LmBase* lm = nullptr;
};

void BeamStep(Beams& beams, const float* row, const DecoderConfig& cfg) {
  // prune candidates: smallest set reaching cutoff_prob, capped at top_n
  int v = cfg.vocab_size;
  std::vector<int> idx(v);
  for (int i = 0; i < v; ++i) idx[i] = i;
  int top_n = std::min(cfg.cutoff_top_n, v);
  std::partial_sort(idx.begin(), idx.begin() + top_n, idx.end(),
                    [&](int a, int b) { return row[a] > row[b]; });
  double cum = 0.0;
  int n_keep = 0;
  for (; n_keep < top_n; ++n_keep) {
    if (cum >= cfg.cutoff_prob) break;
    cum += row[idx[n_keep]];
  }
  n_keep = std::max(n_keep, 1);

  Beams next;
  next.reserve(beams.size() * 2);
  for (const auto& [prefix, val] : beams) {
    double p_tot = val.Total();
    for (int ci = 0; ci < n_keep; ++ci) {
      int c = idx[ci];
      double lp = std::log(std::max((double)row[c], 1e-30));
      if (c == cfg.blank) {
        auto& nb = next[prefix];
        nb.p_b = LogAdd(nb.p_b, p_tot + lp);
        continue;
      }
      int last = prefix.empty() ? -1 : prefix.back();
      double bonus = 0.0;
      if (cfg.lm != nullptr)
        bonus = cfg.alpha * cfg.lm->Score(prefix, c) * kLn10
                + cfg.beta * kLn10;
      if (c == last) {
        auto& nb = next[prefix];
        nb.p_nb = LogAdd(nb.p_nb, val.p_nb + lp);
        std::vector<int> ext(prefix);
        ext.push_back(c);
        auto& nb2 = next[ext];
        nb2.p_nb = LogAdd(nb2.p_nb, val.p_b + lp + bonus);
      } else {
        std::vector<int> ext(prefix);
        ext.push_back(c);
        auto& nb2 = next[ext];
        nb2.p_nb = LogAdd(nb2.p_nb, p_tot + lp + bonus);
      }
    }
  }

  // keep top beam_size
  if ((int)next.size() > cfg.beam_size) {
    std::vector<std::pair<double, const std::vector<int>*>> scored;
    scored.reserve(next.size());
    for (auto& [prefix, val] : next)
      scored.emplace_back(val.Total(), &prefix);
    std::nth_element(
        scored.begin(), scored.begin() + cfg.beam_size, scored.end(),
        [](const auto& a, const auto& b) { return a.first > b.first; });
    Beams pruned;
    pruned.reserve(cfg.beam_size);
    for (int i = 0; i < cfg.beam_size; ++i)
      pruned.emplace(*scored[i].second, next[*scored[i].second]);
    beams = std::move(pruned);
  } else {
    beams = std::move(next);
  }
}

void BestBeam(const Beams& beams, std::vector<int>* tokens, double* score) {
  double best = kLog0;
  const std::vector<int>* best_prefix = nullptr;
  for (const auto& [prefix, val] : beams) {
    double t = val.Total();
    if (t > best) { best = t; best_prefix = &prefix; }
  }
  if (best_prefix) *tokens = *best_prefix;
  *score = best;
}

struct Decoder {
  DecoderConfig cfg;
  std::unique_ptr<LmBase> lm_storage;
  // streaming state: one beam set per stream
  std::vector<Beams> streams;
};

}  // namespace

// ------------------------------------------------------------------ C API

extern "C" {

void* ctc_decoder_create(int vocab_size, int blank, int beam_size,
                         int cutoff_top_n, double cutoff_prob,
                         double alpha, double beta) {
  auto* d = new Decoder();
  d->cfg.vocab_size = vocab_size;
  d->cfg.blank = blank;
  d->cfg.beam_size = beam_size;
  d->cfg.cutoff_top_n = cutoff_top_n;
  d->cfg.cutoff_prob = cutoff_prob;
  d->cfg.alpha = alpha;
  d->cfg.beta = beta;
  return d;
}

// vocab passed as \n-joined utf-8 token list (for ARPA token mapping)
int ctc_decoder_load_lm(void* handle, const char* lm_path,
                        const char* vocab_joined) {
  auto* d = static_cast<Decoder*>(handle);
  std::vector<std::string> vocab;
  std::istringstream ss(vocab_joined);
  std::string tok;
  while (std::getline(ss, tok, '\n')) vocab.push_back(tok);
  std::string path(lm_path);
  // route by extension: .klm -> KenLM probing binary, else ARPA text
  if (path.size() > 4 && path.compare(path.size() - 4, 4, ".klm") == 0) {
    auto klm = std::make_unique<KlmLM>();
    if (!klm->Load(path, vocab)) return -1;
    d->lm_storage = std::move(klm);
  } else {
    auto arpa = std::make_unique<NgramLM>();
    if (!arpa->Load(path, vocab)) return -1;
    d->lm_storage = std::move(arpa);
  }
  d->cfg.lm = d->lm_storage.get();
  return 0;
}

void ctc_decoder_destroy(void* handle) {
  delete static_cast<Decoder*>(handle);
}

// Offline batch decode with a thread pool (num_processes parity,
// swig_wrapper.py:67-103).
// probs: [B, T, V] row-major; lens: [B]; out_tokens: [B, max_out];
// out_lens: [B]; out_scores: [B].
void ctc_decoder_decode_batch(void* handle, const float* probs, int bsz,
                              int t_max, int vocab, const int* lens,
                              int num_threads, int max_out,
                              int* out_tokens, int* out_lens,
                              double* out_scores) {
  auto* d = static_cast<Decoder*>(handle);
  num_threads = std::max(1, num_threads);
  std::vector<std::thread> pool;
  std::mutex next_mu;
  int next = 0;
  auto worker = [&]() {
    for (;;) {
      int b;
      {
        std::lock_guard<std::mutex> lock(next_mu);
        if (next >= bsz) return;
        b = next++;
      }
      Beams beams;
      beams[{}] = BeamValue{0.0, kLog0};
      const float* base = probs + (size_t)b * t_max * vocab;
      int t_len = lens[b];
      for (int t = 0; t < t_len; ++t)
        BeamStep(beams, base + (size_t)t * vocab, d->cfg);
      std::vector<int> tokens;
      double score;
      BestBeam(beams, &tokens, &score);
      int n = std::min<int>((int)tokens.size(), max_out);
      std::memcpy(out_tokens + (size_t)b * max_out, tokens.data(),
                  n * sizeof(int));
      out_lens[b] = n;
      out_scores[b] = score;
    }
  };
  for (int i = 0; i < num_threads; ++i) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
}

// ----------------------------- streaming (CtcBeamSearchDecoderBatch parity)

void ctc_decoder_stream_reset(void* handle, int num_streams) {
  auto* d = static_cast<Decoder*>(handle);
  d->streams.assign(num_streams, Beams{});
  for (auto& b : d->streams) b[{}] = BeamValue{0.0, kLog0};
}

// feed chunk frames for stream `idx`
void ctc_decoder_stream_next(void* handle, int idx, const float* probs,
                             int t_len, int vocab) {
  auto* d = static_cast<Decoder*>(handle);
  if (idx < 0 || idx >= (int)d->streams.size()) return;
  for (int t = 0; t < t_len; ++t)
    BeamStep(d->streams[idx], probs + (size_t)t * vocab, d->cfg);
}

// current best hypothesis for stream `idx`
void ctc_decoder_stream_decode(void* handle, int idx, int max_out,
                               int* out_tokens, int* out_len,
                               double* out_score) {
  auto* d = static_cast<Decoder*>(handle);
  if (idx < 0 || idx >= (int)d->streams.size()) {
    *out_len = 0;
    *out_score = kLog0;
    return;
  }
  std::vector<int> tokens;
  BestBeam(d->streams[idx], &tokens, out_score);
  int n = std::min<int>((int)tokens.size(), max_out);
  std::memcpy(out_tokens, tokens.data(), n * sizeof(int));
  *out_len = n;
}

}  // extern "C"
