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

// Char-level ARPA n-gram LM with backoff. Tokens are vocab ids; the ARPA
// file's string tokens are mapped through the vocab list at load time.
class NgramLM {
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
  double Score(const std::vector<int>& context, int tok) const {
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
  const NgramLM* lm = nullptr;
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
  NgramLM lm_storage;
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
int ctc_decoder_load_lm(void* handle, const char* arpa_path,
                        const char* vocab_joined) {
  auto* d = static_cast<Decoder*>(handle);
  std::vector<std::string> vocab;
  std::istringstream ss(vocab_joined);
  std::string tok;
  while (std::getline(ss, tok, '\n')) vocab.push_back(tok);
  if (!d->lm_storage.Load(arpa_path, vocab)) return -1;
  d->cfg.lm = &d->lm_storage;
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
