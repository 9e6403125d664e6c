"""Procedural speech-corpus synthesizer (zero-network accuracy harness).

The reference validates accuracy by training on AIShell and checking CER on
aishell_test (/root/reference/README.md:138, eval.py). In an air-gapped
environment no real corpus can be downloaded, so this tool provides the
closest achievable analog of that contract: a multi-speaker *generalization*
corpus where train/test sentences are DISJOINT, synthesized by a Klatt-style
cascade formant synthesizer with a Mandarin-like syllable inventory. A model
that reaches low CER on the test split has demonstrably learned
acoustic→text mapping through the full pipeline (fbank → CMVN →
dynamic-chunk encoder → CTC/attention → beam search), not memorized audio.

Design notes:
- Each character maps to an (initial, final, tone) syllable via a stable
  md5 hash: 22 initials x 36 finals x 4 tones = 3168 combinations for the
  text vocabulary, so some characters collide (homophones) exactly as in
  real Mandarin — those confusions are irreducible without a language
  model, which makes LM fusion measurably useful on this corpus.
- Speakers are sampled per utterance: base pitch, formant scaling,
  speaking rate, breathiness, spectral tilt — test speakers are therefore
  unseen by construction.
- Channel: additive white+pink noise at random SNR and a small synthetic
  room reverb.
- Sentences come from a char-bigram model seeded by any UTF-8 text given
  via --text_source (default: the reference's Chinese docs). Generated
  sentences are novel strings; train/test are deduplicated and disjoint,
  and every test character is guaranteed to appear in train.

Outputs the reference corpus layout (tab-separated annotation files +
16 kHz wavs + noise wavs) consumed by create_data.py
(/root/reference/ppasr/trainer.py:428 parity).
"""
import argparse
import functools
import hashlib
import math
import os
import re
import sys

import numpy as np
from scipy.signal import lfilter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ppasr_tpu.utils.common import add_arguments, print_arguments

SR = 16000

# ---------------------------------------------------------------------------
# Phoneme inventory
# ---------------------------------------------------------------------------

# Finals: keyframes of (time_fraction, F1, F2, F3) plus optional nasal coda.
# Values are classic adult-male vowel formant targets; per-speaker scaling
# moves them around.
FINALS = {
    'a':    ([(0.0, 850, 1220, 2810)], None),
    'o':    ([(0.0, 500, 850, 2700)], None),
    'e':    ([(0.0, 560, 1320, 2500)], None),
    'i':    ([(0.0, 290, 2270, 3010)], None),
    'u':    ([(0.0, 330, 700, 2530)], None),
    'v':    ([(0.0, 290, 1900, 2550)], None),   # ü
    'er':   ([(0.0, 560, 1350, 1690)], None),
    'ai':   ([(0.0, 850, 1220, 2810), (1.0, 360, 2160, 2900)], None),
    'ei':   ([(0.0, 560, 1750, 2500), (1.0, 330, 2200, 2900)], None),
    'ao':   ([(0.0, 820, 1150, 2700), (1.0, 400, 750, 2550)], None),
    'ou':   ([(0.0, 540, 1000, 2600), (1.0, 350, 720, 2530)], None),
    'an':   ([(0.0, 800, 1300, 2750)], 'n'),
    'en':   ([(0.0, 530, 1350, 2500)], 'n'),
    'in':   ([(0.0, 300, 2200, 2960)], 'n'),
    'un':   ([(0.0, 360, 900, 2500)], 'n'),
    'vn':   ([(0.0, 300, 1850, 2550)], 'n'),
    'ang':  ([(0.0, 820, 1200, 2700)], 'ng'),
    'eng':  ([(0.0, 550, 1300, 2500)], 'ng'),
    'ing':  ([(0.0, 300, 2240, 2980)], 'ng'),
    'ong':  ([(0.0, 450, 800, 2550)], 'ng'),
    'ia':   ([(0.0, 300, 2250, 3000), (0.35, 850, 1220, 2810)], None),
    'ie':   ([(0.0, 300, 2250, 3000), (0.4, 560, 1900, 2600)], None),
    'iao':  ([(0.0, 300, 2250, 3000), (0.4, 820, 1150, 2700),
              (1.0, 400, 750, 2550)], None),
    'iu':   ([(0.0, 300, 2250, 3000), (0.6, 350, 800, 2530)], None),
    'ian':  ([(0.0, 300, 2250, 3000), (0.4, 700, 1600, 2700)], 'n'),
    'iang': ([(0.0, 300, 2250, 3000), (0.4, 820, 1200, 2700)], 'ng'),
    'iong': ([(0.0, 300, 2250, 3000), (0.45, 450, 800, 2550)], 'ng'),
    'ua':   ([(0.0, 340, 720, 2530), (0.4, 850, 1220, 2810)], None),
    'uo':   ([(0.0, 340, 720, 2530), (0.45, 520, 880, 2650)], None),
    'uai':  ([(0.0, 340, 720, 2530), (0.4, 850, 1220, 2810),
              (1.0, 380, 2100, 2900)], None),
    'ui':   ([(0.0, 340, 720, 2530), (0.55, 330, 2150, 2900)], None),
    'uan':  ([(0.0, 340, 720, 2530), (0.4, 780, 1350, 2750)], 'n'),
    'uang': ([(0.0, 340, 720, 2530), (0.4, 820, 1200, 2700)], 'ng'),
    'ueng': ([(0.0, 340, 720, 2530), (0.45, 550, 1300, 2500)], 'ng'),
    've':   ([(0.0, 290, 1900, 2550), (0.45, 560, 1850, 2600)], None),
    'van':  ([(0.0, 290, 1900, 2550), (0.45, 700, 1650, 2700)], 'n'),
}
FINAL_NAMES = sorted(FINALS)

# Initials: (kind, locus_F2, aspirated/param). locus_F2 steers the vowel's
# F2 onset (coarticulation); kind picks the source/shape recipe.
INITIALS = {
    '':   ('null', None, 0),
    'b':  ('stop', 900, 0), 'p': ('stop', 900, 1),
    'd':  ('stop', 1700, 0), 't': ('stop', 1700, 1),
    'g':  ('stop', 2300, 0), 'k': ('stop', 2300, 1),
    'z':  ('affr', 6200, 0), 'c': ('affr', 6200, 1),
    'zh': ('affr', 3200, 0), 'ch': ('affr', 3200, 1),
    'j':  ('affr', 4600, 0), 'q': ('affr', 4600, 1),
    'f':  ('fric', 4200, 0), 's': ('fric', 6800, 0),
    'sh': ('fric', 3300, 0), 'x': ('fric', 4800, 0),
    'h':  ('fric', 1700, 0), 'r': ('vfric', 2800, 0),
    'm':  ('nasal', 900, 0), 'n': ('nasal', 1700, 0),
    'l':  ('liquid', 1700, 0),
}
INITIAL_NAMES = sorted(INITIALS)

# Mandarin tone contours as (time_fraction, relative_f0) keyframes.
TONES = [
    [(0.0, 1.17), (1.0, 1.17)],                 # T1 high level
    [(0.0, 0.85), (1.0, 1.22)],                 # T2 rising
    [(0.0, 0.82), (0.5, 0.65), (1.0, 0.98)],    # T3 dipping
    [(0.0, 1.28), (1.0, 0.78)],                 # T4 falling
]


def char_syllable(ch: str):
    """Stable char → (initial, final, tone) via md5 (not hash(): seeded)."""
    h = int.from_bytes(hashlib.md5(ch.encode('utf-8')).digest()[:8], 'little')
    ini = INITIAL_NAMES[h % len(INITIAL_NAMES)]
    h //= len(INITIAL_NAMES)
    fin = FINAL_NAMES[h % len(FINAL_NAMES)]
    h //= len(FINAL_NAMES)
    tone = h % 4
    return ini, fin, tone


# ---------------------------------------------------------------------------
# Low-level DSP
# ---------------------------------------------------------------------------

def _resonator(x, f, bw, sr=SR):
    """Klatt second-order resonator, unity gain at DC."""
    r = math.exp(-math.pi * bw / sr)
    c = -r * r
    b = 2.0 * r * math.cos(2.0 * math.pi * f / sr)
    a = 1.0 - b - c
    return lfilter([a], [1.0, -b, -c], x)


def _glottal_source(f0, rng, breathiness=0.05):
    """Pulse train following the per-sample f0 contour, + aspiration noise.

    Two one-pole lowpasses shape the impulse train into a glottal-ish pulse
    with a natural spectral rolloff; jitter/shimmer decorrelate cycles.
    """
    n = len(f0)
    phase = np.cumsum(f0 / SR)
    # jitter: perturb the phase with a slow random walk (~0.6% of a cycle)
    jit = np.cumsum(rng.standard_normal(n)) * 0.0008
    pulses = np.zeros(n)
    marks = np.flatnonzero(np.diff(np.floor(phase + jit)) > 0)
    if len(marks):
        amp = 1.0 + 0.06 * rng.standard_normal(len(marks))   # shimmer
        pulses[marks] = amp * np.sqrt(np.maximum(f0[marks], 1.0) / 120.0)
    src = lfilter([1.0], [1.0, -0.94], pulses)
    src = lfilter([1.0], [1.0, -0.82], src)
    noise = rng.standard_normal(n) * breathiness * (np.abs(src).mean() + 1e-9)
    return src + noise


def _interp_track(keyframes, n, col):
    ts = np.array([k[0] for k in keyframes])
    vs = np.array([k[col] for k in keyframes])
    return np.interp(np.linspace(0.0, 1.0, n), ts, vs)


def _formant_filter(src, tracks, bws, n_seg=8):
    """Cascade formant filtering with piecewise-constant tracks.

    Splitting into short segments approximates time-varying resonators
    while keeping everything in vectorized lfilter calls.
    """
    n = len(src)
    out = np.zeros(n)
    edges = np.linspace(0, n, n_seg + 1).astype(int)
    # carry filter state across segments per formant
    from scipy.signal import lfilter_zi
    states = [None] * len(tracks)
    for s0, s1 in zip(edges[:-1], edges[1:]):
        if s1 <= s0:
            continue
        seg = src[s0:s1]
        mid = (s0 + s1) // 2
        for i, (track, bw) in enumerate(zip(tracks, bws)):
            f = float(track[mid])
            r = math.exp(-math.pi * bw / SR)
            c = -r * r
            b = 2.0 * r * math.cos(2.0 * math.pi * max(f, 60.0) / SR)
            a = 1.0 - b - c
            if states[i] is None:
                states[i] = lfilter_zi([a], [1.0, -b, -c]) * seg[0]
            seg, states[i] = lfilter([a], [1.0, -b, -c], seg, zi=states[i])
        out[s0:s1] = seg
    return out


def _fric_noise(n, center, bw, rng):
    x = rng.standard_normal(n)
    y = _resonator(x, center, bw)
    return y / (np.abs(y).std() + 1e-9)


def _env(n, attack, release):
    e = np.ones(n)
    a = min(attack, n)
    r = min(release, n)
    if a > 0:
        e[:a] = np.linspace(0.0, 1.0, a)
    if r > 0:
        e[n - r:] = np.linspace(1.0, 0.0, r)
    return e


# ---------------------------------------------------------------------------
# Syllable + utterance synthesis
# ---------------------------------------------------------------------------

class Speaker:
    def __init__(self, rng):
        self.f0 = float(np.exp(rng.uniform(np.log(85.0), np.log(255.0))))
        # higher voices tend to have shorter vocal tracts
        self.fscale = float(rng.uniform(0.88, 1.02)
                            + 0.12 * (self.f0 - 85.0) / 170.0)
        self.rate = float(rng.uniform(0.82, 1.22))
        self.breath = float(rng.uniform(0.02, 0.12))
        self.bw_scale = float(rng.uniform(0.85, 1.25))


def synth_syllable(ini_name, fin_name, tone, spk, rng, sentence_final=False):
    kind, locus, aspirated = INITIALS[ini_name]
    keyframes, coda = FINALS[fin_name]
    fs = spk.fscale

    vdur = rng.uniform(0.13, 0.22) / spk.rate
    if sentence_final:
        vdur *= rng.uniform(1.15, 1.45)
    nv = int(vdur * SR)

    # --- vowel part: f0 contour from the tone, formant tracks ---
    t_f0 = _interp_track(TONES[tone], nv, 1)
    f0 = spk.f0 * t_f0 * (1.0 + 0.01 * np.sin(
        2 * np.pi * 5.5 * np.arange(nv) / SR + rng.uniform(0, 6.28)))
    src = _glottal_source(f0, rng, spk.breath)

    f1 = _interp_track(keyframes, nv, 1) * fs
    f2 = _interp_track(keyframes, nv, 2) * fs
    f3 = _interp_track(keyframes, nv, 3) * fs
    # coarticulation: glide F2 from the initial's locus over ~35 ms
    if locus is not None:
        glide = min(int(0.035 * SR), nv)
        w = np.linspace(1.0, 0.0, glide)
        f2[:glide] = w * locus * fs + (1 - w) * f2[:glide]
    f4 = np.full(nv, 3400.0 * fs)
    bws = [b * spk.bw_scale for b in (80.0, 110.0, 160.0, 220.0)]
    vowel = _formant_filter(src, [f1, f2, f3, f4], bws)
    vowel *= _env(nv, int(0.012 * SR), int(0.03 * SR))

    # --- nasal coda ---
    if coda is not None:
        nc = int(rng.uniform(0.05, 0.09) * SR / spk.rate)
        f0c = np.full(nc, float(f0[-1]))
        csrc = _glottal_source(f0c, rng, spk.breath)
        cf2 = 1000.0 if coda == 'n' else 2300.0
        cod = _formant_filter(
            csrc, [np.full(nc, 280.0 * fs), np.full(nc, cf2 * fs),
                   np.full(nc, 2300.0 * fs), np.full(nc, 3300.0 * fs)],
            [60.0, 120.0, 200.0, 260.0])
        cod *= _env(nc, int(0.008 * SR), int(0.025 * SR)) * 0.55
        vowel = np.concatenate([vowel, cod])

    vowel /= (np.abs(vowel).max() + 1e-9)

    # --- initial consonant ---
    parts = []
    if kind == 'null':
        pass
    elif kind == 'stop':
        closure = np.zeros(int(rng.uniform(0.03, 0.06) * SR / spk.rate))
        nb = int(0.012 * SR)
        burst = _fric_noise(nb, locus * fs, 1200.0, rng) * _env(nb, 2, nb // 2)
        parts = [closure, 0.5 * burst]
        if aspirated:
            na = int(rng.uniform(0.04, 0.08) * SR / spk.rate)
            asp = _fric_noise(na, 1600.0 * fs, 1800.0, rng)
            parts.append(0.25 * asp * _env(na, na // 4, na // 2))
    elif kind in ('fric', 'affr'):
        if kind == 'affr':
            parts.append(np.zeros(int(rng.uniform(0.02, 0.045) * SR / spk.rate)))
        nf = int(rng.uniform(0.07, 0.12) * SR / spk.rate)
        fr = _fric_noise(nf, locus * fs, 900.0, rng)
        parts.append(0.35 * fr * _env(nf, nf // 4, nf // 3))
    elif kind == 'vfric':
        nf = int(rng.uniform(0.06, 0.1) * SR / spk.rate)
        f0r = np.full(nf, spk.f0)
        voiced = _glottal_source(f0r, rng, spk.breath)
        mix = _formant_filter(voiced, [np.full(nf, 350.0 * fs),
                                       np.full(nf, locus * fs),
                                       np.full(nf, 2700.0 * fs),
                                       np.full(nf, 3400.0 * fs)],
                              [90.0, 140.0, 200.0, 260.0])
        mix = mix / (np.abs(mix).max() + 1e-9)
        parts.append(0.5 * mix * _env(nf, nf // 4, nf // 4)
                     + 0.12 * _fric_noise(nf, locus * fs, 1100.0, rng))
    elif kind in ('nasal', 'liquid'):
        nn = int(rng.uniform(0.05, 0.09) * SR / spk.rate)
        f0n = np.full(nn, spk.f0 * (1.0 if kind == 'liquid' else 0.95))
        nsrc = _glottal_source(f0n, rng, spk.breath)
        nf1 = 280.0 if kind == 'nasal' else 360.0
        nas = _formant_filter(nsrc, [np.full(nn, nf1 * fs),
                                     np.full(nn, locus * fs),
                                     np.full(nn, 2400.0 * fs),
                                     np.full(nn, 3300.0 * fs)],
                              [70.0, 150.0, 220.0, 280.0])
        nas = nas / (np.abs(nas).max() + 1e-9)
        parts.append(0.55 * nas * _env(nn, int(0.01 * SR), int(0.012 * SR)))

    return np.concatenate(parts + [vowel]) if parts else vowel


def synth_utterance(text, rng, snr_db=None, reverb=None):
    """Render a sentence with a fresh random speaker; returns float32 @16k."""
    spk = Speaker(rng)
    chunks = []
    for i, ch in enumerate(text):
        ini, fin, tone = char_syllable(ch)
        syl = synth_syllable(ini, fin, tone, spk, rng,
                             sentence_final=(i == len(text) - 1))
        chunks.append(syl)
        gap = rng.uniform(0.0, 0.035) / spk.rate
        if rng.random() < 0.08:       # occasional prosodic pause
            gap += rng.uniform(0.05, 0.15)
        chunks.append(np.zeros(int(gap * SR)))
    lead = np.zeros(int(rng.uniform(0.05, 0.25) * SR))
    tail = np.zeros(int(rng.uniform(0.05, 0.25) * SR))
    y = np.concatenate([lead] + chunks + [tail])
    y = y / (np.abs(y).max() + 1e-9)

    # channel: small-room reverb + additive noise
    if reverb is None:
        reverb = rng.random() < 0.6
    if reverb:
        ir_len = int(rng.uniform(0.03, 0.12) * SR)
        ir = rng.standard_normal(ir_len) * np.exp(
            -np.arange(ir_len) / (ir_len / 5.0))
        ir[0] = 1.0 / (rng.uniform(0.15, 0.4))
        ir /= np.abs(ir).sum() * 0.15
        y = np.convolve(y, ir)[:len(y)]
        y = y / (np.abs(y).max() + 1e-9)
    if snr_db is None:
        snr_db = rng.uniform(14.0, 38.0)
    noise = rng.standard_normal(len(y))
    noise = 0.6 * noise + 0.4 * lfilter([1.0], [1.0, -0.97], noise) * 0.05
    sig_rms = np.sqrt((y ** 2).mean() + 1e-12)
    noise_rms = np.sqrt((noise ** 2).mean() + 1e-12)
    y = y + noise * (sig_rms / noise_rms) * (10.0 ** (-snr_db / 20.0))
    peak = rng.uniform(0.25, 0.9)
    return (y / (np.abs(y).max() + 1e-9) * peak).astype(np.float32)


def write_wav(path, samples):
    import wave
    pcm = (np.clip(samples, -1.0, 1.0) * 32767.0).astype('<i2')
    with wave.open(path, 'wb') as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(SR)
        w.writeframes(pcm.tobytes())


# ---------------------------------------------------------------------------
# Sentence generation (char bigram model over runtime-provided seed text)
# ---------------------------------------------------------------------------

def load_seed_text(paths):
    text = ''
    for p in paths:
        if os.path.isdir(p):
            for root, _, files in os.walk(p):
                for fn in files:
                    if fn.endswith(('.md', '.txt')):
                        try:
                            text += open(os.path.join(root, fn),
                                         encoding='utf-8').read()
                        except OSError:
                            pass
        elif os.path.isfile(p):
            text += open(p, encoding='utf-8').read()
    runs = re.findall(r'[一-鿿]+', text)
    return runs


def build_bigram(runs, min_count=3):
    from collections import Counter, defaultdict
    counts = Counter(''.join(runs))
    vocab = sorted(c for c, n in counts.items() if n >= min_count)
    vset = set(vocab)
    starts = Counter()
    trans = defaultdict(Counter)
    for run in runs:
        run = [c for c in run if c in vset]
        if not run:
            continue
        starts[run[0]] += 1
        for a, b in zip(run[:-1], run[1:]):
            trans[a][b] += 1
    return vocab, starts, trans


def gen_sentences(vocab, starts, trans, n, rng, min_len=4, max_len=16,
                  exclude=frozenset()):
    vlist = list(vocab)
    start_chars = list(starts)
    start_p = np.array([starts[c] for c in start_chars], dtype=np.float64)
    start_p /= start_p.sum()
    out = []
    seen = set(exclude)
    attempts = 0
    while len(out) < n and attempts < n * 60:
        attempts += 1
        length = int(rng.integers(min_len, max_len + 1))
        ch = start_chars[int(rng.choice(len(start_chars), p=start_p))]
        sent = [ch]
        while len(sent) < length:
            nxt = trans.get(sent[-1])
            if nxt and rng.random() > 0.12:
                cands = list(nxt)
                p = np.array([nxt[c] for c in cands], dtype=np.float64)
                p /= p.sum()
                ch = cands[int(rng.choice(len(cands), p=p))]
            else:   # smoothing: occasional uniform jump keeps variety up
                ch = vlist[int(rng.integers(len(vlist)))]
            sent.append(ch)
        s = ''.join(sent)
        if s in seen:
            continue
        seen.add(s)
        out.append(s)
    return out


# ---------------------------------------------------------------------------
# Corpus assembly
# ---------------------------------------------------------------------------

def _render_one(task):
    idx, text, seed, out_dir = task
    rng = np.random.default_rng(seed)
    y = synth_utterance(text, rng)
    sub = os.path.join(out_dir, f'{idx // 1000:03d}')
    os.makedirs(sub, exist_ok=True)
    path = os.path.join(sub, f'syn{idx:06d}.wav')
    write_wav(path, y)
    return os.path.abspath(path), text, len(y) / SR


def make_noise_files(out_dir, rng, n_files=12, dur=10.0):
    os.makedirs(out_dir, exist_ok=True)
    n = int(dur * SR)
    paths = []
    for i in range(n_files):
        kind = i % 4
        if kind == 0:
            y = rng.standard_normal(n)
        elif kind == 1:   # pink-ish
            y = lfilter([1.0], [1.0, -0.985], rng.standard_normal(n))
        elif kind == 2:   # mains hum + harmonics
            t = np.arange(n) / SR
            y = sum(a * np.sin(2 * np.pi * f * t + rng.uniform(0, 6))
                    for f, a in [(50, 1.0), (100, 0.5), (150, 0.3)])
            y += 0.2 * rng.standard_normal(n)
        else:             # babble: overlap several synth voices, low level
            y = np.zeros(n)
            for _ in range(6):
                txt = ''.join(chr(0x4e00 + int(rng.integers(0, 500)))
                              for _ in range(12))
                u = synth_utterance(txt, rng, snr_db=60.0, reverb=False)
                o = int(rng.integers(0, max(1, n - len(u)))) if len(u) < n else 0
                y[o:o + min(len(u), n - o)] += u[:n - o]
        y = y / (np.abs(y).max() + 1e-9) * 0.5
        p = os.path.join(out_dir, f'noise{i:02d}.wav')
        write_wav(p, y.astype(np.float32))
        paths.append(p)
    return paths


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    add_arg = functools.partial(add_arguments, argparser=parser)
    add_arg('text_source', str,
            '/root/reference/README.md,/root/reference/docs',
            'comma-separated UTF-8 files/dirs that seed the sentence bigram')
    add_arg('output_dir', str, 'dataset', 'corpus root (wavs + annotation)')
    add_arg('n_train', int, 8000, 'training utterances')
    add_arg('n_test', int, 500, 'test utterances (disjoint sentences)')
    add_arg('seed', int, 17, 'global RNG seed')
    add_arg('workers', int, 2, 'render processes')
    add_arg('make_noise', bool, True, 'also synthesize noise wavs')
    args = parser.parse_args()
    print_arguments(args=args)

    rng = np.random.default_rng(args.seed)
    runs = load_seed_text(args.text_source.split(','))
    vocab, starts, trans = build_bigram(runs)
    print(f'seed text: {sum(len(r) for r in runs)} chars, '
          f'{len(vocab)} vocab (min_count=3)')

    total = args.n_train + args.n_test
    sents = gen_sentences(vocab, starts, trans, total, rng)
    if len(sents) < total:
        raise RuntimeError(f'only generated {len(sents)}/{total} sentences')
    train_sents, test_sents = sents[:args.n_train], sents[args.n_train:]
    # every test char must be learnable: restrict test chars to train charset
    train_chars = set(''.join(train_sents))
    test_sents = [''.join(c for c in s if c in train_chars)
                  for s in test_sents]
    test_sents = [s for s in test_sents if len(s) >= 3]

    audio_dir = os.path.join(args.output_dir, 'audio', 'synth')
    ann_dir = os.path.join(args.output_dir, 'annotation')
    os.makedirs(audio_dir, exist_ok=True)
    os.makedirs(ann_dir, exist_ok=True)

    tasks = [(i, s, args.seed * 1000003 + i, audio_dir)
             for i, s in enumerate(train_sents + test_sents)]
    from multiprocessing import Pool
    results = []
    with Pool(args.workers) as pool:
        for k, r in enumerate(pool.imap(_render_one, tasks, chunksize=32)):
            results.append(r)
            if (k + 1) % 1000 == 0:
                done_s = sum(x[2] for x in results)
                print(f'  rendered {k + 1}/{len(tasks)} '
                      f'({done_s / 3600.0:.2f} h)', flush=True)

    n_tr = len(train_sents)
    with open(os.path.join(ann_dir, 'train.txt'), 'w',
              encoding='utf-8') as f:
        for path, text, _ in results[:n_tr]:
            f.write(f'{path}\t{text}\n')
    with open(os.path.join(ann_dir, 'test.txt'), 'w',
              encoding='utf-8') as f:
        for path, text, _ in results[n_tr:]:
            f.write(f'{path}\t{text}\n')

    if args.make_noise:
        make_noise_files(os.path.join(args.output_dir, 'audio', 'noise'),
                         rng)

    hours = sum(r[2] for r in results) / 3600.0
    print(f'corpus: {n_tr} train + {len(results) - n_tr} test utterances, '
          f'{hours:.2f} h audio, vocab {len(train_chars)} chars')


if __name__ == '__main__':
    main()
