"""Build the golden kaldi-fbank fixture (tests/fixtures/fbank_golden.npz).

This is an INDEPENDENT float64 implementation of Kaldi's fbank/MFCC
computation, written deliberately differently from the production code in
ppasr_tpu/ops/fbank.py (per-frame Python loop, explicit mel-triangle loop,
float64 end to end) so that a coding slip in either side shows up as a
mismatch. The algorithm follows the published Kaldi definition
(kaldi src/feat/feature-window.{h,cc}, mel-computations.cc,
feature-fbank.cc, feature-mfcc.cc), which is also what the reference's
paddleaudio kaldi-compliance frontend implements
(/root/reference/ppasr/data_utils/featurizer/audio_featurizer.py:120-138).

Run once to (re)generate the fixture:
    PYTHONPATH=/root/repo python tests/make_fbank_golden.py
"""
import hashlib
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURE_WAV = "/root/reference/dataset/test.wav"
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "fixtures", "fbank_golden.npz")


def golden_fbank(wave, samp_freq=16000.0, frame_length_ms=25.0,
                 frame_shift_ms=10.0, num_bins=80, low_freq=20.0,
                 high_freq=0.0, preemph=0.97, remove_dc=True,
                 return_mfcc_ceps=0, cepstral_lifter=22.0):
    """Kaldi FbankComputer in float64, one frame at a time."""
    wave = np.asarray(wave, np.float64)
    window_size = int(samp_freq * 0.001 * frame_length_ms)   # 400
    window_shift = int(samp_freq * 0.001 * frame_shift_ms)   # 160
    padded = 1
    while padded < window_size:
        padded *= 2                                           # 512

    # feature-window.cc: povey window = hann^0.85
    window = np.empty(window_size, np.float64)
    for i in range(window_size):
        window[i] = math.pow(
            0.5 - 0.5 * math.cos(2.0 * math.pi * i / (window_size - 1)),
            0.85)

    # mel-computations.cc: triangle weights per bin over fft bins
    nyquist = 0.5 * samp_freq
    if high_freq <= 0.0:
        high_freq = nyquist + high_freq
    num_fft_bins = padded // 2

    def mel(f):
        return 1127.0 * math.log(1.0 + f / 700.0)

    mel_low, mel_high = mel(low_freq), mel(high_freq)
    mel_delta = (mel_high - mel_low) / (num_bins + 1)
    fft_bin_width = samp_freq / padded
    banks = np.zeros((num_bins, num_fft_bins + 1), np.float64)
    for b in range(num_bins):
        left, center, right = (mel_low + b * mel_delta,
                               mel_low + (b + 1) * mel_delta,
                               mel_low + (b + 2) * mel_delta)
        for k in range(num_fft_bins):
            m = mel(fft_bin_width * k)
            if left < m < right:
                if m <= center:
                    banks[b, k] = (m - left) / (center - left)
                else:
                    banks[b, k] = (right - m) / (right - center)

    if len(wave) < window_size:
        num_frames = 0
    else:
        num_frames = 1 + (len(wave) - window_size) // window_shift
    feats = np.zeros((num_frames, num_bins), np.float64)
    eps = float(np.finfo(np.float32).eps)
    for t in range(num_frames):
        frame = wave[t * window_shift: t * window_shift + window_size].copy()
        if remove_dc:
            frame -= frame.mean()
        if preemph != 0.0:
            # kaldi iterates from the end: wave(i) -= p*wave(i-1), wave(0) -= p*wave(0)
            for i in range(window_size - 1, 0, -1):
                frame[i] -= preemph * frame[i - 1]
            frame[0] -= preemph * frame[0]
        frame *= window
        spec = np.fft.rfft(frame, n=padded)
        power = spec.real ** 2 + spec.imag ** 2
        melvec = banks @ power
        feats[t] = np.log(np.maximum(melvec, eps))

    if return_mfcc_ceps:
        n = np.arange(num_bins)[:, None]
        k = np.arange(return_mfcc_ceps)[None, :]
        dct = np.cos(np.pi * k * (2 * n + 1) / (2.0 * num_bins)) * math.sqrt(
            2.0 / num_bins)
        dct[:, 0] = 1.0 / math.sqrt(num_bins)
        ceps = feats @ dct
        if cepstral_lifter != 0.0:
            i = np.arange(return_mfcc_ceps)
            ceps *= 1.0 + 0.5 * cepstral_lifter * np.sin(
                np.pi * i / cepstral_lifter)
        return feats, ceps
    return feats


def main():
    from ppasr_tpu.data.audio import AudioSegment
    seg = AudioSegment.from_file(FIXTURE_WAV)
    seg.normalize(target_db=-20)
    samples = seg.to('int16').astype(np.float64)
    sha = hashlib.sha256(samples.astype('<f8').tobytes()).hexdigest()

    fbank, mfcc = golden_fbank(samples, return_mfcc_ceps=40)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(
        OUT,
        fbank=fbank.astype(np.float32),
        mfcc=mfcc.astype(np.float32),
        input_sha256=np.frombuffer(bytes.fromhex(sha), np.uint8),
        num_mel_bins=np.int32(80), num_ceps=np.int32(40))
    print(f"wrote {OUT}: fbank {fbank.shape}, mfcc {mfcc.shape}, "
          f"input sha256={sha[:16]}…")


if __name__ == "__main__":
    main()
