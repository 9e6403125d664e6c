"""Inference runtime: offline, long-audio (VAD-segmented), and streaming.

Capability parity with reference ppasr/predict.py (PPASRPredictor):
- predict (:163-187): featurize → model → decode (+ optional punctuation).
- predict_long (:190-229): VAD segmentation → per-segment predict → join.
- predict_stream (:232-337): accumulate PCM, featurize only new audio,
  chunk math decoding_chunk_size=16 / context=7 / subsampling=4 ⇒ window 67
  stride 64, per-window chunk step, streaming greedy/beam decode,
  reset_stream (:340-347).

TPU-native difference (the key inefficiency SURVEY.md §3.5 flags in the
reference): att/cnn caches never leave the device — the StreamingState pytree
stays in HBM between predict_stream() calls, and the chunk step is one jitted
program reused across all chunks and streams. Offline inputs are padded to
1-second buckets so jit compiles a handful of shapes, not one per utterance.
"""
import json
import math
import os

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from ppasr_tpu.data.audio import AudioSegment
from ppasr_tpu.data.featurizer.audio_featurizer import AudioFeaturizer
from ppasr_tpu.data.featurizer.text_featurizer import TextFeaturizer
from ppasr_tpu.decoders.greedy import GreedyStreamingDecoder, greedy_decoder
from ppasr_tpu.models.factory import build_model
from ppasr_tpu.utils.logger import setup_logger
from ppasr_tpu.config import load_config

logger = setup_logger(__name__)


class PPASRPredictor:
    # model-tag → artifact-zip URL registry (reference predict.py:42-58
    # auto-downloads by model_tag from its model zoo; register your own
    # exported-artifact zips here or pass full URLs)
    MODEL_ZOO = {}

    def __init__(self, configs=None, model_path: str = None,
                 model_tag: str = None,
                 use_gpu: bool = True, decoder: str = None,
                 decoder_configs: dict = None,
                 use_pun: bool = False, pun_model_dir: str = None,
                 vocab_path: str = None, mean_istd_path: str = None,
                 decoding_chunk_size: int = 16,
                 num_decoding_left_chunks: int = -1,
                 time_bucket_frames: int = 100,
                 compute_dtype: str = 'float32',
                 use_device_frontend: bool = False):
        """``model_path``: exported dir containing model.msgpack +
        inference.json (see PPASRTrainer.export).
        ``compute_dtype='bfloat16'`` runs activations in bf16 (~30% faster
        on TPU; CTC posteriors are still computed in f32)."""
        self.configs = load_config(configs) if configs is not None else None
        if model_path is None and model_tag is not None:
            url = self.MODEL_ZOO.get(model_tag, model_tag)
            from ppasr_tpu.utils.common import download_model
            model_path = download_model(url,
                                        os.path.join('models', model_tag))
        with open(os.path.join(model_path, 'inference.json'), 'r',
                  encoding='utf-8') as f:
            infer_conf = json.load(f)
        self.use_model = infer_conf['use_model']
        self._model_conf = dict(infer_conf.get('model_conf') or {})
        self.streaming = infer_conf['streaming']
        self.input_dim = infer_conf['input_dim']
        self.vocab_size = infer_conf['vocab_size']
        self.time_bucket_frames = time_bucket_frames
        self._pun_model_dir = pun_model_dir
        self.use_device_frontend = use_device_frontend

        # prefer artifact-bundled CMVN/vocab (export copies them in)
        bundled_istd = os.path.join(model_path, 'mean_istd.json')
        bundled_vocab = os.path.join(model_path, 'vocabulary.txt')
        if mean_istd_path is None and os.path.exists(bundled_istd):
            mean_istd_path = bundled_istd
        if vocab_path is None and os.path.exists(bundled_vocab):
            vocab_path = bundled_vocab
        if self.configs is not None:
            preprocess_conf = dict(self.configs.preprocess_conf)
            dataset_conf = self.configs.dataset_conf
            vocab_path = vocab_path or dataset_conf.dataset_vocab
            mean_istd_path = mean_istd_path or dataset_conf.mean_istd_path
            self.decoder_name = decoder or self.configs.get('decoder',
                                                            'ctc_greedy')
            self.decoder_configs = decoder_configs or dict(
                self.configs.get('ctc_beam_search_decoder_conf', {}) or {})
        else:
            preprocess_conf = {'feature_method': 'fbank',
                               'n_mels': self.input_dim}
            self.decoder_name = decoder or 'ctc_greedy'
            self.decoder_configs = decoder_configs or {}

        self.audio_featurizer = AudioFeaturizer(**preprocess_conf,
                                                train=False)
        # streaming featurizer: gain applied from a RUNNING RMS estimate
        # instead of re-normalizing each partial buffer (which shifts the
        # gain between chunks and corrupts features at chunk boundaries)
        stream_conf = dict(preprocess_conf)
        self._stream_target_db = stream_conf.pop('target_dB', -20) \
            if stream_conf.get('use_dB_normalization', True) else None
        stream_conf['use_dB_normalization'] = False
        self.stream_featurizer = AudioFeaturizer(**stream_conf, train=False)
        self.text_featurizer = TextFeaturizer(vocab_path)
        self.vocab_list = self.text_featurizer.vocab_list

        self.model = build_model(
            self.use_model, self.input_dim, self.vocab_size,
            streaming=self.streaming,
            encoder_conf=infer_conf.get('encoder_conf'),
            decoder_conf=infer_conf.get('decoder_conf'),
            model_conf=infer_conf.get('model_conf'),
            mean_istd_path=mean_istd_path,
            dtype=jnp.bfloat16 if compute_dtype == 'bfloat16'
            else jnp.float32)
        params_shape = self._init_params_shape()
        full_path = os.path.join(model_path, 'model.msgpack')
        quant_path = os.path.join(model_path, 'model_quant.msgpack')
        if os.path.exists(full_path):
            with open(full_path, 'rb') as f:
                self.params = serialization.from_bytes(params_shape,
                                                       f.read())
        elif os.path.exists(quant_path):
            # int8 weight-quantized artifact → dequantize at load
            from ppasr_tpu.utils.quant import dequantize_params
            import numpy as _np
            with open(quant_path, 'rb') as f:
                blob = serialization.msgpack_restore(f.read())
            zeros = jax.tree.map(lambda s: _np.zeros(s.shape, s.dtype),
                                 params_shape)
            self.params = dequantize_params(blob, zeros)
        else:
            raise FileNotFoundError(
                f"no model.msgpack / model_quant.msgpack in {model_path}")

        # chunk math (reference predict.py:277-283)
        self.decoding_chunk_size = decoding_chunk_size
        self.num_decoding_left_chunks = num_decoding_left_chunks
        self.subsampling = 4
        self.context = 7
        self.decoding_window = (decoding_chunk_size - 1) * self.subsampling \
            + self.context  # 67
        self.stride = decoding_chunk_size * self.subsampling  # 64
        left = num_decoding_left_chunks if num_decoding_left_chunks > 0 \
            else 16  # static cap emulating "all history"
        self.cache_size = decoding_chunk_size * left

        self._predict_fn = jax.jit(lambda p, s, l: self.model.apply(
            p, s, l, method='get_encoder_out'))
        # softmax-free batch-decode fast path (CTC logits → candidates)
        self._predict_logits_fn = jax.jit(lambda p, s, l: self.model.apply(
            p, s, l, method='get_encoder_logits')) \
            if hasattr(self.model, 'get_encoder_logits') else None
        if self.use_model == 'deepspeech2':
            self._chunk_fn = jax.jit(
                lambda p, x, xl, st: self.model.apply(
                    p, x, xl, st, method='get_encoder_out_chunk'))
        else:
            self._chunk_fn = jax.jit(lambda p, x, st: self.model.apply(
                p, x, st, method='get_encoder_out_chunk'))

        if use_device_frontend:
            # fused Pallas fbank over fixed-size raw windows: one window of
            # decoding_window frames needs (win−1)·160 + 400 samples, so the
            # kernel compiles once and the host does only PCM bookkeeping
            from ppasr_tpu.ops.fbank_pallas import fbank_frames_pallas
            from ppasr_tpu.ops.fbank import frame_jax
            self._win_samples = (self.decoding_window - 1) * 160 + 400
            self._stride_samples = self.stride * 160

            interp = jax.default_backend() == 'cpu'  # pallas needs interpret

            def device_featurize(wav):  # [1, win_samples] int16-scaled
                frames = frame_jax(wav, 400, 160, self.decoding_window)
                return fbank_frames_pallas(
                    frames.reshape(-1, 400),
                    num_mel_bins=self.input_dim,
                    interpret=interp).reshape(
                    self.decoding_window, self.input_dim)
            self._device_featurize = jax.jit(device_featurize)

        if use_device_frontend and \
                self.audio_featurizer._feature_method == 'fbank':
            # offline batch featurization on device: predict_batch pads raw
            # waveforms and runs the batched fbank (ops/fbank.fbank_jax) in
            # one program, instead of per-utterance host kaldi fbank
            from ppasr_tpu.ops.fbank import fbank_jax as _fbank_jax
            sr = self.audio_featurizer._target_sample_rate

            def batch_featurize(wavs, wlens):  # [B, S] int16-scaled, [B]
                return _fbank_jax(wavs, wlens, sample_rate=sr,
                                  num_mel_bins=self.input_dim)
            self._batch_featurize_fn = jax.jit(batch_featurize)
        else:
            self._batch_featurize_fn = None

        self._init_decoder()
        self.reset_stream()
        self._warm_up()

    def _init_params_shape(self):
        rng = jax.random.PRNGKey(0)
        speech = jnp.zeros((1, 64, self.input_dim), jnp.float32)
        lens = jnp.asarray([64])
        text = jnp.asarray([[1, -1]], jnp.int32)
        tlens = jnp.asarray([1])
        return jax.eval_shape(
            lambda: self.model.init({'params': rng, 'dropout': rng,
                                     'chunk': rng}, speech, lens, text,
                                    tlens, deterministic=True))

    def _init_decoder(self):
        """Beam-search decoder with graceful greedy fallback (reference
        predict.py:92-105). Backend 'jax' (default, on-device) or 'host'.
        'attention_rescoring' (beyond-reference) rescores the beam with the
        model's attention decoder: offline predict/predict_batch, plus a
        final rescoring pass at is_end for streaming sessions (partial
        results stay incremental greedy)."""
        self._beam_decoder = None
        self._rescorer = None
        self._chunk_fn_rescore = None
        if self.decoder_name == 'attention_rescoring':
            conf = dict(self.decoder_configs)
            conf.pop('backend', None)
            ctc_weight = conf.pop('rescore_ctc_weight',
                                  self._model_conf.get('ctc_weight', 0.3))
            max_hyp_len = conf.pop('max_hyp_len', 200)
            try:
                if self.use_model == 'deepspeech2':
                    raise ValueError(
                        "deepspeech2 has no attention decoder")
                from ppasr_tpu.decoders.rescoring import \
                    AttentionRescoringDecoder
                self._rescorer = AttentionRescoringDecoder(
                    self.model, self.vocab_list, ctc_weight=ctc_weight,
                    max_hyp_len=max_hyp_len, **conf)
                self._rescore_encode_fn = jax.jit(
                    lambda p, s, l: self.model.apply(
                        p, s, l, method='encode_for_rescore'))
                if self.streaming:
                    # streaming chunk fn that also yields encoder output,
                    # so is_end can run a final rescoring pass
                    self._chunk_fn_rescore = jax.jit(
                        lambda p, x, st: self.model.apply(
                            p, x, st,
                            method='get_encoder_out_chunk_rescore'))
            except Exception as e:
                logger.warning(f"attention rescoring unavailable ({e}); "
                               f"falling back to ctc_greedy")
                self.decoder_name = 'ctc_greedy'
        if self.decoder_name == 'ctc_beam_search':
            conf = dict(self.decoder_configs)
            backend = conf.pop('backend', 'jax')
            lm = conf.get('language_model_path')
            if backend == 'jax' and lm and str(lm).endswith('.klm') \
                    and os.path.exists(lm):
                # .klm n-grams are stored as hashes — not enumerable into
                # the on-device tables; the native C++ backend loads the
                # binary directly (reference parity path)
                logger.info(".klm language model: using the native host "
                            "beam-search backend")
                backend = 'native'
            try:
                if backend == 'host':
                    from ppasr_tpu.decoders.beam_search import \
                        BeamSearchDecoder
                    self._beam_decoder = BeamSearchDecoder(
                        vocab_list=self.vocab_list, **conf)
                elif backend == 'native':
                    from ppasr_tpu.decoders.native import \
                        NativeBeamSearchDecoder
                    self._beam_decoder = NativeBeamSearchDecoder(
                        vocab_list=self.vocab_list, **conf)
                else:
                    from ppasr_tpu.decoders.beam_search_jax import \
                        JaxBeamSearchDecoder
                    self._beam_decoder = JaxBeamSearchDecoder(
                        vocab_list=self.vocab_list, **conf)
            except Exception as e:
                logger.warning(f"beam search unavailable ({e}); "
                               f"falling back to ctc_greedy")
                self.decoder_name = 'ctc_greedy'
        self._stream_decoder = GreedyStreamingDecoder(self.vocab_list)

    def _warm_up(self):
        warm = np.random.uniform(-0.1, 0.1, 16000).astype(np.float32)
        try:
            self.predict(warm)
            if self.streaming:
                self.predict_stream(warm, is_end=True)
                self.reset_stream()
        except Exception as e:
            logger.warning(f"warm-up failed: {e}")

    # ------------------------------------------------------------- helpers

    def _load_audio(self, audio_data, sample_rate=16000) -> AudioSegment:
        """path / bytes / ndarray / AudioSegment → AudioSegment (reference
        predict.py:142-160)."""
        if isinstance(audio_data, AudioSegment):
            return audio_data
        if isinstance(audio_data, str):
            return AudioSegment.from_file(audio_data)
        if isinstance(audio_data, bytes):
            return AudioSegment.from_pcm_bytes(audio_data,
                                               sample_rate=sample_rate)
        if isinstance(audio_data, np.ndarray):
            return AudioSegment.from_ndarray(audio_data, sample_rate)
        raise TypeError(f"unsupported audio_data type: {type(audio_data)}")

    def _pad_bucket(self, feat: np.ndarray):
        t = feat.shape[0]
        bucket = max(self.time_bucket_frames,
                     int(math.ceil(t / self.time_bucket_frames))
                     * self.time_bucket_frames)
        padded = np.zeros((1, bucket, feat.shape[1]), np.float32)
        padded[0, :t] = feat
        return padded, t

    def _decode_offline(self, probs: np.ndarray, out_len: int):
        if self._beam_decoder is not None:
            return self._beam_decoder.decode(probs[:out_len])
        return greedy_decoder(probs[:out_len], self.vocab_list)

    # -------------------------------------------------------------- offline

    def predict(self, audio_data, use_pun: bool = False,
                is_itn: bool = False, sample_rate: int = 16000):
        """Offline recognition → {'text', 'score'} (reference
        predict.py:163-187)."""
        audio = self._load_audio(audio_data, sample_rate)
        feat = self.audio_featurizer.featurize(audio)
        padded, t = self._pad_bucket(feat)
        lens = jnp.asarray([t])
        if self._rescorer is not None:
            enc_out, probs, olens = self._rescore_encode_fn(
                self.params, jnp.asarray(padded), lens)
            score, text = self._rescorer.decode_batch_rescore(
                self.params, enc_out, probs, np.asarray(olens))[0]
        else:
            probs, olens = self._predict_fn(self.params,
                                            jnp.asarray(padded), lens)
            score, text = self._decode_offline(np.asarray(probs[0]),
                                               int(olens[0]))
        if use_pun:
            text = self._restore_punctuation(text)
        if is_itn:
            text = self._inverse_text_normalization(text)
        return {'text': text, 'score': score}

    def predict_batch(self, audio_list, use_pun: bool = False,
                      is_itn: bool = False, sample_rate: int = 16000):
        """Batched offline recognition: list of path/bytes/ndarray →
        list of {'text','score'} (one padded device pass + batch decode)."""
        if not audio_list:
            return []
        n = len(audio_list)
        # batch axis padded to a power of two: one compiled program per
        # (B-bucket, T-bucket) pair instead of one per exact batch size
        # (predict_long feeds arbitrary VAD segment counts through here)
        b_bucket = 1 << (n - 1).bit_length() if n > 1 else 1
        if self._batch_featurize_fn is not None:
            # device frontend: host only loads/normalizes waveforms; the
            # batched kaldi fbank runs on device in one program
            wavs = [self.audio_featurizer.waveform(
                self._load_audio(a, sample_rate)) for a in audio_list]
            samp_bucket = self.time_bucket_frames * 160
            max_s = max(max(len(w) for w in wavs), 400)
            max_s = int(math.ceil(max_s / samp_bucket)) * samp_bucket
            wav_batch = np.zeros((b_bucket, max_s), np.float32)
            wlens = np.zeros((b_bucket,), np.int32)
            for i, w in enumerate(wavs):
                wav_batch[i, :len(w)] = w
                wlens[i] = len(w)
            batch, lens = self._batch_featurize_fn(jnp.asarray(wav_batch),
                                                   jnp.asarray(wlens))
        else:
            feats = []
            for audio_data in audio_list:
                audio = self._load_audio(audio_data, sample_rate)
                feats.append(self.audio_featurizer.featurize(audio))
            max_t = max(f.shape[0] for f in feats)
            bucket = max(self.time_bucket_frames,
                         int(math.ceil(max_t / self.time_bucket_frames))
                         * self.time_bucket_frames)
            batch = np.zeros((b_bucket, bucket, feats[0].shape[1]),
                             np.float32)
            lens = np.zeros((b_bucket,), np.int32)
            for i, f in enumerate(feats):
                batch[i, :f.shape[0]] = f
                lens[i] = f.shape[0]
        if self._rescorer is not None:
            enc_out, probs, olens = self._rescore_encode_fn(
                self.params, jnp.asarray(batch), jnp.asarray(lens))
            results = self._rescorer.decode_batch_rescore(
                self.params, enc_out, probs, np.asarray(olens))
        elif self._beam_decoder is not None:
            if (self._predict_logits_fn is not None and hasattr(
                    self._beam_decoder, 'decode_batch_from_logits')):
                # softmax-free: logits → on-device candidates directly
                logits, olens = self._predict_logits_fn(
                    self.params, jnp.asarray(batch), jnp.asarray(lens))
                results = self._beam_decoder.decode_batch_from_logits(
                    logits, np.asarray(olens))
            else:
                probs, olens = self._predict_fn(self.params,
                                                jnp.asarray(batch),
                                                jnp.asarray(lens))
                # device arrays pass through as-is (JAX decoder stays on
                # device)
                results = self._beam_decoder.decode_batch(
                    probs, np.asarray(olens))
        else:
            from ppasr_tpu.decoders.greedy import greedy_decoder_batch
            probs, olens = self._predict_fn(self.params, jnp.asarray(batch),
                                            jnp.asarray(lens))
            results = greedy_decoder_batch(probs,
                                           np.asarray(olens),
                                           self.vocab_list)
        out = []
        for score, text in list(results)[:n]:  # drop batch-padding rows
            if use_pun and text:
                text = self._restore_punctuation(text)
            if is_itn and text:
                text = self._inverse_text_normalization(text)
            out.append({'text': text, 'score': score})
        return out

    def predict_long(self, audio_data, use_pun: bool = False,
                     is_itn: bool = False, sample_rate: int = 16000):
        """VAD-segmented long-audio recognition (reference
        predict.py:190-229)."""
        from ppasr_tpu.infer_utils.vad_predictor import VADPredictor
        audio = self._load_audio(audio_data, sample_rate)
        if audio.sample_rate != 16000:
            audio.resample(16000)
        vad = VADPredictor(sampling_rate=audio.sample_rate)
        speeches = vad.get_speech_timestamps(audio.samples)
        if not speeches:
            speeches = [{'start': 0, 'end': audio.num_samples}]
        samples = audio.samples
        parts = [AudioSegment(samples[seg['start']:seg['end']].copy(),
                              audio.sample_rate) for seg in speeches]
        # VAD segments through padded batch passes (duration-bucketed in
        # predict_batch) instead of the reference's per-segment predict
        # loop (predict.py:203-219); groups of <=32 bound the padded
        # [B, T_max, V] activation memory on hour-long recordings
        results = []
        for i in range(0, len(parts), 32):
            results.extend(self.predict_batch(parts[i:i + 32],
                                              use_pun=False, is_itn=is_itn))
        texts = [r['text'] for r in results if r['text']]
        scores = [r['score'] for r in results if r['text']]
        text = '，'.join(texts)
        if use_pun and text:
            text = self._restore_punctuation(text)
        return {'text': text,
                'score': float(np.mean(scores)) if scores else 0.0}

    # ------------------------------------------------------------ streaming

    def reset_stream(self):
        """Clear wav/feature/device/decoder state (reference
        predict.py:340-347)."""
        self._remained_wav = np.zeros(0, np.float32)
        self._cached_feat = None
        self._state = None
        self._stream_sq_sum = 0.0
        self._stream_n = 0
        self._stream_enc_chunks = []
        self._stream_probs_chunks = []
        self._stream_decoder = GreedyStreamingDecoder(self.vocab_list)
        if self._beam_decoder is not None:
            self._beam_decoder.reset()

    def predict_stream(self, audio_data, is_end: bool = False,
                       use_pun: bool = False, is_itn: bool = False,
                       channels: int = 1, samp_width: int = 2,
                       sample_rate: int = 16000):
        """Incremental recognition (reference predict.py:232-337).

        Returns {'text', 'score'} for the utterance so far."""
        if not self.streaming:
            raise RuntimeError("model was built non-streaming; "
                               "use predict() instead")
        if isinstance(audio_data, bytes):
            audio = AudioSegment.from_pcm_bytes(audio_data, channels,
                                                samp_width, sample_rate)
        else:
            audio = self._load_audio(audio_data, sample_rate)
        if audio.sample_rate != 16000:
            audio.resample(16000)
        self._remained_wav = np.concatenate([self._remained_wav,
                                             audio.samples])

        # track running energy for stream-wide gain normalization
        if audio.num_samples:
            s = audio.samples
            self._stream_sq_sum += float(np.sum(s.astype(np.float64) ** 2))
            self._stream_n += len(s)

        if self.use_device_frontend:
            return self._predict_stream_device(is_end, use_pun, is_itn)

        # featurize everything buffered WITHOUT gain; the running-RMS gain is
        # applied later as an additive log-mel offset per consumed window
        # (a linear gain g scales every mel energy by g², i.e. shifts
        # log-mel by dB·ln10/10 — so cached features stay gain-free and each
        # window uses the freshest estimate uniformly)
        if len(self._remained_wav) >= 400:
            seg = AudioSegment(self._remained_wav.copy(), 16000)
            feat = self.stream_featurizer.featurize(seg)
            t = feat.shape[0]
            if t > 0:
                self._remained_wav = self._remained_wav[t * 160:]
                self._cached_feat = feat if self._cached_feat is None \
                    else np.concatenate([self._cached_feat, feat])

        result_text, result_score = None, None

        # consume full windows
        while (self._cached_feat is not None
               and self._cached_feat.shape[0] >= self.decoding_window):
            window = self._cached_feat[:self.decoding_window]
            self._cached_feat = self._cached_feat[self.stride:]
            probs = self._run_chunk(window)
            if self._beam_decoder is not None:
                score, text = self._beam_decoder.decode_chunk(probs)
            else:
                score, text = self._stream_decoder.decode_chunk(probs)
            result_score, result_text = score, text

        if is_end and self._cached_feat is not None \
                and self._cached_feat.shape[0] >= self.context:
            # flush the remaining partial window
            window = self._cached_feat
            self._cached_feat = None
            probs = self._run_chunk(window)
            if probs.shape[0] > 0:
                if self._beam_decoder is not None:
                    score, text = self._beam_decoder.decode_chunk(probs)
                else:
                    score, text = self._stream_decoder.decode_chunk(probs)
                result_score, result_text = score, text

        if result_text is None:
            # no new window this call: re-emit current hypothesis
            score, text = self._stream_decoder.current() \
                if self._beam_decoder is None else \
                self._beam_decoder.current()
            result_score, result_text = score, text

        if is_end:
            final = self._final_stream_rescore()
            if final is not None:
                result_score, result_text = final

        text = result_text or ''
        if use_pun and text:
            text = self._restore_punctuation(text)
        if is_itn and text:
            text = self._inverse_text_normalization(text)
        return {'text': text, 'score': result_score or 0.0}

    def _predict_stream_device(self, is_end, use_pun, is_itn):
        """Device-frontend streaming: raw PCM windows go straight through the
        fused Pallas fbank on device; the host only slices sample buffers."""
        import jax.numpy as _jnp
        result_text, result_score = None, None
        while len(self._remained_wav) >= self._win_samples:
            window = self._remained_wav[:self._win_samples]
            self._remained_wav = self._remained_wav[self._stride_samples:]
            feat = np.asarray(self._device_featurize(
                _jnp.asarray(np.clip(window * 32768.0, -32768, 32767)
                             [None])))
            probs = self._run_chunk(feat)
            dec = self._beam_decoder or self._stream_decoder
            result_score, result_text = dec.decode_chunk(probs)
        if is_end and len(self._remained_wav) >= self.context * 160 + 240:
            # flush: host featurize of the short tail (one-off shape)
            seg = AudioSegment(
                self._remained_wav.copy(), 16000)
            feat = self.stream_featurizer.featurize(seg)
            self._remained_wav = np.zeros(0, np.float32)
            if feat.shape[0] >= self.context:
                probs = self._run_chunk(feat)
                if probs.shape[0] > 0:
                    if self._beam_decoder is not None:
                        result_score, result_text = \
                            self._beam_decoder.decode_chunk(probs)
                    else:
                        result_score, result_text = \
                            self._stream_decoder.decode_chunk(probs)
        if result_text is None:
            dec = self._beam_decoder or self._stream_decoder
            result_score, result_text = dec.current()
        if is_end:
            final = self._final_stream_rescore()
            if final is not None:
                result_score, result_text = final
        return {'text': result_text or '', 'score': result_score or 0.0}

    def _stream_gain_offset(self) -> float:
        """Additive log-mel offset from the running-RMS dB gain estimate."""
        if self._stream_target_db is None or not self._stream_n:
            return 0.0
        rms_db = 10.0 * np.log10(
            self._stream_sq_sum / self._stream_n + 1e-20)
        gain_db = min(self._stream_target_db - rms_db, 300.0)
        return float(gain_db * np.log(10.0) / 10.0)

    def _run_chunk(self, window_feat: np.ndarray) -> np.ndarray:
        """One encoder chunk step on device; returns [T_out, V] probs."""
        window_feat = window_feat + self._stream_gain_offset()
        if self._state is None:
            if self.use_model == 'deepspeech2':
                self._state = self.model.init_state(1)
            else:
                self._state = self.model.init_state(1, self.cache_size)
        # pad variable flush windows up to decoding_window for shape reuse
        t = window_feat.shape[0]
        if t < self.decoding_window:
            padded = np.zeros((self.decoding_window, window_feat.shape[1]),
                              np.float32)
            padded[:t] = window_feat
            window_feat = padded
        xs = jnp.asarray(window_feat[None])
        if self.use_model == 'deepspeech2':
            probs, olens, self._state = self._chunk_fn(
                self.params, xs, jnp.asarray([t]), self._state)
            out = np.asarray(probs[0, :int(olens[0])])
        else:
            valid_out = ((t - self.context) // self.subsampling) + 1
            # efficient_conformer stride layers further reduce time
            out_factor = getattr(self.model, 'output_factor', 1)
            valid_out = (valid_out + out_factor - 1) // out_factor
            if self._chunk_fn_rescore is not None:
                enc, probs, self._state = self._chunk_fn_rescore(
                    self.params, xs, self._state)
                self._stream_enc_chunks.append(
                    np.asarray(enc[0][:valid_out], np.float32))
            else:
                probs, self._state = self._chunk_fn(self.params, xs,
                                                    self._state)
            out = np.asarray(probs[0][:valid_out])
            if self._chunk_fn_rescore is not None:
                self._stream_probs_chunks.append(out.astype(np.float32))
        return out

    def _final_stream_rescore(self):
        """is_end hook: one attention-rescoring pass over the accumulated
        utterance (encoder outputs + CTC posteriors collected per chunk).
        Returns (score, text) or None when rescoring is inactive/empty."""
        if self._rescorer is None or not self._stream_probs_chunks:
            return None
        return self._rescorer.rescore_utterance(
            self.params, self._stream_enc_chunks, self._stream_probs_chunks)

    # ------------------------------------------------- punctuation & itn

    def _restore_punctuation(self, text: str) -> str:
        try:
            from ppasr_tpu.infer_utils.pun_predictor import PunctuationPredictor
            if not hasattr(self, '_pun_predictor'):
                kwargs = {}
                if getattr(self, '_pun_model_dir', None):
                    kwargs['model_dir'] = self._pun_model_dir
                self._pun_predictor = PunctuationPredictor(**kwargs)
            return self._pun_predictor(text)
        except Exception as e:
            logger.warning(f"punctuation restoration unavailable: {e}")
            return text

    def _inverse_text_normalization(self, text: str) -> str:
        """WeTextProcessing when installed (the reference's ITN engine,
        predict.py:350-356); in-repo rule-based Chinese ITN otherwise."""
        try:
            from itn.chinese.inverse_normalizer import InverseNormalizer
            if not hasattr(self, '_itn'):
                self._itn = InverseNormalizer()
            return self._itn.normalize(text)
        except Exception:
            from ppasr_tpu.utils.itn import inverse_normalize
            return inverse_normalize(text)
