"""End-to-end integration: create_data → train → export → predict (offline +
streaming) on a tiny synthetic corpus, all through the public APIs."""
import json
import os

import numpy as np
import pytest

from ppasr_tpu.data.audio import AudioSegment

FIXTURE = "/root/reference/dataset/test.wav"

TINY_CONFIG = {
    'encoder_conf': {'output_size': 32, 'attention_heads': 2,
                     'linear_units': 64, 'num_blocks': 1,
                     'cnn_module_kernel': 7},
    'decoder_conf': {'attention_heads': 2, 'linear_units': 64,
                     'num_blocks': 1, 'r_num_blocks': 1},
    'model_conf': {'ctc_weight': 0.7, 'lsm_weight': 0.1,
                   'reverse_weight': 0.3},
    'preprocess_conf': {'feature_method': 'fbank', 'n_mels': 80,
                        'sample_rate': 16000, 'use_dB_normalization': True,
                        'target_dB': -20},
    'optimizer_conf': {'optimizer': 'Adam', 'weight_decay': 1e-6,
                       'learning_rate': 0.001, 'scheduler': 'WarmupLR',
                       'scheduler_conf': {'warmup_steps': 10,
                                          'min_lr': 1e-5}},
    'train_conf': {'enable_amp': False, 'grad_clip': 5.0, 'accum_grad': 1,
                   'max_epoch': 1, 'log_interval': 10},
    'use_model': 'conformer',
    'streaming': True,
    'decoder': 'ctc_greedy',
    'metrics_type': 'cer',
}


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    cwd = os.getcwd()
    os.chdir(root)
    try:
        full = AudioSegment.from_file(FIXTURE)
        samples = full.samples
        os.makedirs("dataset/audio", exist_ok=True)
        rng = np.random.default_rng(0)
        lines = []
        texts = ["你好", "世界"]
        for i in range(8):
            start = int(rng.uniform(0, len(samples) - 16000))
            seg = AudioSegment(samples[start:start + 12000].copy(), 16000)
            p = os.path.abspath(f"dataset/audio/u{i}.wav")
            seg.to_wav_file(p)
            lines.append(f"{p}\t{texts[i % 2]}")
        os.makedirs("dataset/annotation", exist_ok=True)
        with open("dataset/annotation/train.txt", "w",
                  encoding='utf-8') as f:
            f.write("\n".join(lines[:6]))
        with open("dataset/annotation/test.txt", "w",
                  encoding='utf-8') as f:
            f.write("\n".join(lines[6:]))
        cfg = dict(TINY_CONFIG)
        cfg['dataset_conf'] = {
            'batch_size': 2, 'num_workers': 1, 'min_duration': 0.3,
            'max_duration': 20,
            'train_manifest': 'dataset/manifest.train',
            'test_manifest': 'dataset/manifest.test',
            'dataset_vocab': 'dataset/vocabulary.txt',
            'mean_istd_path': 'dataset/mean_istd.json',
            'noise_manifest_path': 'dataset/manifest.noise',
            'manifest_type': 'txt'}
        yield cfg
    finally:
        os.chdir(cwd)


def test_full_pipeline(workspace):
    from ppasr_tpu.trainer import PPASRTrainer
    trainer = PPASRTrainer(configs=dict(workspace))
    trainer.create_data(annotation_path='dataset/annotation/',
                        noise_dir=None, num_samples=-1, count_threshold=1,
                        is_change_frame_rate=False)
    assert os.path.exists('dataset/vocabulary.txt')
    assert os.path.exists('dataset/mean_istd.json')

    trainer.train(save_model_path='models/')
    ckpt = 'models/conformer_streaming_fbank/last_model'
    assert os.path.exists(os.path.join(ckpt, 'model.msgpack'))
    with open(os.path.join(ckpt, 'model.state')) as f:
        state = json.load(f)
    assert state['last_epoch'] == 1

    error_rate, loss = trainer.evaluate(resume_model='models/')
    assert np.isfinite(loss)

    infer_dir = trainer.export(save_model_path='models/')
    assert os.path.exists(os.path.join(infer_dir, 'inference.json'))

    # export must write the CHECKPOINT's params, whether resume_model is
    # the models root or a direct checkpoint dir (the reference CLI
    # convention) — a silent random-init export once shipped garbage
    with open(os.path.join(ckpt, 'model.msgpack'), 'rb') as f:
        ckpt_bytes = f.read()
    with open(os.path.join(infer_dir, 'model.msgpack'), 'rb') as f:
        assert f.read() == ckpt_bytes
    trainer.export(save_model_path='models/', resume_model=ckpt)
    with open(os.path.join(infer_dir, 'model.msgpack'), 'rb') as f:
        assert f.read() == ckpt_bytes
    with pytest.raises(FileNotFoundError):
        trainer.export(save_model_path='models/',
                       resume_model='no/such/checkpoint')
    with pytest.raises(FileNotFoundError):
        trainer.evaluate(resume_model='no/such/checkpoint')

    from ppasr_tpu.predict import PPASRPredictor
    predictor = PPASRPredictor(configs=dict(workspace),
                               model_path=infer_dir)
    result = predictor.predict(FIXTURE)
    assert 'text' in result and 'score' in result

    # streaming: feed 0.5 s chunks
    seg = AudioSegment.from_file(FIXTURE)
    chunk = 8000
    for i in range(0, min(len(seg.samples), 48000), chunk):
        result = predictor.predict_stream(seg.samples[i:i + chunk],
                                          is_end=False)
    result = predictor.predict_stream(b'', is_end=True)
    assert 'text' in result
    predictor.reset_stream()

    # long-audio: VAD segmentation → batched segment decode (+ the
    # power-of-two batch padding path inside predict_batch)
    seg_l = AudioSegment.from_file(FIXTURE)
    gap = np.zeros(12000, np.float32)
    long_samples = np.concatenate(
        [seg_l.samples[:32000], gap, seg_l.samples[:24000], gap,
         seg_l.samples[32000:64000]])
    long_result = predictor.predict_long(
        AudioSegment(long_samples, 16000))
    assert 'text' in long_result and np.isfinite(long_result['score'])
    odd_batch = predictor.predict_batch([FIXTURE] * 3)  # pads B 3 → 4
    assert len(odd_batch) == 3
    assert odd_batch[0]['text'] == odd_batch[2]['text']

    # offline device-frontend: batched on-device fbank must transcribe
    # identically to the host-featurized path on the same artifact
    predictor_df = PPASRPredictor(configs=dict(workspace),
                                  model_path=infer_dir,
                                  use_device_frontend=True)
    assert predictor_df._batch_featurize_fn is not None
    df_batch = predictor_df.predict_batch([FIXTURE] * 2)
    host_batch = predictor.predict_batch([FIXTURE] * 2)
    assert df_batch[0]['text'] == host_batch[0]['text']

    # streaming device frontend (fused Pallas fbank over raw windows) must
    # agree with host-featurized streaming on the same audio
    seg_df = AudioSegment.from_file(FIXTURE)
    for i in range(0, min(len(seg_df.samples), 48000), 8000):
        host_stream = predictor.predict_stream(
            seg_df.samples[i:i + 8000], is_end=False)
        df_stream = predictor_df.predict_stream(
            seg_df.samples[i:i + 8000], is_end=False)
    host_stream = predictor.predict_stream(b'', is_end=True)
    df_stream = predictor_df.predict_stream(b'', is_end=True)
    predictor.reset_stream()
    predictor_df.reset_stream()
    assert df_stream['text'] == host_stream['text']

    # beam-search eval: the softmax-free logits fast path must produce
    # the same error rate as the probs path over the trained artifacts
    beam_cfg = dict(workspace)
    beam_cfg['decoder'] = 'ctc_beam_search'
    beam_cfg['ctc_beam_search_decoder_conf'] = {
        'beam_size': 5, 'cutoff_prob': 1.0, 'cutoff_top_n': 7,
        'alpha': 0.0, 'beta': 0.0}
    trainer_bm = PPASRTrainer(configs=beam_cfg)
    err_bm, _ = trainer_bm.evaluate(resume_model='models/')
    assert trainer_bm._eval_logits_fn is not None  # fast path was taken
    trainer_bm2 = PPASRTrainer(configs=beam_cfg)
    err_bm2, _ = trainer_bm2.evaluate(resume_model='models/')
    trainer_bm2._eval_logits_fn = None  # force the probs path
    err_bm2b, _ = trainer_bm2.evaluate(resume_model='models/')
    assert err_bm == err_bm2 == err_bm2b
    # predict_batch drives the same fast path through the predictor
    predictor_bm = PPASRPredictor(configs=beam_cfg, model_path=infer_dir)
    assert predictor_bm._beam_decoder is not None
    assert predictor_bm._predict_logits_fn is not None
    batch_results = predictor_bm.predict_batch([FIXTURE, FIXTURE])
    assert len(batch_results) == 2
    assert batch_results[0]['text'] == batch_results[1]['text']
    single = predictor_bm.predict(FIXTURE)
    assert batch_results[0]['text'] == single['text']

    # attention rescoring (beyond-reference decode mode) over the same
    # trained artifacts: trainer eval + offline predict
    rescore_cfg = dict(workspace)
    rescore_cfg['decoder'] = 'attention_rescoring'
    rescore_cfg['ctc_beam_search_decoder_conf'] = {
        'beam_size': 5, 'cutoff_prob': 1.0, 'cutoff_top_n': 7,
        'alpha': 0.0, 'beta': 0.0}
    trainer_rs = PPASRTrainer(configs=rescore_cfg)
    err_rs, loss_rs = trainer_rs.evaluate(resume_model='models/')
    assert np.isfinite(loss_rs) and np.isfinite(err_rs)
    predictor_rs = PPASRPredictor(configs=rescore_cfg, model_path=infer_dir)
    assert predictor_rs._rescorer is not None, "rescorer fell back"
    result_rs = predictor_rs.predict(FIXTURE)
    assert 'text' in result_rs and np.isfinite(result_rs['score'])

    batch_rs = predictor_rs.predict_batch([FIXTURE] * 3)  # pads B 3 → 4
    assert len(batch_rs) == 3
    assert batch_rs[0]['text'] == batch_rs[2]['text']

    # streaming session: incremental greedy partials, one final rescoring
    # pass over the accumulated utterance at is_end
    seg_rs = AudioSegment.from_file(FIXTURE)
    for i in range(0, 32000, 8000):
        predictor_rs.predict_stream(seg_rs.samples[i:i + 8000],
                                    is_end=False)
    assert predictor_rs._stream_probs_chunks, "no chunks accumulated"
    result_rs_stream = predictor_rs.predict_stream(b'', is_end=True)
    assert 'text' in result_rs_stream
    assert np.isfinite(result_rs_stream['score'])
    predictor_rs.reset_stream()
    assert not predictor_rs._stream_probs_chunks

    # batched multi-stream engine: same final rescoring pass per stream end
    from ppasr_tpu.serving import StreamingBatchEngine
    engine = StreamingBatchEngine(predictor_rs, max_streams=2)
    assert engine._rescorer is not None
    slot = engine.open_stream()
    for i in range(0, 24000, 8000):
        engine.feed(slot, seg_rs.samples[i:i + 8000], is_end=False)
    final = engine.feed(slot, seg_rs.samples[24000:32000], is_end=True)
    assert 'text' in final and np.isfinite(final['score'])
    assert engine._rescore_chunks[slot] == ([], [])
    engine.close_stream(slot)


def test_vad_segmentation_energy_backend():
    """The dependency-free energy fallback segments loud-vs-quiet audio."""
    from ppasr_tpu.infer_utils.vad_predictor import VADPredictor
    rng = np.random.default_rng(0)
    sr = 16000
    # 1 s noise floor, 1 s loud span, 1 s noise
    wav = np.concatenate([
        rng.standard_normal(sr) * 0.001,
        rng.standard_normal(sr) * 0.3,
        rng.standard_normal(sr) * 0.001]).astype(np.float32)
    vad = VADPredictor(sampling_rate=sr)
    vad.model = None   # force the energy heuristic
    speeches = vad.get_speech_timestamps(wav)
    assert len(speeches) >= 1
    s = speeches[0]
    assert abs(s['start'] - sr) < sr * 0.3
    assert abs(s['end'] - 2 * sr) < sr * 0.3


def test_vad_segmentation_silero():
    """The packaged Silero weights segment real speech with silence pads."""
    import wave
    from ppasr_tpu.infer_utils.vad_predictor import VADPredictor
    wav_path = '/root/reference/dataset/test.wav'
    if not os.path.exists(wav_path):
        import pytest
        pytest.skip('no real speech fixture')
    with wave.open(wav_path, 'rb') as f:
        sr = f.getframerate()
        pcm = np.frombuffer(f.readframes(f.getnframes()),
                            np.int16).astype(np.float32) / 32768.0
    wav = np.concatenate([np.zeros(sr, np.float32), pcm,
                          np.zeros(sr, np.float32)])
    vad = VADPredictor(sampling_rate=sr)
    assert type(vad.model).__name__ == 'SileroVAD'
    speeches = vad.get_speech_timestamps(wav)
    assert len(speeches) >= 1
    # speech must start after the leading silence second and end before
    # the trailing one
    assert speeches[0]['start'] >= sr * 0.7
    assert speeches[-1]['end'] <= len(wav) - sr * 0.7
    # and streaming events must fire inside the speech span too
    vad.reset_states()
    events = []
    for i in range(0, len(wav), 4096):
        events += vad.stream_vad(wav[i:i + 4096])
    assert any('start' in e for e in events)
