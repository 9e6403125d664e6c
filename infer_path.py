"""Recognize an audio file: offline, long-audio, or simulated streaming
(parity with reference infer_path.py, incl. --real_time_demo)."""
import argparse
import functools
import time

from ppasr_tpu.predict import PPASRPredictor
from ppasr_tpu.utils.common import add_arguments, print_arguments
from ppasr_tpu.utils.logger import setup_logger

logger = setup_logger(__name__)

parser = argparse.ArgumentParser(description=__doc__)
add_arg = functools.partial(add_arguments, argparser=parser)
add_arg('configs', str, 'configs/conformer.yml', 'config file path')
add_arg('wav_path', str, 'dataset/test.wav', 'audio file to recognize')
add_arg('model_path', str,
        'models/conformer_streaming_fbank/infer/', 'exported model dir')
add_arg('decoder', str, None, 'ctc_greedy | ctc_beam_search')
add_arg('is_long_audio', bool, False, 'use VAD-segmented long-audio mode')
add_arg('real_time_demo', bool, False, 'simulate streaming recognition')
add_arg('use_gpu', bool, True, 'use accelerator if available')
add_arg('use_pun', bool, False, 'restore punctuation')
add_arg('is_itn', bool, False, 'inverse text normalization')
add_arg('use_device_frontend', bool, False,
        'featurize on the accelerator (streaming windows + offline batches)')
args = parser.parse_args()
print_arguments(args=args)

predictor = PPASRPredictor(configs=args.configs, model_path=args.model_path,
                           use_gpu=args.use_gpu, decoder=args.decoder,
                           use_pun=args.use_pun,
                           use_device_frontend=args.use_device_frontend)


def predict_audio():
    start = time.time()
    result = predictor.predict(args.wav_path, use_pun=args.use_pun,
                               is_itn=args.is_itn)
    logger.info(f"time: {int((time.time() - start) * 1000)}ms, "
                f"score: {result['score']:.2f}, text: {result['text']}")


def predict_long_audio():
    start = time.time()
    result = predictor.predict_long(args.wav_path, use_pun=args.use_pun,
                                    is_itn=args.is_itn)
    logger.info(f"long audio time: {int((time.time() - start) * 1000)}ms, "
                f"score: {result['score']:.2f}, text: {result['text']}")


def real_time_predict_demo():
    """Feed the wav in 0.5 s chunks like a live stream
    (reference infer_path.py:48-66)."""
    from ppasr_tpu.data.audio import AudioSegment
    audio = AudioSegment.from_file(args.wav_path)
    samples = audio.samples
    sr = audio.sample_rate
    chunk = int(0.5 * sr)
    for i in range(0, len(samples), chunk):
        data = samples[i:i + chunk]
        is_end = i + chunk >= len(samples)
        start = time.time()
        result = predictor.predict_stream(data, is_end=is_end,
                                          use_pun=args.use_pun,
                                          is_itn=args.is_itn,
                                          sample_rate=sr)
        logger.info(f"[{i / sr:5.1f}s] {int((time.time() - start) * 1000)}ms"
                    f" → {result['text']}")
    predictor.reset_stream()


if __name__ == "__main__":
    if args.real_time_demo:
        real_time_predict_demo()
    elif args.is_long_audio:
        predict_long_audio()
    else:
        predict_audio()
