"""Desktop GUI for recognition (parity with reference infer_gui.py: record
from microphone or pick files, short/long/streaming recognition, optional
remote-server mode over WebSocket).

Requires tkinter (+ pyaudio or sounddevice for recording); both are optional
in this image, so imports are gated with clear errors.
"""
import argparse
import functools
import json
import os
import threading
import time

from ppasr_tpu.utils.common import add_arguments, print_arguments
from ppasr_tpu.utils.logger import setup_logger

logger = setup_logger(__name__)

parser = argparse.ArgumentParser(description=__doc__)
add_arg = functools.partial(add_arguments, argparser=parser)
add_arg('configs', str, 'configs/conformer.yml', 'config file path')
add_arg('model_path', str,
        'models/conformer_streaming_fbank/infer/', 'exported model dir')
add_arg('decoder', str, None, 'ctc_greedy | ctc_beam_search')
add_arg('use_pun', bool, False, 'restore punctuation')
add_arg('is_itn', bool, False, 'inverse text normalization')
add_arg('use_server', bool, False, 'send audio to a remote server instead')
add_arg('server_url', str, 'ws://127.0.0.1:5001', 'remote streaming server')
args = parser.parse_args()


def _require_tk():
    try:
        import tkinter  # noqa: F401
        return True
    except ImportError:
        logger.error("tkinter is not available in this environment; "
                     "use infer_path.py / infer_server.py instead")
        return False


class RecognitionGUI:
    def __init__(self):
        import tkinter as tk
        from tkinter import filedialog, scrolledtext
        self.tk, self.filedialog = tk, filedialog

        self.predictor = None
        if not args.use_server:
            from ppasr_tpu.predict import PPASRPredictor
            self.predictor = PPASRPredictor(configs=args.configs,
                                            model_path=args.model_path,
                                            decoder=args.decoder,
                                            use_pun=args.use_pun)

        self.root = tk.Tk()
        self.root.title("ppasr_tpu 语音识别")
        bar = tk.Frame(self.root)
        bar.pack(fill='x')
        tk.Button(bar, text="选择短语音识别",
                  command=self.predict_file).pack(side='left')
        tk.Button(bar, text="选择长语音识别",
                  command=self.predict_long_file).pack(side='left')
        self.record_btn = tk.Button(bar, text="录音识别",
                                    command=self.toggle_record)
        self.record_btn.pack(side='left')
        self.output = scrolledtext.ScrolledText(self.root, width=80,
                                                height=20)
        self.output.pack(fill='both', expand=True)
        self.recording = False

    def log(self, text):
        self.output.insert('end', text + '\n')
        self.output.see('end')

    def predict_file(self):
        path = self.filedialog.askopenfilename(
            filetypes=[("audio", "*.wav *.flac *.mp3")])
        if not path:
            return
        start = time.time()
        result = self.predictor.predict(path, use_pun=args.use_pun,
                                        is_itn=args.is_itn)
        self.log(f"[{os.path.basename(path)}] "
                 f"{int((time.time() - start) * 1000)}ms: {result['text']}")

    def predict_long_file(self):
        path = self.filedialog.askopenfilename(
            filetypes=[("audio", "*.wav *.flac *.mp3")])
        if not path:
            return
        start = time.time()
        result = self.predictor.predict_long(path, use_pun=args.use_pun,
                                             is_itn=args.is_itn)
        self.log(f"[长语音 {os.path.basename(path)}] "
                 f"{int((time.time() - start) * 1000)}ms: {result['text']}")

    # ------------------------------------------------------------ recording

    def toggle_record(self):
        if self.recording:
            self.recording = False
            self.record_btn.config(text="录音识别")
            return
        try:
            import sounddevice  # noqa: F401
        except ImportError:
            self.log("录音需要 sounddevice 库（当前环境未安装）")
            return
        self.recording = True
        self.record_btn.config(text="停止录音")
        threading.Thread(target=self._record_loop, daemon=True).start()

    def _record_loop(self):
        import numpy as np
        import sounddevice as sd
        sr, chunk = 16000, 8000
        if self.predictor is not None:
            self.predictor.reset_stream()
        with sd.InputStream(samplerate=sr, channels=1,
                            dtype='int16') as stream_in:
            while self.recording:
                data, _ = stream_in.read(chunk)
                pcm = np.asarray(data[:, 0], np.int16).tobytes()
                if args.use_server:
                    self._send_remote(pcm, False)
                else:
                    result = self.predictor.predict_stream(
                        pcm, is_end=False, use_pun=args.use_pun,
                        is_itn=args.is_itn)
                    self.root.after(0, self.log, f"→ {result['text']}")
        if args.use_server:
            self._send_remote(b'end', True)
        else:
            result = self.predictor.predict_stream(b'', is_end=True)
            self.root.after(0, self.log, f"[最终] {result['text']}")
            self.predictor.reset_stream()

    def _send_remote(self, payload, is_end):
        import asyncio
        import websockets

        async def send():
            if not hasattr(self, '_ws') or self._ws is None:
                self._ws = await websockets.connect(args.server_url)
            await self._ws.send(b'end' if is_end else payload)
            reply = json.loads(await self._ws.recv())
            self.root.after(0, self.log, f"→ {reply.get('result', '')}")
            if is_end:
                await self._ws.close()
                self._ws = None
        asyncio.run(send())

    def run(self):
        self.root.mainloop()


if __name__ == '__main__':
    print_arguments(args=args)
    if _require_tk():
        RecognitionGUI().run()
