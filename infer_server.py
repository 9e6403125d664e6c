"""Speech recognition server: HTTP endpoints + WebSocket streaming.

Capability parity with reference infer_server.py (FastAPI + WebSocket):
- POST /recognition — upload audio file, offline recognition (:50-77)
- POST /recognition_long_audio — VAD-segmented long audio (:80-95)
- WebSocket / — streaming PCM chunks, b'end' sentinel finishes the
  utterance (:103-156)

This image has no fastapi/uvicorn, so the HTTP side uses the stdlib
http.server (threaded) and the streaming side the ``websockets`` package —
same endpoints, same JSON response shape {code, msg, result}.
"""
import argparse
import asyncio
import functools
import json
import os
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from ppasr_tpu.predict import PPASRPredictor
from ppasr_tpu.utils.common import add_arguments, print_arguments
from ppasr_tpu.utils.logger import setup_logger

logger = setup_logger(__name__)

parser = argparse.ArgumentParser(description=__doc__)
add_arg = functools.partial(add_arguments, argparser=parser)
add_arg('configs', str, 'configs/conformer.yml', 'config file path')
add_arg('host', str, '0.0.0.0', 'bind address')
add_arg('port', int, 5000, 'HTTP port')
add_arg('ws_port', int, 5001, 'WebSocket streaming port')
add_arg('model_path', str,
        'models/conformer_streaming_fbank/infer/', 'exported model dir')
add_arg('decoder', str, None, 'ctc_greedy | ctc_beam_search')
add_arg('use_pun', bool, False, 'restore punctuation')
add_arg('is_itn', bool, False, 'inverse text normalization')
add_arg('use_device_frontend', bool, False,
        'featurize on the accelerator (streaming windows + offline batches)')
add_arg('save_audio_dir', str, 'dataset/upload_audio',
        'where uploaded/streamed audio is saved')
add_arg('max_streams', int, 16,
        'concurrent websocket streams (batched on one device state)')
args = parser.parse_args()

predictor = None
predictor_lock = threading.Lock()


def _json_response(handler, payload, status=200):
    body = json.dumps(payload, ensure_ascii=False).encode('utf-8')
    handler.send_response(status)
    handler.send_header('Content-Type', 'application/json; charset=utf-8')
    handler.send_header('Content-Length', str(len(body)))
    handler.send_header('Access-Control-Allow-Origin', '*')
    handler.end_headers()
    handler.wfile.write(body)


def _extract_upload(handler):
    """Read the request body; supports raw audio bytes or a simple
    multipart upload (first file part)."""
    length = int(handler.headers.get('Content-Length', 0))
    data = handler.rfile.read(length)
    ctype = handler.headers.get('Content-Type', '')
    if 'multipart/form-data' in ctype and b'\r\n\r\n' in data:
        boundary = ctype.split('boundary=')[-1].encode()
        for part in data.split(b'--' + boundary):
            if b'filename=' in part and b'\r\n\r\n' in part:
                return part.split(b'\r\n\r\n', 1)[1].rsplit(b'\r\n', 1)[0]
    return data


class Handler(BaseHTTPRequestHandler):
    def log_message(self, fmt, *log_args):
        logger.info("%s " + fmt, self.address_string(), *log_args)

    def do_GET(self):
        """Serve the web demo client (templates/index.html + static/)."""
        root = os.path.dirname(os.path.abspath(__file__))
        if self.path in ('/', '/index.html'):
            path = os.path.join(root, 'templates', 'index.html')
            ctype = 'text/html; charset=utf-8'
        elif self.path.startswith('/static/'):
            # containment check: refuse traversal out of static/
            static_root = os.path.realpath(os.path.join(root, 'static'))
            path = os.path.realpath(
                os.path.join(static_root, self.path[len('/static/'):]))
            if not path.startswith(static_root + os.sep):
                self.send_response(403)
                self.end_headers()
                return
            ctype = 'application/javascript' if path.endswith('.js') \
                else 'application/octet-stream'
        else:
            self.send_response(404)
            self.end_headers()
            return
        if not os.path.exists(path):
            self.send_response(404)
            self.end_headers()
            return
        with open(path, 'rb') as f:
            body = f.read()
        self.send_response(200)
        self.send_header('Content-Type', ctype)
        self.send_header('Content-Length', str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_POST(self):
        audio_bytes = _extract_upload(self)
        if not audio_bytes:
            _json_response(self, {'code': 1, 'msg': 'no audio data'}, 400)
            return
        os.makedirs(args.save_audio_dir, exist_ok=True)
        save_path = os.path.join(args.save_audio_dir,
                                 f'{int(time.time() * 1000)}.wav')
        with open(save_path, 'wb') as f:
            f.write(audio_bytes)
        try:
            with predictor_lock:
                if self.path.startswith('/recognition_long_audio'):
                    result = predictor.predict_long(save_path,
                                                    use_pun=args.use_pun,
                                                    is_itn=args.is_itn)
                elif self.path.startswith('/recognition'):
                    result = predictor.predict(save_path,
                                               use_pun=args.use_pun,
                                               is_itn=args.is_itn)
                else:
                    _json_response(self, {'code': 1, 'msg': 'not found'},
                                   404)
                    return
            _json_response(self, {'code': 0, 'msg': 'success',
                                  'result': result['text'],
                                  'score': result['score']})
        except Exception as e:
            logger.exception("recognition failed")
            _json_response(self, {'code': 2, 'msg': str(e)}, 500)


streaming_engine = None


async def ws_handler(websocket):
    """Streaming protocol (reference infer_server.py:103-156): binary PCM
    frames in, JSON {code, result} out; b'end' finishes the utterance.
    Concurrent connections each get a slot in the batched
    StreamingBatchEngine — one shared device state, no serialization."""
    slot = streaming_engine.open_stream()
    if slot is None:
        await websocket.send(json.dumps(
            {'code': 3, 'msg': 'server at capacity'}))
        return
    logger.info(f"websocket client connected (slot {slot})")
    try:
        async for message in websocket:
            if isinstance(message, str):
                message = message.encode()
            is_end = message == b'end'
            # the engine has its own internal lock; no predictor_lock needed
            result = streaming_engine.feed(
                slot, b'' if is_end else message, is_end=is_end)
            text = result['text']
            if args.use_pun and text:
                with predictor_lock:
                    text = predictor._restore_punctuation(text)
            await websocket.send(json.dumps(
                {'code': 0, 'result': text}, ensure_ascii=False))
            if is_end:
                streaming_engine.close_stream(slot)
                slot = streaming_engine.open_stream()
                if slot is None:
                    await websocket.send(json.dumps(
                        {'code': 3, 'msg': 'server at capacity'}))
                    break
    finally:
        if slot is not None:
            streaming_engine.close_stream(slot)
        logger.info("websocket client disconnected")


async def ws_main():
    import websockets
    async with websockets.serve(ws_handler, args.host, args.ws_port):
        logger.info(f"WebSocket streaming on ws://{args.host}:{args.ws_port}")
        await asyncio.Future()


if __name__ == '__main__':
    print_arguments(args=args)
    predictor = PPASRPredictor(configs=args.configs,
                               model_path=args.model_path,
                               decoder=args.decoder, use_pun=args.use_pun,
                               use_device_frontend=args.use_device_frontend)
    if predictor.streaming:
        from ppasr_tpu.serving import StreamingBatchEngine
        streaming_engine = StreamingBatchEngine(
            predictor, max_streams=args.max_streams)
    httpd = ThreadingHTTPServer((args.host, args.port), Handler)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    logger.info(f"HTTP endpoints on http://{args.host}:{args.port}"
                f" (/recognition, /recognition_long_audio)")
    asyncio.run(ws_main())
