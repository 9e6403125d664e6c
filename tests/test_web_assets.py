"""Web demo client assets + GUI script smoke coverage (reference ships
static/{index.css,record.js,record.png,recording.gif} + templates/index.html
used by infer_server.py's GET handler, and infer_gui.py as a desktop client).
"""
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_static_assets_present_and_sane():
    static = os.path.join(REPO, 'static')
    css = open(os.path.join(static, 'index.css')).read()
    assert '#rec_btn' in css and '.recording' in css
    png = open(os.path.join(static, 'record.png'), 'rb').read()
    assert png[:8] == b'\x89PNG\r\n\x1a\n' and len(png) > 100
    gif = open(os.path.join(static, 'recording.gif'), 'rb').read()
    assert gif[:6] in (b'GIF89a', b'GIF87a')
    # animated: more than one image descriptor
    assert gif.count(b'\x2c') >= 2


def test_template_references_resolve():
    html = open(os.path.join(REPO, 'templates', 'index.html')).read()
    for ref in re.findall(r'/static/([\w.]+)', html):
        assert os.path.exists(os.path.join(REPO, 'static', ref)), ref
    js = open(os.path.join(REPO, 'static', 'record.js')).read()
    for ref in re.findall(r'/static/([\w.]+)', js):
        assert os.path.exists(os.path.join(REPO, 'static', ref)), ref
    # the client drives the documented endpoints
    assert '/recognition' in js and 'WebSocket' in js


def test_infer_gui_imports_and_parses_args():
    """infer_gui parses args at module level; --help must exit 0 without
    needing tkinter, a display, or a model (import-level smoke)."""
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, 'infer_gui.py'), '--help'],
        capture_output=True, text=True, timeout=120,
        env={**os.environ, 'JAX_PLATFORMS': 'cpu',
             'PYTHONPATH': REPO})
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert 'use_server' in proc.stdout
