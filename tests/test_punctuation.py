"""Punctuation pipeline: train on a structured corpus → predictor restores
marks (the tools/train_punctuation.py → PunctuationPredictor contract)."""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope='module')
def pun_model_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp('pun')
    corpus = root / 'corpus.txt'
    import random
    random.seed(0)
    base = ['今天天气很好', '我们去公园玩', '你吃饭了吗', '这是什么',
            '太好了', '明天见', '请坐下', '谢谢你的帮助', '他在看书']
    lines = []
    for _ in range(250):
        a, b, c = random.sample(base, 3)
        q = '吗' in b or '什么' in b
        lines.append(f'{a}，{b}{"？" if q else "。"}{c}。')
    corpus.write_text('\n'.join(lines), encoding='utf-8')
    out = root / 'models'
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, 'tools/train_punctuation.py'),
         '--corpus', str(corpus), '--output_dir', str(out),
         '--epochs', '12', '--dim', '64', '--layers', '2',
         '--batch_size', '32', '--marks', '，。？'],
        capture_output=True, text=True,
        env=dict(os.environ, JAX_PLATFORMS='cpu', PYTHONPATH=REPO))
    assert r.returncode == 0, r.stderr[-2000:]
    return str(out)


def test_punctuation_restoration(pun_model_dir):
    from ppasr_tpu.infer_utils.pun_predictor import PunctuationPredictor
    pun = PunctuationPredictor(pun_model_dir)
    out = pun('今天天气很好我们去公园玩太好了')
    assert '，' in out and out.replace('，', '').replace('。', '') == \
        '今天天气很好我们去公园玩太好了'
    # the clause boundary after the question particle gets some mark
    # (which mark is a linguistic call the tiny model may get wrong)
    out_q = pun('他在看书你吃饭了吗明天见')
    assert out_q[out_q.index('吗') + 1] in '，。？'
    # existing punctuation is stripped before re-inserting (reference
    # pun_predictor.py:62-70)
    assert pun('今天天气很好，我们去公园玩。太好了') == \
        pun('今天天气很好我们去公园玩太好了')


def test_packaged_pretrained_artifact_out_of_box():
    """A pretrained artifact ships with the package (reference users get a
    downloaded pretrained model — pun_predictor.py:15-60): the default
    PunctuationPredictor() must restore marks with no training step and no
    explicit model_dir."""
    from ppasr_tpu.infer_utils.pun_predictor import (PunctuationPredictor,
                                                     packaged_pun_model_dir)
    assert os.path.exists(os.path.join(packaged_pun_model_dir(),
                                       'pun_model.msgpack'))
    pun = PunctuationPredictor()  # default dir absent → packaged fallback
    # in-domain text (the artifact is trained on the project's zh docs)
    out = pun('首先安装所有的依赖环境然后准备好数据就可以开始训练了')
    assert out != '首先安装所有的依赖环境然后准备好数据就可以开始训练了'
    assert any(m in out for m in '，。？！、；：')
    # idempotent over pre-punctuated input
    assert pun(out) == out
