"""Dataset / collate / sampler / loader integration on a synthetic manifest."""
import json
import os

import numpy as np
import pytest

from ppasr_tpu.data.audio import AudioSegment
from ppasr_tpu.data.dataset import ASRDataset, collate_fn
from ppasr_tpu.data.loader import DataLoader
from ppasr_tpu.data.sampler import (SortagradBatchSampler,
                                    SortagradDistributedBatchSampler)

FIXTURE = "/root/reference/dataset/test.wav"


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    rng = np.random.default_rng(0)
    manifest_path = str(root / "manifest.train")
    vocab_path = str(root / "vocab.txt")
    entries = []
    durations = [0.6, 0.8, 1.0, 1.2, 1.4, 1.6]
    for i, dur in enumerate(durations):
        wav = str(root / f"a{i}.wav")
        seg = AudioSegment(
            rng.standard_normal(int(16000 * dur)).astype(np.float32) * 0.1,
            16000)
        seg.to_wav_file(wav)
        entries.append({"audio_filepath": wav, "duration": dur,
                        "text": "你好" if i % 2 else "测试"})
    with open(manifest_path, "w", encoding="utf-8") as f:
        for e in entries:
            f.write(json.dumps(e, ensure_ascii=False) + "\n")
    with open(vocab_path, "w", encoding="utf-8") as f:
        for tok in ["<blank>", "<unk>", "你", "好", "测", "试", "<eos>"]:
            f.write(f"{tok}\t1\n")
    return manifest_path, vocab_path


def test_dataset_getitem(tiny_dataset):
    manifest_path, vocab_path = tiny_dataset
    ds = ASRDataset(manifest_path, vocab_path,
                    preprocess_conf={"feature_method": "fbank", "n_mels": 80})
    assert len(ds) == 6
    feat, tokens = ds[0]
    assert feat.shape[1] == 80
    assert feat.dtype == np.float32
    assert tokens.tolist() in ([2, 3], [4, 5])
    assert ds.vocab_size == 7
    assert ds.feature_dim == 80


def test_collate_contract(tiny_dataset):
    manifest_path, vocab_path = tiny_dataset
    ds = ASRDataset(manifest_path, vocab_path,
                    preprocess_conf={"feature_method": "fbank", "n_mels": 80})
    items = [ds[i] for i in range(4)]
    inputs, labels, in_lens, lab_lens = collate_fn(items, time_bucket=16,
                                                   label_bucket=8,
                                                   shuffle=False)
    assert inputs.shape[0] == 4 and inputs.shape[2] == 80
    assert inputs.shape[1] % 16 == 0
    assert labels.shape[1] % 8 == 0
    assert in_lens.dtype == np.int64 and lab_lens.dtype == np.int64
    assert (labels[0, lab_lens[0]:] == -1).all()
    # padded region is zero
    assert np.allclose(inputs[0, in_lens[0]:], 0)


def test_sortagrad_sampler():
    s = SortagradBatchSampler(20, 4, sortagrad=True)
    s.set_epoch(0)
    batches = list(s)
    assert batches[0] == [0, 1, 2, 3]  # epoch 0: manifest (sorted) order
    s.set_epoch(1)
    shuffled = [i for b in s for i in b]
    assert sorted(set(shuffled)) == list(range(20))
    assert shuffled != list(range(20))


def test_distributed_sampler_partition():
    n, bs, world = 64, 4, 2
    # epoch 0 (sortagrad order): exact disjoint + complete partition
    all_indices = []
    for rank in range(world):
        s = SortagradDistributedBatchSampler(n, bs, num_replicas=world,
                                             rank=rank)
        s.set_epoch(0)
        mine = [i for b in s for i in b]
        assert len(mine) == n // world
        all_indices.extend(mine)
    assert sorted(all_indices) == list(range(n))
    # shuffled epoch: ranks stay disjoint and balanced (the clipped batch
    # shuffle may drop the shift remainder — reference sampler.py:74-105)
    per_rank = []
    for rank in range(world):
        s = SortagradDistributedBatchSampler(n, bs, num_replicas=world,
                                             rank=rank)
        s.set_epoch(3)
        per_rank.append([i for b in s for i in b])
    assert len(per_rank[0]) == len(per_rank[1])
    assert not (set(per_rank[0]) & set(per_rank[1]))


def test_loader_prefetch(tiny_dataset):
    manifest_path, vocab_path = tiny_dataset
    ds = ASRDataset(manifest_path, vocab_path,
                    preprocess_conf={"feature_method": "fbank", "n_mels": 80})
    sampler = SortagradBatchSampler(len(ds), 2, drop_last=False)
    loader = DataLoader(ds, sampler, num_workers=2)
    batches = list(loader)
    assert len(batches) == 3
    for inputs, labels, in_lens, lab_lens in batches:
        assert inputs.ndim == 3 and labels.ndim == 2
