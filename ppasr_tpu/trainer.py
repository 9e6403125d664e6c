"""Training orchestration.

Capability parity with reference ppasr/trainer.py (PPASRTrainer):
- create_data (:428-504): manifests → vocab → CMVN stats → optional binary.
- train (:506-590): seeded, epoch loop with sortagrad loaders, grad accum,
  LR schedule, per-interval ips/eta logging, checkpoints (epoch_N /
  last_model / best_model with rolling delete), auto-resume.
- evaluate (:592-645): greedy/beam decode + cer/wer.
- export (:647-694): inference artifact = params + config (the compiled jit
  functions are rebuilt at load; there is no separate static-graph format).

TPU-native: one jitted train step per (shape-bucket) that scans over
``accum_grad`` micro-batches; data parallelism via a jax.sharding mesh with
pjit-inserted gradient psum (no fleet/NCCL plumbing).
"""
import json
import os
import shutil
import time
from collections import Counter
from datetime import timedelta

import jax
import jax.numpy as jnp
import numpy as np

from flax import serialization

from ppasr_tpu.config import load_augmentation_config, load_config
from ppasr_tpu.data.dataset import ASRDataset
from ppasr_tpu.data.loader import DataLoader
from ppasr_tpu.data.manifest import (count_manifest, create_manifest,
                                     create_manifest_binary, create_noise,
                                     read_manifest)
from ppasr_tpu.data.normalizer import FeatureNormalizer
from ppasr_tpu.data.sampler import (SortagradBatchSampler,
                                    SortagradDistributedBatchSampler)
from ppasr_tpu.decoders.greedy import greedy_decoder_batch
from ppasr_tpu.models.factory import build_model
from ppasr_tpu.optimizer.factory import build_optimizer
from ppasr_tpu.train_state import (TrainState, create_train_state, data_mesh,
                                   make_train_step, replicate, shard_batch)
from ppasr_tpu.utils.common import dict_to_object, labels_to_string
from ppasr_tpu.utils.logger import setup_logger
from ppasr_tpu.utils.metrics import cer, wer

logger = setup_logger(__name__)


class PPASRTrainer:
    def __init__(self, configs, use_gpu: bool = True,
                 overwrites: str = None, data_augment_configs: str = None):
        """``configs``: YAML path or dict; ``use_gpu`` kept for CLI parity
        (device selection is JAX's)."""
        self.configs = load_config(configs) if not isinstance(configs, dict) \
            else dict_to_object(configs)
        if overwrites:
            for pair in overwrites.split(','):
                key, value = pair.split('=')
                self._overwrite(key.strip(), value.strip())
        self.use_model = self.configs.use_model
        self.streaming = bool(self.configs.get('streaming', True))
        self.feature_method = self.configs.preprocess_conf.get(
            'feature_method', 'fbank')
        self.augment_conf_path = data_augment_configs
        self.model_dir_name = (f"{self.use_model}"
                               f"{'_streaming' if self.streaming else ''}"
                               f"_{self.feature_method}")
        self.stop_train = False
        self.stop_eval = False

    def _overwrite(self, dotted_key, value):
        node = self.configs
        keys = dotted_key.split('.')
        for k in keys[:-1]:
            node = node[k]
        old = node.get(keys[-1])
        if isinstance(old, bool):
            value = value.lower() in ('true', '1')
        elif isinstance(old, int):
            value = int(value)
        elif isinstance(old, float):
            value = float(value)
        node[keys[-1]] = value

    # ------------------------------------------------------------- data prep

    def create_data(self, annotation_path: str = 'dataset/annotation/',
                    noise_dir: str = 'dataset/audio/noise',
                    num_samples: int = 5000, count_threshold: int = 2,
                    is_change_frame_rate: bool = True,
                    max_test_manifest: int = 10000,
                    only_keep_zh_en: bool = True):
        """Manifests → vocab → CMVN (reference trainer.py:428-504)."""
        dataset_conf = self.configs.dataset_conf
        create_manifest(annotation_path,
                        dataset_conf.train_manifest,
                        dataset_conf.test_manifest,
                        is_change_frame_rate=is_change_frame_rate,
                        target_sr=self.configs.preprocess_conf.sample_rate,
                        max_test_manifest=max_test_manifest,
                        only_keep_zh_en=only_keep_zh_en)
        if noise_dir and os.path.exists(noise_dir):
            create_noise(noise_dir, dataset_conf.noise_manifest_path,
                         target_sr=self.configs.preprocess_conf.sample_rate)
        # vocab: <blank>, <unk>, chars (count ≥ threshold), <eos>
        counter = Counter()
        count_manifest(counter, dataset_conf.train_manifest)
        tokens = [t for t, c in sorted(counter.items(),
                                       key=lambda kv: (-kv[1], kv[0]))
                  if c >= count_threshold]
        os.makedirs(os.path.dirname(dataset_conf.dataset_vocab) or '.',
                    exist_ok=True)
        with open(dataset_conf.dataset_vocab, 'w', encoding='utf-8') as f:
            f.write('<blank>\t-1\n<unk>\t-1\n')
            for t in tokens:
                f.write(f"{t}\t{counter[t]}\n")
            f.write('<eos>\t-1\n')
        logger.info(f"vocab size: {len(tokens) + 3}")
        # CMVN
        normalizer = FeatureNormalizer(dataset_conf.mean_istd_path)
        manifest = read_manifest(dataset_conf.train_manifest)
        normalizer.compute_mean_istd(dict(self.configs.preprocess_conf),
                                     manifest, num_samples=num_samples)
        if dataset_conf.get('manifest_type') == 'binary':
            create_manifest_binary(dataset_conf.train_manifest,
                                   dataset_conf.test_manifest)
        logger.info("create_data done")

    def extract_features(self, save_dir: str = 'dataset/features',
                         splits=('train', 'test')):
        """Pre-compute features into pooled .npy files + manifest_features
        lists (reference trainer.py:128-170): utterances are appended into
        one array until ~600 s of audio, then flushed; entries carry
        start_frame/end_frame slices. ``splits`` selects which manifests to
        process — extracting only the test split makes every subsequent
        per-epoch eval read mmap'd features instead of re-featurizing the
        whole test set on the (small) host each epoch."""
        manifests = {'train': self.configs.dataset_conf.train_manifest,
                     'test': self.configs.dataset_conf.test_manifest}
        for data_list_file in [manifests[s] for s in splits]:
            split = data_list_file.split('.')[-1]
            out_dir = os.path.join(save_dir, split, str(int(time.time())))
            os.makedirs(out_dir, exist_ok=True)
            dataset = ASRDataset(
                data_list_file, self.configs.dataset_conf.dataset_vocab,
                preprocess_conf=dict(self.configs.preprocess_conf),
                max_duration=-1, min_duration=0,
                manifest_type=self.configs.dataset_conf.get('manifest_type',
                                                            'txt'))
            save_data_list = data_list_file.replace('manifest',
                                                    'manifest_features')
            pooled, time_sum, file_idx = None, 0.0, 0
            save_path = os.path.join(out_dir, f'{file_idx}.npy')
            with open(save_data_list, 'w', encoding='utf-8') as f:
                for i in range(len(dataset)):
                    feature, _ = dataset[i]
                    entry = dataset.entry(i)
                    time_sum += entry.get('duration', 0)
                    if pooled is None:
                        pooled = feature
                    else:
                        pooled = np.concatenate([pooled, feature], axis=0)
                    f.write(json.dumps(
                        {'audio_filepath': save_path.replace('\\', '/'),
                         'duration': entry.get('duration', 0),
                         'text': entry['text'],
                         'start_frame': pooled.shape[0] - feature.shape[0],
                         'end_frame': pooled.shape[0]},
                        ensure_ascii=False) + '\n')
                    if time_sum > 600:
                        np.save(save_path, pooled)
                        pooled, time_sum = None, 0.0
                        file_idx += 1
                        save_path = os.path.join(out_dir, f'{file_idx}.npy')
                if pooled is not None:
                    np.save(save_path, pooled)
            logger.info(f"features for [{data_list_file}] written; new list: "
                        f"[{save_data_list}]")

    # ------------------------------------------------------------- builders

    def _build_dataset(self, train: bool, return_raw: bool = False,
                       manifest_override: str = None):
        dataset_conf = self.configs.dataset_conf
        aug_conf = load_augmentation_config(self.augment_conf_path) \
            if (train and self.augment_conf_path) else None
        manifest = manifest_override or (
            dataset_conf.train_manifest if train
            else dataset_conf.test_manifest)
        if not train and manifest_override is None:
            # prefer precomputed features for evaluation when present
            # (extract_features output: identical raw-fbank values, mmap
            # read instead of per-epoch host featurize of the whole test
            # set). Opt out with dataset_conf.use_precomputed_features=False.
            feat_manifest = manifest.replace('manifest', 'manifest_features')
            if feat_manifest != manifest and os.path.exists(feat_manifest) \
                    and dataset_conf.get('use_precomputed_features', True):
                logger.info(f"eval uses precomputed features: "
                            f"{feat_manifest}")
                manifest = feat_manifest
        # NOTE: CMVN is baked into the model (GlobalCMVN from
        # mean_istd_path, as in reference conformer/model.py:40-47);
        # the dataset yields raw features.
        return ASRDataset(
            manifest, dataset_conf.dataset_vocab,
            mean_istd_filepath=None,
            preprocess_conf=dict(self.configs.preprocess_conf),
            min_duration=dataset_conf.get('min_duration', 0.5),
            max_duration=dataset_conf.get('max_duration', 20) if train else -1,
            manifest_type=dataset_conf.get('manifest_type', 'txt'),
            augmentation_config=aug_conf, train=train,
            return_raw=return_raw)

    def _build_model(self, input_dim, vocab_size, dtype=None):
        if dtype is None:
            # enable_amp ⇒ bfloat16 activations (params stay f32; flax casts
            # per-module) — the TPU-native analogue of the reference's AMP
            # GradScaler path (trainer.py:218-220); no loss scaling is needed
            # since bf16 keeps the f32 exponent range.
            amp = bool(self.configs.get('train_conf', {}).get('enable_amp',
                                                              False))
            dtype = jnp.bfloat16 if amp else jnp.float32
        return build_model(self.use_model, input_dim, vocab_size,
                           streaming=self.streaming,
                           encoder_conf=dict(self.configs.get('encoder_conf',
                                                              {}) or {}),
                           decoder_conf=dict(self.configs.get('decoder_conf',
                                                              {}) or {}),
                           model_conf=dict(self.configs.get('model_conf',
                                                            {}) or {}),
                           mean_istd_path=self.configs.dataset_conf
                           .mean_istd_path,
                           dtype=dtype)

    def _init_params(self, model, input_dim, seed=1000):
        rng = jax.random.PRNGKey(seed)
        speech = jnp.zeros((1, 64, input_dim), jnp.float32)
        lens = jnp.asarray([64])
        text = jnp.asarray([[1, 2, -1]], jnp.int32)
        tlens = jnp.asarray([2])
        return model.init({'params': rng, 'dropout': rng, 'chunk': rng},
                          speech, lens, text, tlens, deterministic=False)

    # ----------------------------------------------------------- checkpoints

    def _save_dir(self, save_model_path):
        return os.path.join(save_model_path, self.model_dir_name)

    def _save_checkpoint(self, save_model_path, state: TrainState, epoch,
                         error_rate=None, test_loss=None, best=False):
        """model.msgpack + optimizer.msgpack + model.state JSON; rolling
        delete + last_model copy (reference trainer.py:302-328)."""
        base = self._save_dir(save_model_path)
        name = 'best_model' if best else f'epoch_{epoch}'
        path = os.path.join(base, name)
        try:
            os.makedirs(path, exist_ok=True)
            with open(os.path.join(path, 'model.msgpack'), 'wb') as f:
                f.write(serialization.to_bytes(
                    jax.device_get(state.params)))
            with open(os.path.join(path, 'optimizer.msgpack'), 'wb') as f:
                f.write(serialization.to_bytes(
                    jax.device_get(state.opt_state)))
            metric_key = 'test_cer' if self.configs.get(
                'metrics_type', 'cer') == 'cer' else 'test_wer'
            with open(os.path.join(path, 'model.state'), 'w',
                      encoding='utf-8') as f:
                json.dump({'last_epoch': epoch,
                           metric_key: error_rate,
                           'test_loss': test_loss,
                           'step': int(state.step)}, f)
            if not best:
                last = os.path.join(base, 'last_model')
                shutil.rmtree(last, ignore_errors=True)
                shutil.copytree(path, last)
                old = os.path.join(base, f'epoch_{epoch - 3}')
                shutil.rmtree(old, ignore_errors=True)
        except Exception as e:
            logger.error(f"checkpoint save failed: {e}")

    def _load_checkpoint(self, save_model_path, state: TrainState,
                         required: bool = False):
        """Auto-resume from last_model (reference trainer.py:277-299).

        Accepts either the models ROOT (``models/`` →
        ``models/<name>/last_model``) or a direct checkpoint dir that
        already contains ``model.msgpack`` (``models/<name>/best_model``,
        ``.../epoch_N`` — the reference CLI convention,
        export_model.py:16). ``required=True`` raises instead of silently
        returning the fresh init (evaluate/export must never run on random
        weights)."""
        if os.path.exists(os.path.join(save_model_path or '',
                                       'model.msgpack')):
            last = save_model_path
        else:
            last = os.path.join(self._save_dir(save_model_path),
                                'last_model')
        model_path = os.path.join(last, 'model.msgpack')
        if not os.path.exists(model_path):
            if required:
                raise FileNotFoundError(
                    f"no checkpoint found at {save_model_path!r} (looked "
                    f"for {model_path}); pass the models root or a "
                    f"checkpoint dir containing model.msgpack")
            return state, 0
        with open(model_path, 'rb') as f:
            params = serialization.from_bytes(state.params, f.read())
        opt_path = os.path.join(last, 'optimizer.msgpack')
        opt_state = state.opt_state
        if os.path.exists(opt_path):
            with open(opt_path, 'rb') as f:
                opt_state = serialization.from_bytes(state.opt_state,
                                                     f.read())
        last_epoch, step = 0, 0
        state_path = os.path.join(last, 'model.state')
        if os.path.exists(state_path):
            with open(state_path, 'r', encoding='utf-8') as f:
                meta = json.load(f)
            last_epoch = meta.get('last_epoch', 0)
            step = meta.get('step', 0)
        logger.info(f"resumed from {last} (epoch {last_epoch})")
        return TrainState(step=jnp.asarray(step, jnp.int32), params=params,
                          opt_state=opt_state), last_epoch

    def _load_pretrained(self, pretrained_model, params):
        """Shape-filtered partial load (reference trainer.py:257-275)."""
        if not pretrained_model:
            return params
        path = pretrained_model
        if os.path.isdir(path):
            path = os.path.join(path, 'model.msgpack')
        if not os.path.exists(path):
            logger.warning(f"pretrained model missing: {path}")
            return params
        with open(path, 'rb') as f:
            loaded = serialization.from_bytes(params, f.read())
        flat_cur = jax.tree_util.tree_leaves_with_path(params)
        flat_new = dict(jax.tree_util.tree_leaves_with_path(loaded))
        merged = []
        kept, skipped = 0, 0
        for keypath, cur in flat_cur:
            new = flat_new.get(keypath)
            if new is not None and new.shape == cur.shape:
                merged.append(new)
                kept += 1
            else:
                merged.append(cur)
                skipped += 1
        logger.info(f"pretrained load: {kept} kept, {skipped} skipped")
        treedef = jax.tree_util.tree_structure(params)
        return jax.tree_util.tree_unflatten(treedef, merged)

    # ----------------------------------------------------------------- train

    def train(self, save_model_path: str = 'models/',
              log_dir: str = 'log/', max_epoch: int = None,
              resume_model: str = None, pretrained_model: str = None):
        train_conf = self.configs.train_conf
        dataset_conf = self.configs.dataset_conf
        # TPU f32 matmuls default to bfloat16; 'float32'/'highest' trades
        # ~2-4× throughput for exact f32 (relevant for CER parity runs)
        precision = train_conf.get('matmul_precision')
        if precision:
            jax.config.update('jax_default_matmul_precision', precision)
        accum_grad = int(train_conf.get('accum_grad', 1))
        batch_size = int(dataset_conf.get('batch_size', 16))
        max_epoch = max_epoch or int(train_conf.get('max_epoch', 200))
        log_interval = int(train_conf.get('log_interval', 100))

        # device-frontend training (train_conf.device_frontend): the loader
        # yields raw padded waveforms and fbank + dither + SpecAugment run
        # inside the jitted train step (ops/frontend.py) — removes the host
        # featurize bottleneck (host fbank is ~10-30× slower than the chip
        # consumes features; no reference counterpart).
        device_frontend = bool(train_conf.get('device_frontend'))
        train_dataset = self._build_dataset(train=True,
                                            return_raw=device_frontend)
        test_dataset = self._build_dataset(train=False)
        vocab_size = train_dataset.vocab_size
        input_dim = train_dataset.feature_dim

        # train-subset CER probe (train_conf.train_probe_size, default 64):
        # a fixed, augmentation-free slice of the TRAIN manifest decoded
        # after every epoch. Separates "can't fit the training data" from
        # "doesn't generalize" — the test-set CER alone cannot (sum-CTC
        # train loss is uninterpretable across batches of varying length).
        probe_dataset = None
        probe_size = int(train_conf.get('train_probe_size', 64))
        if probe_size > 0 and \
                dataset_conf.get('manifest_type', 'txt') == 'txt':
            probe_dataset = self._build_dataset(
                train=False,
                manifest_override=dataset_conf.train_manifest)
            # evenly spaced over the duration-sorted manifest so the probe
            # spans short and long utterances
            stride = max(1, len(probe_dataset.manifest) // probe_size)
            probe_dataset.manifest = \
                probe_dataset.manifest[::stride][:probe_size]
        frontend = None
        if device_frontend:
            from ppasr_tpu.ops.frontend import make_device_frontend
            frontend = make_device_frontend(
                dict(self.configs.preprocess_conf),
                load_augmentation_config(self.augment_conf_path)
                if self.augment_conf_path else None,
                train=True)

        # multi-host: initialize the JAX distributed runtime when launched
        # under a coordinator (replaces fleet.init collective setup,
        # reference trainer.py:529-532); each host loads its own shard of
        # batches via the distributed sortagrad sampler.
        if os.environ.get('JAX_COORDINATOR_ADDRESS') and \
                jax.process_count() == 1:
            try:
                jax.distributed.initialize()
            except Exception as e:
                logger.warning(f"jax.distributed.initialize failed: {e}")
        nprocs = jax.process_count()
        rank = jax.process_index()

        # shard the batch over as many devices as divide it evenly
        import math
        n_data = math.gcd(batch_size, len(jax.devices()))
        mesh = data_mesh(jax.devices()[:max(n_data, 1)])

        # pad targets from manifest metadata (identical on every rank):
        # - pad_to_max: one static shape for the whole run — a single jit
        #   compile instead of one per (T, U) bucket (compiles through the
        #   device tunnel cost minutes; the padding waste is bounded by the
        #   duration filter)
        # - multi-process DP: ranks must agree on the GLOBAL batch shape
        #   for make_array_from_process_local_data, so the distributed
        #   sampler attaches a per-batch hint over the cross-rank batch
        pad_margin = 1.12 if train_dataset.augmentation is not None else 1.0

        sample_rate = int(self.configs.preprocess_conf.get('sample_rate',
                                                           16000))

        def entry_pad(i):
            e = train_dataset.entry(i)
            if device_frontend:  # raw mode pads samples, not frames
                t = int(math.ceil(float(e.get('duration', 0.0))
                                  * sample_rate * pad_margin)) + 64
            else:
                t = int(math.ceil(
                    float(e.get('duration', 0.0)) * 100.0 * pad_margin)) + 4
            return t, max(len(str(e.get('text', ''))), 1)

        const_pad = None
        if dataset_conf.get('pad_to_max'):
            pads = [entry_pad(i) for i in range(len(train_dataset))]
            const_pad = (max(p[0] for p in pads), max(p[1] for p in pads))
            logger.info(f"pad_to_max: all batches pad to frames/labels "
                        f"{const_pad}")

        def pad_hint_fn(global_indices):
            pads = [entry_pad(i) for i in global_indices]
            return (max(p[0] for p in pads), max(p[1] for p in pads))

        if nprocs > 1:
            sampler = SortagradDistributedBatchSampler(
                len(train_dataset), batch_size * accum_grad,
                num_replicas=nprocs, rank=rank, drop_last=True,
                pad_hint_fn=None if const_pad else pad_hint_fn)
        else:
            sampler = SortagradBatchSampler(
                len(train_dataset), batch_size * accum_grad, drop_last=True)
        loader = DataLoader(train_dataset, sampler,
                            num_workers=int(dataset_conf.get('num_workers',
                                                             4)),
                            time_bucket=64, label_bucket=16,
                            pad_to=const_pad)

        model = self._build_model(input_dim, vocab_size)
        params = self._init_params(model, input_dim)
        # shape/param-count probe at train start (reference trainer.py:213-217)
        from ppasr_tpu.utils.model_summary import summary
        summary(params)
        params = self._load_pretrained(pretrained_model, params)
        tx, schedule = build_optimizer(
            dict(self.configs.get('optimizer_conf', {}) or {}),
            grad_clip=float(train_conf.get('grad_clip', 5.0)))
        state = create_train_state(params, tx)
        state, last_epoch = self._load_checkpoint(
            resume_model or save_model_path, state)
        state = replicate(mesh, state)

        train_step = jax.jit(make_train_step(model, tx, accum_grad,
                                             frontend=frontend),
                             donate_argnums=0)
        # rbg (hardware RngBitGenerator) for the per-step dropout/chunk keys:
        # the default threefry PRNG generates the ~600M dropout mask bits per
        # step in software and costs as much as the whole fwd+bwd at this
        # model size (34 ms of a 68 ms step on v5e). Param init above keeps
        # threefry so existing checkpoints stay reproducible.
        rng = jax.random.key(1000, impl='rbg')

        writer = None
        try:
            from tensorboardX import SummaryWriter
            writer = SummaryWriter(log_dir)
        except Exception:
            pass

        # jax.profiler trace window (SURVEY.md §5.1): set
        # train_conf.profile_steps: [start, stop] to capture a device trace
        # into <log_dir>/profile for tensorboard's profile plugin.
        profile_steps = train_conf.get('profile_steps') or None
        profiling = False

        # restore the best metric across resumes so a worse first epoch
        # after restart cannot overwrite best_model
        best_error = float('inf')
        best_state_path = os.path.join(self._save_dir(save_model_path),
                                       'best_model', 'model.state')
        if os.path.exists(best_state_path):
            try:
                with open(best_state_path, 'r', encoding='utf-8') as f:
                    meta = json.load(f)
                best_error = meta.get('test_cer',
                                      meta.get('test_wer', float('inf')))
                if best_error is None:
                    best_error = float('inf')
            except Exception:
                pass

        train_times = []
        for epoch in range(last_epoch, max_epoch):
            sampler.set_epoch(epoch)
            epoch_start = time.time()
            batch_start = time.time()
            for batch_id, (inputs, labels, in_lens, lab_lens) in \
                    enumerate(loader):
                reader_cost = time.time() - batch_start
                n = inputs.shape[0]
                micro = n // accum_grad
                if micro == 0:
                    continue
                usable = micro * accum_grad
                in_key, len_key = ('wav', 'wav_lens') if device_frontend \
                    else ('speech', 'speech_lens')
                batch = {
                    in_key: inputs[:usable].reshape(
                        accum_grad, micro, *inputs.shape[1:]),
                    len_key: in_lens[:usable].reshape(accum_grad,
                                                      micro),
                    'text': labels[:usable].reshape(accum_grad, micro,
                                                    -1),
                    'text_lens': lab_lens[:usable].reshape(accum_grad,
                                                           micro),
                }
                batch = shard_batch(mesh, jax.tree.map(jnp.asarray, batch),
                                    batch_axis=1)
                if profile_steps:
                    step_now = int(state.step)
                    if not profiling and step_now >= int(profile_steps[0]) \
                            and step_now < int(profile_steps[1]):
                        jax.profiler.start_trace(
                            os.path.join(log_dir, 'profile'))
                        profiling = True
                    elif profiling and step_now >= int(profile_steps[1]):
                        jax.profiler.stop_trace()
                        profiling = False
                        profile_steps = None  # one capture per run
                        logger.info("profiler trace written to "
                                    f"{os.path.join(log_dir, 'profile')}")
                rng, step_rng = jax.random.split(rng)
                state, metrics = train_step(state, batch, step_rng)
                batch_cost = time.time() - batch_start
                train_times.append(batch_cost)

                if batch_id % log_interval == 0:
                    loss = float(metrics['loss'])
                    lr = float(schedule(int(state.step)))
                    # ips in audio-seconds/sec (frames are 10 ms; raw
                    # lens are samples)
                    audio_sec = float(np.sum(in_lens[:usable])) / (
                        sample_rate if device_frontend else 100.0)
                    ips = audio_sec / max(batch_cost, 1e-9)
                    eta = timedelta(seconds=int(
                        np.mean(train_times)
                        * (len(loader) - batch_id)
                        * (max_epoch - epoch)))
                    logger.info(
                        f"epoch {epoch} batch {batch_id}/{len(loader)} "
                        f"loss {loss:.4f} lr {lr:.8f} "
                        f"reader_cost {reader_cost:.3f}s "
                        f"batch_cost {batch_cost:.3f}s "
                        f"ips {ips:.2f} audio-s/s eta {eta}")
                    if writer:
                        writer.add_scalar('Train/Loss', loss,
                                          int(state.step))
                        writer.add_scalar('Train/lr', lr, int(state.step))
                    train_times = []
                # mid-epoch checkpoint every 10k batches
                # (reference trainer.py:424-425)
                if batch_id > 0 and batch_id % 10000 == 0 and rank == 0:
                    self._save_checkpoint(save_model_path,
                                          jax.device_get(state), epoch)
                if self.stop_train:
                    break
                batch_start = time.time()

            logger.info(f"epoch {epoch} done in "
                        f"{timedelta(seconds=int(time.time()-epoch_start))}")
            error_rate, test_loss = self.evaluate(
                resume_model=None, state=state, model=model,
                test_dataset=test_dataset, sample_log_n=2)
            metric_name = self.configs.get('metrics_type', 'cer')
            logger.info(f"epoch {epoch} test {metric_name}={error_rate:.5f} "
                        f"loss={test_loss:.5f}")
            if probe_dataset is not None:
                train_err, train_probe_loss = self.evaluate(
                    resume_model=None, state=state, model=model,
                    test_dataset=probe_dataset, sample_log_n=2)
                logger.info(f"epoch {epoch} train-probe "
                            f"{metric_name}={train_err:.5f} "
                            f"loss={train_probe_loss:.5f}")
                if writer:
                    writer.add_scalar(f'Train/{metric_name}', train_err,
                                      int(state.step))
            if writer:
                writer.add_scalar(f'Test/{metric_name}', error_rate,
                                  int(state.step))
                writer.add_scalar('Test/Loss', test_loss, int(state.step))
            if rank == 0:  # only the coordinator writes checkpoints
                host_state = jax.device_get(state)
                self._save_checkpoint(save_model_path, host_state,
                                      epoch + 1, error_rate, test_loss)
                if error_rate < best_error:
                    best_error = error_rate
                    self._save_checkpoint(save_model_path, host_state,
                                          epoch + 1, error_rate, test_loss,
                                          best=True)
            if self.stop_train:
                break
        return state

    def _build_eval_decoder(self, vocab, model=None):
        """ctc_beam_search with graceful greedy fallback (reference
        trainer.py:330-352). Backend 'jax' (default) runs the search on
        device; 'host' runs the numpy decoder (full n-gram backoff).
        'attention_rescoring' (beyond-reference) additionally rescores the
        beam with the model's attention decoder on device."""
        name = self.configs.get('decoder', 'ctc_greedy')
        if name == 'attention_rescoring':
            conf = dict(self.configs.get('ctc_beam_search_decoder_conf', {})
                        or {})
            conf.pop('backend', None)
            model_conf = dict(self.configs.get('model_conf', {}) or {})
            ctc_weight = conf.pop('rescore_ctc_weight',
                                  model_conf.get('ctc_weight', 0.3))
            max_hyp_len = conf.pop('max_hyp_len', 200)
            try:
                if model is None or self.use_model == 'deepspeech2':
                    raise ValueError(
                        f"{self.use_model} has no attention decoder")
                from ppasr_tpu.decoders.rescoring import \
                    AttentionRescoringDecoder
                return AttentionRescoringDecoder(
                    model, vocab, ctc_weight=ctc_weight,
                    max_hyp_len=max_hyp_len, **conf)
            except Exception as e:
                logger.warning(f"attention rescoring unavailable ({e}); "
                               f"using greedy")
                return None
        if name != 'ctc_beam_search':
            return None
        conf = dict(self.configs.get('ctc_beam_search_decoder_conf', {})
                    or {})
        backend = conf.pop('backend', 'jax')
        lm = conf.get('language_model_path')
        if backend == 'jax' and lm and str(lm).endswith('.klm') \
                and os.path.exists(lm):
            # .klm n-grams are hash-keyed — not enumerable into the
            # on-device tables; the native C++ backend parses the binary
            logger.info(".klm language model: using the native host "
                        "beam-search backend")
            backend = 'native'
        try:
            if backend == 'host':
                from ppasr_tpu.decoders.beam_search import BeamSearchDecoder
                return BeamSearchDecoder(vocab_list=vocab, **conf)
            if backend == 'native':
                from ppasr_tpu.decoders.native import NativeBeamSearchDecoder
                return NativeBeamSearchDecoder(vocab_list=vocab, **conf)
            from ppasr_tpu.decoders.beam_search_jax import JaxBeamSearchDecoder
            return JaxBeamSearchDecoder(vocab_list=vocab, **conf)
        except Exception as e:
            logger.warning(f"beam search unavailable ({e}); using greedy")
            return None

    # -------------------------------------------------------------- evaluate

    def _streaming_encode_batch(self, model, params, inputs, in_lens,
                                chunk: int = 16, left_chunks: int = 16):
        """models/streaming_eval.streaming_encode_batch with the jitted
        chunk step cached on the trainer (evaluate runs once per epoch;
        a fresh lambda would force a full retrace each call)."""
        from ppasr_tpu.models.streaming_eval import (make_chunk_fn,
                                                     streaming_encode_batch)
        if getattr(self, '_eval_chunk_model', None) is not model:
            self._eval_chunk_model = model
            self._eval_chunk_fn = make_chunk_fn(model)
        return streaming_encode_batch(model, params, inputs, in_lens,
                                      chunk=chunk, left_chunks=left_chunks,
                                      chunk_fn=self._eval_chunk_fn)

    def evaluate(self, resume_model: str = 'models/', state=None, model=None,
                 test_dataset=None, display_result: bool = False,
                 max_batches: int = None, sample_log_n: int = 0,
                 streaming_eval: bool = False):
        """Greedy-decode the test set and compute cer/wer
        (reference trainer.py:592-645). Returns (error_rate, loss).
        ``sample_log_n``: log the first N ref/hyp pairs (per-epoch decode
        sampling during training without display_result's full dump).
        ``streaming_eval``: encode through the chunked-streaming path
        (_streaming_encode_batch) instead of full-context — measures the
        CER a live streaming session would see (the reference's streaming
        models are its headline feature, predict.py:232-337)."""
        dataset_conf = self.configs.dataset_conf
        if test_dataset is None:
            test_dataset = self._build_dataset(train=False)
        vocab = test_dataset.vocab_list
        if model is None:
            model = self._build_model(test_dataset.feature_dim,
                                      test_dataset.vocab_size)
        if state is None:
            params = self._init_params(model, test_dataset.feature_dim)
            tx, _ = build_optimizer(
                dict(self.configs.get('optimizer_conf', {}) or {}))
            state = create_train_state(params, tx)
            state, _ = self._load_checkpoint(resume_model, state,
                                             required=True)
        params = state.params

        # eval holds no optimizer/grad memory and the on-device beam scan's
        # per-step cost amortizes strongly over lanes (measured 1.65k →
        # 4.2k audio-s/s going B=16 → 64 on v5e), so evaluation defaults to
        # 4× the train batch unless eval_batch_size pins it explicitly
        batch_size = int(dataset_conf.get(
            'eval_batch_size', 4 * int(dataset_conf.get('batch_size', 16))))
        sampler = SortagradBatchSampler(len(test_dataset), batch_size,
                                        drop_last=False, shuffle=False)
        pad_to = None
        if dataset_conf.get('pad_to_max'):
            import math as _m
            pads = [(int(_m.ceil(float(test_dataset.entry(i).get(
                'duration', 0.0)) * 100.0)) + 4,
                max(len(str(test_dataset.entry(i).get('text', ''))), 1))
                for i in range(len(test_dataset))]
            pad_to = (max(p[0] for p in pads), max(p[1] for p in pads))
        loader = DataLoader(test_dataset, sampler, num_workers=2,
                            shuffle_in_batch=False, pad_to=pad_to)

        # cache the jitted eval programs on the trainer: evaluate() runs
        # once per epoch and fresh lambdas would force a full retrace each
        # time (compiles cost minutes through the device tunnel)
        if getattr(self, '_eval_model', None) is not model:
            self._eval_model = model
            self._eval_fn = jax.jit(lambda p, s, l: model.apply(
                p, s, l, method='get_encoder_out'))
            # softmax-free variant for the on-device beam backend: CTC
            # logits go straight into candidate precompute (the f32
            # [B,T,V] posterior never materializes)
            self._eval_logits_fn = jax.jit(lambda p, s, l: model.apply(
                p, s, l, method='get_encoder_logits')) \
                if hasattr(model, 'get_encoder_logits') else None
            self._eval_loss_fn = jax.jit(lambda p, s, l, t, tl: model.apply(
                p, s, l, t, tl, deterministic=True)['loss'])
            self._eval_rescore_fn = jax.jit(lambda p, s, l: model.apply(
                p, s, l, method='encode_for_rescore')) \
                if hasattr(model, 'encode_for_rescore') else None
            self._eval_decoder = None
        eval_fn = self._eval_fn
        loss_fn = self._eval_loss_fn

        metrics_type = self.configs.get('metrics_type', 'cer')
        error_fn = cer if metrics_type == 'cer' else wer
        if self._eval_decoder is None:
            self._eval_decoder = self._build_eval_decoder(vocab, model)
        decoder = self._eval_decoder
        rescoring = (decoder is not None
                     and getattr(decoder, 'needs_encoder_out', False)
                     and self._eval_rescore_fn is not None)
        from_logits = (not rescoring and self._eval_logits_fn is not None
                       and hasattr(decoder, 'decode_batch_from_logits'))
        if streaming_eval:
            if self.use_model == 'deepspeech2' or \
                    not hasattr(model, 'init_state'):
                raise NotImplementedError(
                    "streaming_eval drives the attention-family chunk API "
                    "(get_encoder_out_chunk with a ring-cache "
                    "StreamingState); use the Predictor's predict_stream "
                    "for deepspeech2")
            rescoring = False
            from_logits = False
        errors, losses = [], []
        for i, (inputs, labels, in_lens, lab_lens) in enumerate(loader):
            if max_batches is not None and i >= max_batches:
                break
            encoder_out = None
            stream_results = None
            if streaming_eval:
                if decoder is None:
                    # greedy: per-window device argmax — one fixed-shape
                    # compiled program for all batches/window counts (a
                    # [B,T',V] probs concat costs a fresh tunnel compile
                    # per distinct window count)
                    from ppasr_tpu.decoders.greedy import _collapse
                    from ppasr_tpu.models.streaming_eval import (
                        make_chunk_argmax_fn, streaming_greedy_batch)
                    if getattr(self, '_eval_chunk_argmax_model', None) \
                            is not model:
                        self._eval_chunk_argmax_model = model
                        self._eval_chunk_argmax_fn = \
                            make_chunk_argmax_fn(model)
                    ids, mp, olens = streaming_greedy_batch(
                        model, params, inputs, in_lens,
                        argmax_fn=self._eval_chunk_argmax_fn)
                    stream_results = [
                        _collapse(ids[b, :int(olens[b])],
                                  mp[b, :int(olens[b])], vocab)
                        for b in range(ids.shape[0])]
                else:
                    probs, olens = self._streaming_encode_batch(
                        model, params, inputs, in_lens)
            elif rescoring:
                encoder_out, probs, olens = self._eval_rescore_fn(
                    params, jnp.asarray(inputs), jnp.asarray(in_lens))
            elif from_logits:
                probs, olens = self._eval_logits_fn(
                    params, jnp.asarray(inputs), jnp.asarray(in_lens))
            else:
                probs, olens = eval_fn(params, jnp.asarray(inputs),
                                       jnp.asarray(in_lens))
            losses.append(float(loss_fn(params, jnp.asarray(inputs),
                                        jnp.asarray(in_lens),
                                        jnp.asarray(labels),
                                        jnp.asarray(lab_lens))))
            if stream_results is not None:
                results = stream_results
            elif rescoring:
                results = decoder.decode_batch_rescore(
                    params, encoder_out, probs, np.asarray(olens))
            elif from_logits:
                results = decoder.decode_batch_from_logits(
                    probs, np.asarray(olens))
            elif decoder is not None and not getattr(
                    decoder, 'needs_encoder_out', False):
                # device arrays pass through as-is: the JAX decoder keeps
                # the [B,T,V] posteriors on device, host decoders convert
                results = decoder.decode_batch(probs, np.asarray(olens))
            else:
                results = greedy_decoder_batch(probs,
                                               np.asarray(olens), vocab)
            for b, (score, text) in enumerate(results):
                target = labels_to_string(labels[b][:int(lab_lens[b])],
                                          vocab)
                e = error_fn(text, target)
                if display_result or len(errors) < sample_log_n:
                    logger.info(f"ref: {target} | hyp: {text} | "
                                f"{metrics_type}: {e:.4f}")
                errors.append(e)
            if self.stop_eval:
                break
        error_rate = float(np.mean(errors)) if errors else float('inf')
        test_loss = float(np.mean(losses)) if losses else float('inf')
        return error_rate, test_loss

    # ---------------------------------------------------------------- export

    def export(self, save_model_path: str = 'models/',
               resume_model: str = None, save_quant: bool = False,
               save_stablehlo: bool = False):
        """Write the inference artifact: params + inference config JSON
        (reference trainer.py:647-694; jit replaces static graphs).
        ``save_quant`` additionally writes an int8 weight-quantized artifact
        (reference PaddleSlim post-quant, trainer.py:684-694).
        ``save_stablehlo`` additionally serializes the offline + streaming
        computations with jax.export — the InferencePredictor then serves
        them without model code, the analog of the reference's pdmodel
        static graph (see infer_utils/stablehlo_export.py)."""
        test_dataset = self._build_dataset(train=False)
        model = self._build_model(test_dataset.feature_dim,
                                  test_dataset.vocab_size)
        params = self._init_params(model, test_dataset.feature_dim)
        tx, _ = build_optimizer(
            dict(self.configs.get('optimizer_conf', {}) or {}))
        state = create_train_state(params, tx)
        state, _ = self._load_checkpoint(resume_model or save_model_path,
                                         state, required=True)
        infer_dir = os.path.join(self._save_dir(save_model_path), 'infer')
        os.makedirs(infer_dir, exist_ok=True)
        # bundle CMVN stats + vocab so the artifact is self-contained
        # (serving hosts don't have the training workspace)
        for src in [self.configs.dataset_conf.mean_istd_path,
                    self.configs.dataset_conf.dataset_vocab]:
            if src and os.path.exists(src):
                shutil.copy(src, os.path.join(infer_dir,
                                              os.path.basename(src)))
        host_params = jax.device_get(state.params)
        with open(os.path.join(infer_dir, 'model.msgpack'), 'wb') as f:
            f.write(serialization.to_bytes(host_params))
        if save_quant:
            from ppasr_tpu.utils.quant import quantize_params
            blob = quantize_params(host_params)
            with open(os.path.join(infer_dir, 'model_quant.msgpack'),
                      'wb') as f:
                f.write(serialization.to_bytes(blob))
            logger.info("int8 weight-quantized artifact written")
        if save_stablehlo:
            from ppasr_tpu.infer_utils.stablehlo_export import \
                export_stablehlo
            export_stablehlo(model, state.params, infer_dir, self.use_model,
                             test_dataset.feature_dim)
            logger.info("StableHLO artifacts written (offline + chunk)")
        with open(os.path.join(infer_dir, 'inference.json'), 'w',
                  encoding='utf-8') as f:
            json.dump({'use_model': self.use_model,
                       'streaming': self.streaming,
                       'input_dim': test_dataset.feature_dim,
                       'vocab_size': test_dataset.vocab_size,
                       'encoder_conf': dict(self.configs.get('encoder_conf',
                                                             {}) or {}),
                       'decoder_conf': dict(self.configs.get('decoder_conf',
                                                             {}) or {}),
                       'model_conf': dict(self.configs.get('model_conf', {})
                                          or {})}, f, indent=2)
        logger.info(f"exported inference artifact to {infer_dir}")
        return infer_dir
