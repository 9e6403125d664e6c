"""Serialized StableHLO inference artifacts (jax.export).

The reference decouples training from inference through a static-graph
export — the predictor loads ``model.pdmodel`` and never imports model code
(SURVEY.md §3.3, ppasr/trainer.py:647-694). The TPU-native analog is a
``jax.export``-serialized computation: ``trainer.export(save_stablehlo=True)``
writes

- ``offline.stablehlo``  — ``get_encoder_out(params, speech[b, t, D],
  lens[b])`` with symbolic batch/time dims (t <= MAX_FRAMES keeps the
  positional-encoding bound provable), and
- ``chunk.stablehlo``    — one streaming ``get_encoder_out_chunk`` step at
  the standard decoding window, with the cache state flattened to a plain
  tuple of arrays at the export boundary (the reference fixes its streaming
  export spec the same way, conformer/model.py:186-206),

both lowered for CPU and TPU. ``InferencePredictor`` auto-loads them and
then serves with **no model code at all**: parameters are restored
structure-free from msgpack, the streaming state is an opaque tuple whose
zero template is rebuilt from the exported input specs, and the artifacts
contain only builtin pytree types.
"""
import os

import jax
import jax.numpy as jnp
import jax.tree_util as jtu

MAX_FRAMES = 16000         # 160 s at 10 ms shift; keeps T' under max_len 5000
OFFLINE_FILE = 'offline.stablehlo'
CHUNK_FILE = 'chunk.stablehlo'


def _specs(tree):
    return jax.tree.map(lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
                        tree)


def export_stablehlo(model, params, out_dir: str, use_model: str,
                     input_dim: int, chunk_window: int = 67,
                     chunk_cache: int = 64,
                     platforms=('cpu', 'tpu')) -> None:
    """Write offline + streaming-chunk StableHLO artifacts next to the
    msgpack params."""
    from jax import export as jexp
    p_spec = _specs(params)

    # t = 16·tb: with the time dim a multiple of 16 the subsampling (and
    # squeezeformer's U-Net reduce/recover) floordiv arithmetic simplifies
    # to provably-equal symbolic shapes; the serving side pads features to
    # a 16-frame multiple (lens-masked, so padding changes nothing).
    b, tb = jexp.symbolic_shape(
        "b, tb", constraints=(f"tb <= {MAX_FRAMES // 16}", "tb >= 2"))
    offline = jexp.export(
        jax.jit(lambda p, s, l: model.apply(p, s, l,
                                            method='get_encoder_out')),
        platforms=list(platforms))(
        p_spec,
        jax.ShapeDtypeStruct((b, 16 * tb, input_dim), jnp.float32),
        jax.ShapeDtypeStruct((b,), jnp.int32))
    with open(os.path.join(out_dir, OFFLINE_FILE), 'wb') as f:
        f.write(offline.serialize())

    # The state pytree (a model-defined NamedTuple) is flattened to a plain
    # tuple at the export boundary so the artifact only contains builtin
    # pytree types — deserialization then needs no type registration and
    # no model imports on the serving host.
    if use_model == 'deepspeech2':
        state = model.init_state(1)
        treedef = jtu.tree_structure(state)

        def chunk_fn(p, x, xl, st_leaves):
            st = jtu.tree_unflatten(treedef, list(st_leaves))
            probs, olens, new = model.apply(
                p, x, xl, st, method='get_encoder_out_chunk')
            return probs, olens, tuple(jtu.tree_leaves(new))

        chunk = jexp.export(jax.jit(chunk_fn), platforms=list(platforms))(
            p_spec,
            jax.ShapeDtypeStruct((1, chunk_window, input_dim), jnp.float32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
            tuple(_specs(leaf) for leaf in jtu.tree_leaves(state)))
    else:
        state = model.init_state(1, chunk_cache)
        treedef = jtu.tree_structure(state)

        def chunk_fn(p, x, st_leaves):
            st = jtu.tree_unflatten(treedef, list(st_leaves))
            probs, new = model.apply(p, x, st,
                                     method='get_encoder_out_chunk')
            return probs, tuple(jtu.tree_leaves(new))

        chunk = jexp.export(jax.jit(chunk_fn), platforms=list(platforms))(
            p_spec,
            jax.ShapeDtypeStruct((1, chunk_window, input_dim), jnp.float32),
            tuple(_specs(leaf) for leaf in jtu.tree_leaves(state)))
    with open(os.path.join(out_dir, CHUNK_FILE), 'wb') as f:
        f.write(chunk.serialize())


def load_exported(model_dir: str):
    """(offline Exported | None, chunk Exported | None)."""
    from jax import export as jexp
    out = []
    for name in (OFFLINE_FILE, CHUNK_FILE):
        path = os.path.join(model_dir, name)
        if os.path.exists(path):
            with open(path, 'rb') as f:
                out.append(jexp.deserialize(f.read()))
        else:
            out.append(None)
    return tuple(out)


def exported_arg(exp, index):
    """The index-th positional input subtree of an Exported, as avals."""
    args, _kwargs = jtu.tree_unflatten(exp.in_tree, list(exp.in_avals))
    return args[index]


def zero_state_from_exported(exp, state_index):
    """Rebuild the streaming-state template (zeros) from the exported
    input specs — no model code needed on the serving host."""
    return jax.tree.map(lambda a: jnp.zeros(a.shape, a.dtype),
                        exported_arg(exp, state_index))
