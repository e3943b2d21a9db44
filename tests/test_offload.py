"""Host-offloaded AdamW (train/offload.py): bit-parity with the optax
trainer path, chunked-moment bookkeeping, and the nan-skip guard.

On the virtual CPU mesh there is no pinned_host memory space, so moments
fall back to device residency — the math, chunking, and donation paths are
identical; the memory-kind placement itself is exercised on the real TPU
(bench.py deep-train section)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from unimoe_audio_tpu.config import tiny_test_config
from unimoe_audio_tpu.models.model import init_model_params
from unimoe_audio_tpu.train.offload import (
    OffloadAdamW, OffloadTrainer, _chunk_bounds,
)
from unimoe_audio_tpu.train.step import (
    init_train_state, make_optimizer, train_step,
)


def _batch(cfg, rng, B=2, T=8):
    codec = rng.integers(0, cfg.codec_eos_value, size=(B, T, cfg.codec_channels))
    return {
        "input_ids": np.full((B, T), cfg.codec_placeholder_value, np.int32),
        "codec_input_ids": codec.astype(np.int32),
        "attention_mask": np.ones((B, T), np.int32),
        "codec_labels": codec.astype(np.int32),
    }


def test_chunk_bounds():
    assert _chunk_bounds((8, 4), 10 ** 9) == [(0, 8)]
    bounds = _chunk_bounds((8, 1024), 8 * 1024)  # 32 KB fp32 -> 4 chunks
    assert bounds[0][0] == 0 and bounds[-1][1] == 8
    assert sum(b - a for a, b in bounds) == 8
    assert len(bounds) == 4


@pytest.mark.parametrize("weight_decay", [0.0, 0.1])
def test_offload_adamw_matches_optax(weight_decay):
    """3 offloaded chunked steps == 3 optax.adamw steps, same schedule,
    clip, decay mask, bias correction."""
    cfg = tiny_test_config()
    params = init_model_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    sched = optax.warmup_cosine_decay_schedule(0.0, 1e-3, 2, 10)
    opt = make_optimizer(learning_rate=1e-3, weight_decay=weight_decay,
                         warmup_steps=2, total_steps=10, grad_clip=1.0)
    state = init_train_state(params, opt)
    step_fn = jax.jit(lambda s, b, r: train_step(
        s, b, r, cfg=cfg, optimizer=opt, remat=False))

    off = OffloadAdamW(learning_rate=sched, weight_decay=weight_decay,
                       grad_clip=1.0, chunk_bytes=1 << 14)  # force chunking
    otr = OffloadTrainer(cfg, params, off, remat=False)
    # some leaves must actually be chunked for this test to mean anything
    n_chunked = sum(
        1 for leaf in jax.tree.leaves(otr.state.mu,
                                      is_leaf=lambda x: isinstance(x, list))
        if len(leaf) > 1)
    assert n_chunked >= 4

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(7)
    for i in range(3):
        b = _batch(cfg, rng)
        bj = {k: jnp.asarray(v) for k, v in b.items()}
        # identical rng per step for both paths
        state, m_ref = step_fn(state, bj, key)
        m_off = otr.train_step(bj, key, aux_weight=None)
        np.testing.assert_allclose(float(m_ref["loss"]), m_off["loss"],
                                   rtol=1e-6)

    # The two paths compile grad separately; Adam's per-element
    # normalization amplifies 1-ulp grad noise on near-zero elements, so
    # end-to-end parity is tolerance-based (bit-parity of the OPTIMIZER
    # math itself is asserted in test_offload_apply_matches_optax_update).
    ref_leaves = jax.tree_util.tree_flatten_with_path(state.params)[0]
    off_leaves = jax.tree_util.tree_flatten_with_path(otr.state.params)[0]
    for (pa, a), (pb, b) in zip(ref_leaves, off_leaves):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5,
            err_msg=f"param drift at {jax.tree_util.keystr(pa)}")


def test_offload_apply_matches_optax_update():
    """Same grads into both optimizers -> near-identical params and
    moments (isolates the AdamW math: clip, bias correction, decay mask,
    schedule, all in fp32)."""
    cfg = tiny_test_config()
    params = init_model_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    sched = optax.warmup_cosine_decay_schedule(0.0, 1e-3, 2, 10)
    opt = make_optimizer(learning_rate=1e-3, weight_decay=0.1,
                         warmup_steps=2, total_steps=10, grad_clip=1.0)
    opt_state = opt.init(params)
    off = OffloadAdamW(learning_rate=sched, weight_decay=0.1,
                       grad_clip=1.0, chunk_bytes=1 << 14)
    ostate = off.init_state(params)

    key = jax.random.PRNGKey(3)
    p_ref = params
    for i in range(3):
        key, k = jax.random.split(key)
        grads = jax.tree.map(
            lambda p: 3.0 * jax.random.normal(
                jax.random.fold_in(k, p.size), p.shape, p.dtype), p_ref)
        gnorm = optax.global_norm(grads)
        updates, opt_state = opt.update(grads, opt_state, p_ref)
        p_ref = optax.apply_updates(p_ref, updates)
        ostate = off.apply(ostate._replace(params=ostate.params), grads, gnorm)

    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(p_ref)[0],
            jax.tree_util.tree_flatten_with_path(ostate.params)[0]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-7, rtol=1e-6,
            err_msg=f"optimizer math drift at {jax.tree_util.keystr(pa)}")


def test_offload_nan_skips_apply():
    cfg = tiny_test_config()
    params = init_model_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    off = OffloadAdamW(learning_rate=1e-3)
    otr = OffloadTrainer(cfg, params, off, remat=False)
    rng = np.random.default_rng(0)
    bad = _batch(cfg, rng)
    emb = np.zeros(bad["input_ids"].shape + (cfg.text_config.hidden_size,),
                   np.float32)
    emb[0, 0, 0] = np.nan
    bad["inputs_embeds"] = emb
    before = jax.tree.map(np.asarray, otr.state.params)
    m = otr.train_step({k: jnp.asarray(v) for k, v in bad.items()},
                       jax.random.PRNGKey(0))
    assert m["skipped"] == 1.0
    assert int(otr.state.step) == 0
    jax.tree.map(np.testing.assert_array_equal, before,
                 jax.tree.map(np.asarray, otr.state.params))
