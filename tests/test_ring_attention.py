"""Ring attention (sequence parallelism) on the 8-device CPU mesh:
sharded == unsharded oracle; full layer stack with ring == without."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax.experimental.shard_map import shard_map
except ImportError:
    from jax.shard_map import shard_map

from unimoe_audio_tpu.ops.flash_attention import _reference_attention
from unimoe_audio_tpu.ops.ring_attention import ring_attention


def seq_mesh(n=8):
    return Mesh(np.array(jax.devices()[:n]), ("seq",))


@pytest.mark.parametrize("B,H,KV,T,pad", [(2, 4, 2, 64, 0), (1, 8, 2, 128, 5)])
def test_ring_matches_reference(B, H, KV, T, pad):
    Dh = 32
    ks = jax.random.split(jax.random.PRNGKey(T + pad), 3)
    q = jax.random.normal(ks[0], (B, H, T, Dh), jnp.float32) * 0.4
    k = jax.random.normal(ks[1], (B, KV, T, Dh), jnp.float32) * 0.4
    v = jax.random.normal(ks[2], (B, KV, T, Dh), jnp.float32)
    valid = jnp.ones((B, T), jnp.int32)
    if pad:
        valid = valid.at[0, :pad].set(0)  # left padding

    mesh = seq_mesh()
    fn = shard_map(
        lambda q_, k_, v_, val: ring_attention(
            q_, k_, v_, val, axis_name="seq", causal=True),
        mesh=mesh,
        in_specs=(P(None, None, "seq", None),) * 3 + (P(None, "seq"),),
        out_specs=P(None, None, "seq", None),
        check_rep=False,
    )
    got = jax.jit(fn)(q, k, v, valid)
    want = _reference_attention(q, k, v, valid, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-6)


def test_ring_full_stack_matches_unsharded():
    """text_model_forward with ring attention over an 8-way seq mesh ==
    the plain (full-sequence) forward."""
    from unimoe_audio_tpu.config import tiny_test_config
    from unimoe_audio_tpu.models.model import init_model_params, text_model_forward

    cfg = tiny_test_config().text_config
    params = init_model_params(
        jax.random.PRNGKey(0),
        __import__("unimoe_audio_tpu.config", fromlist=["x"]).tiny_test_config(),
        dtype=jnp.float32,
    )
    B, T = 2, 64
    emb = jax.random.normal(jax.random.PRNGKey(1), (B, T, cfg.hidden_size)) * 0.1
    pos = jnp.broadcast_to(jnp.arange(T)[None, None], (3, B, T))
    mask = jnp.ones((B, T), jnp.int32)

    base = text_model_forward(params, emb, pos, cfg, kv_valid_mask=mask)
    mesh = seq_mesh()
    ringed = jax.jit(
        lambda p, e: text_model_forward(
            p, e, pos, cfg, kv_valid_mask=mask, ring=(mesh, "seq"),
        ).last_hidden_state
    )(params, emb)
    np.testing.assert_allclose(
        np.asarray(ringed), np.asarray(base.last_hidden_state),
        rtol=3e-5, atol=3e-5,
    )


def test_ring_beyond_single_chunk_memory():
    """The ring path never builds a full [T, T] score block: per-step
    blocks are [Tc, Tc] = [T/p, T/p].  Verify numerics at a T where the
    per-device score chunk is 64x smaller than the full matrix."""
    B, H, KV, T, Dh = 1, 2, 2, 512, 32
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    q = jax.random.normal(ks[0], (B, H, T, Dh), jnp.float32) * 0.3
    k = jax.random.normal(ks[1], (B, KV, T, Dh), jnp.float32) * 0.3
    v = jax.random.normal(ks[2], (B, KV, T, Dh), jnp.float32)
    valid = jnp.ones((B, T), jnp.int32)
    mesh = seq_mesh()
    fn = shard_map(
        lambda q_, k_, v_, val: ring_attention(
            q_, k_, v_, val, axis_name="seq", causal=True),
        mesh=mesh,
        in_specs=(P(None, None, "seq", None),) * 3 + (P(None, "seq"),),
        out_specs=P(None, None, "seq", None),
        check_rep=False,
    )
    got = jax.jit(fn)(q, k, v, valid)
    want = _reference_attention(q, k, v, valid, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-6)


def test_ring_gradients_match_reference():
    """Ring attention differentiates (ppermute has a transpose rule):
    gradients match the unsharded oracle — sequence-parallel TRAINING."""
    B, H, KV, T, Dh = 1, 4, 2, 64, 32
    ks = jax.random.split(jax.random.PRNGKey(5), 4)
    q = jax.random.normal(ks[0], (B, H, T, Dh), jnp.float32) * 0.4
    k = jax.random.normal(ks[1], (B, KV, T, Dh), jnp.float32) * 0.4
    v = jax.random.normal(ks[2], (B, KV, T, Dh), jnp.float32)
    valid = jnp.ones((B, T), jnp.int32)
    co = jax.random.normal(ks[3], (B, H, T, Dh), jnp.float32)
    mesh = seq_mesh()

    ring_fn = shard_map(
        lambda q_, k_, v_, val: ring_attention(
            q_, k_, v_, val, axis_name="seq", causal=True),
        mesh=mesh,
        in_specs=(P(None, None, "seq", None),) * 3 + (P(None, "seq"),),
        out_specs=P(None, None, "seq", None),
        check_rep=False,
    )

    g_ring = jax.grad(lambda a, b, c: jnp.sum(ring_fn(a, b, c, valid) * co),
                      argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(lambda a, b, c: jnp.sum(
        _reference_attention(a, b, c, valid, True) * co), argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", g_ring, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-5, atol=3e-6, err_msg=f"d{name}")


def test_ring_train_step_gradient_equality():
    """train_step(ring=(mesh, 'seq')) == train_step without ring: loss and
    gradients match on the CPU mesh — long-context SP training is a flag
    (TrainerConfig.ring_axis), VERDICT r2 Next #9."""
    from unimoe_audio_tpu.config import tiny_test_config
    from unimoe_audio_tpu.models.model import init_model_params
    from unimoe_audio_tpu.train.step import loss_fn

    cfg = tiny_test_config()
    params = init_model_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    B, T, C = 2, 16, cfg.codec_channels
    rng = np.random.default_rng(0)
    codec = rng.integers(0, cfg.codec_eos_value, size=(B, T, C)).astype(np.int32)
    batch = {
        "input_ids": jnp.full((B, T), cfg.codec_placeholder_value, jnp.int32),
        "codec_input_ids": jnp.asarray(codec),
        "attention_mask": jnp.ones((B, T), jnp.int32),
        "codec_labels": jnp.asarray(codec),
    }
    mesh = seq_mesh()

    def run(ring):
        f = jax.jit(jax.value_and_grad(
            lambda p, b: loss_fn(p, cfg, b, jax.random.PRNGKey(1),
                                 jnp.float32(0.025), remat=False,
                                 ring=ring)[0]))
        return f(params, batch)

    loss0, g0 = run(None)
    loss1, g1 = run((mesh, "seq"))
    np.testing.assert_allclose(float(loss0), float(loss1), rtol=1e-5)
    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(g0)[0],
            jax.tree_util.tree_flatten_with_path(g1)[0]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-5, rtol=2e-4,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(pa)}")
