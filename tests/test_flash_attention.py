"""Flash-attention Pallas kernel tests (interpret mode on CPU): exactness
vs a reference attention, causal + padding masks, GQA mapping, odd lengths."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from unimoe_audio_tpu.ops.flash_attention import flash_attention


def ref_attn(q, k, v, kv_valid, causal=True):
    """Oracle.  Fully-masked query rows output 0 (the kernel's convention —
    padding rows must not propagate a uniform-softmax average of V)."""
    B, H, T, Dh = q.shape
    KV, S = k.shape[1], k.shape[2]
    g = H // KV
    kk = jnp.repeat(k, g, axis=1)
    vv = jnp.repeat(v, g, axis=1)
    s = jnp.einsum("bhtd,bhsd->bhts", q.astype(jnp.float32), kk.astype(jnp.float32)) * Dh ** -0.5
    allowed = jnp.broadcast_to(kv_valid[:, None, None, :] > 0, s.shape)
    if causal:
        allowed = allowed & jnp.tril(jnp.ones((T, S), bool), k=S - T)[None, None]
    s = jnp.where(allowed, s, -1e30)
    p = jax.nn.softmax(s, -1)
    p = jnp.where(jnp.any(allowed, axis=-1, keepdims=True), p, 0)
    return jnp.einsum("bhts,bhsd->bhtd", p, vv.astype(jnp.float32)).astype(q.dtype)


@pytest.mark.parametrize(
    "B,H,KV,T,causal",
    [(1, 4, 2, 128, True), (2, 4, 4, 256, True), (1, 8, 2, 200, True),
     (1, 4, 2, 128, False)],
)
def test_flash_matches_reference(B, H, KV, T, causal):
    Dh = 128
    ks = jax.random.split(jax.random.PRNGKey(T + H), 4)
    q = jax.random.normal(ks[0], (B, H, T, Dh), dtype=jnp.float32) * 0.5
    k = jax.random.normal(ks[1], (B, KV, T, Dh), dtype=jnp.float32) * 0.5
    v = jax.random.normal(ks[2], (B, KV, T, Dh), dtype=jnp.float32)
    valid = jnp.ones((B, T), jnp.int32).at[:, -5:].set(0)
    got = flash_attention(q, k, v, valid, causal=causal, interpret=True)
    want = ref_attn(q, k, v, valid, causal=causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5)


def test_flash_left_padding_mask():
    """Left-padded rows (the tokenizer's padding_side='left') must not leak."""
    B, H, KV, T, Dh = 2, 4, 2, 128, 128
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, H, T, Dh), dtype=jnp.float32)
    k = jax.random.normal(ks[1], (B, KV, T, Dh), dtype=jnp.float32)
    v = jax.random.normal(ks[2], (B, KV, T, Dh), dtype=jnp.float32)
    valid = jnp.ones((B, T), jnp.int32).at[0, :11].set(0)
    got = flash_attention(q, k, v, valid, interpret=True)
    want = ref_attn(q, k, v, valid)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize(
    "B,H,KV,T,causal,pad",
    [
        (1, 4, 2, 128, True, 0),    # GQA, causal
        (1, 4, 4, 128, False, 0),   # MHA, non-causal
        (2, 4, 2, 200, True, 7),    # odd length (block padding) + key padding
        (1, 8, 2, 128, True, 5),    # groups=4 + key padding
    ],
)
def test_flash_gradients_match_reference(B, H, KV, T, causal, pad):
    """Fused Pallas backward (dq/dk/dv kernels) == gradients of the
    reference attention — exact math incl. causal/padding masks and GQA
    group-summing (the training path at T>=128 differentiates through
    flash)."""
    Dh = 128
    ks = jax.random.split(jax.random.PRNGKey(9 + T + H + pad), 4)
    q = jax.random.normal(ks[0], (B, H, T, Dh), dtype=jnp.float32) * 0.3
    k = jax.random.normal(ks[1], (B, KV, T, Dh), dtype=jnp.float32) * 0.3
    v = jax.random.normal(ks[2], (B, KV, T, Dh), dtype=jnp.float32)
    valid = jnp.ones((B, T), jnp.int32)
    if pad:
        valid = valid.at[0, :pad].set(0)  # left padding on sample 0
    co = jax.random.normal(ks[3], (B, H, T, Dh), dtype=jnp.float32)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, valid, causal=causal,
                                       interpret=True) * co)

    def loss_ref(q, k, v):
        return jnp.sum(ref_attn(q, k, v, valid, causal=causal) * co)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", gf, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=3e-5,
            err_msg=f"d{name} mismatch",
        )
