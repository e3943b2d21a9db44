"""Ring attention — sequence/context-parallel attention over a mesh axis.

Finishes the SP story (SURVEY §5 flags long-context as absent in the
reference; round 1 landed only activation sequence sharding while
attention still gathered the full sequence).  Each device holds a
sequence CHUNK of q/k/v; K/V chunks rotate around the ring with
`lax.ppermute` while a flash-style online-softmax state (acc, m, l)
accumulates — no device ever materializes the full [T, T] score matrix
or the full-sequence K/V, so max T scales with the ring size.

Causal masking works on GLOBAL positions: chunk layout is contiguous
(device r holds positions [r·Tc, (r+1)·Tc)), and each ring step knows the
visiting chunk's source rank, so the mask is plain index arithmetic (no
static causal flag needed per block).

Call `ring_attention` INSIDE shard_map with q/k/v sharded over the
sequence dim along `axis_name`.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = jnp.float32(-1e30)


def _chunk_attn(q, k, v, allowed):
    """Unnormalized chunk attention.

    q [B, H, Tq, Dh], k/v [B, KV, Tc, Dh], allowed [B, H, Tq, Tc] bool.
    Returns (acc [B, H, Tq, Dh] f32, m [B, H, Tq] f32, l [B, H, Tq] f32):
    acc = Σ exp(s - m)·v over allowed keys, l the matching denominator.
    Fully-masked rows give l == 0 (merging treats them as weightless).
    """
    B, H, Tq, Dh = q.shape
    KV = k.shape[1]
    g = H // KV
    kk = jnp.repeat(k, g, axis=1)
    vv = jnp.repeat(v, g, axis=1)
    s = jnp.einsum("bhtd,bhsd->bhts", q, kk).astype(jnp.float32) * Dh ** -0.5
    s = jnp.where(allowed, s, NEG_INF)
    m = jnp.max(s, axis=-1)                                   # [B, H, Tq]
    p = jnp.where(allowed, jnp.exp(s - m[..., None]), 0.0)
    l = jnp.sum(p, axis=-1)
    acc = jnp.einsum("bhts,bhsd->bhtd", p.astype(vv.dtype), vv).astype(jnp.float32)
    return acc, m, l


def ring_attention(
    q: jnp.ndarray,            # [B, H, Tc, Dh] local query chunk
    k: jnp.ndarray,            # [B, KV, Tc, Dh] local key chunk
    v: jnp.ndarray,            # [B, KV, Tc, Dh]
    kv_valid: Optional[jnp.ndarray] = None,  # [B, Tc] local key validity
    *,
    axis_name: str,
    causal: bool = True,
) -> jnp.ndarray:
    """Sequence-parallel attention over the `axis_name` ring.

    Device r's chunk covers global positions [r·Tc, (r+1)·Tc).  Returns
    the local [B, H, Tc, Dh] output — numerically the sequence-sharded
    slice of full attention over the concatenated sequence (tested vs the
    unsharded oracle in tests/test_ring_attention.py).  Fully-masked rows
    output 0, matching ops.flash_attention's convention.
    """
    p_size = jax.lax.axis_size(axis_name)
    r = jax.lax.axis_index(axis_name)
    B, H, Tc, Dh = q.shape
    if kv_valid is None:
        kv_valid = jnp.ones((B, Tc), jnp.int32)

    q_pos = r * Tc + jnp.arange(Tc)                           # [Tc] global

    perm = [(i, (i + 1) % p_size) for i in range(p_size)]

    def step(carry, s):
        acc, m, l, k_cur, v_cur, valid_cur = carry
        src = (r - s) % p_size
        k_pos = src * Tc + jnp.arange(Tc)
        allowed = jnp.broadcast_to(
            (valid_cur[:, None, None, :] > 0), (B, H, Tc, Tc)
        )
        if causal:
            allowed = allowed & (k_pos[None, None, None, :] <= q_pos[None, None, :, None])
        acc2, m2, l2 = _chunk_attn(q, k_cur, v_cur, allowed)
        # Online-softmax merge (flash recurrence across ring steps).
        m_new = jnp.maximum(m, m2)
        ea = jnp.exp(m - m_new)
        eb = jnp.exp(m2 - m_new)
        l_new = l * ea + l2 * eb
        acc_new = acc * ea[..., None] + acc2 * eb[..., None]
        # Rotate the K/V chunk to the next rank.
        k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        valid_nxt = jax.lax.ppermute(valid_cur, axis_name, perm)
        return (acc_new, m_new, l_new, k_nxt, v_nxt, valid_nxt), None

    init = (
        jnp.zeros((B, H, Tc, Dh), jnp.float32),
        jnp.full((B, H, Tc), NEG_INF),
        jnp.zeros((B, H, Tc), jnp.float32),
        k, v, kv_valid,
    )
    (acc, m, l, _, _, _), _ = jax.lax.scan(
        step, init, jnp.arange(p_size)
    )
    out = jnp.where(
        (l > 0)[..., None], acc / jnp.maximum(l, 1e-30)[..., None], 0.0
    )
    return out.astype(q.dtype)
