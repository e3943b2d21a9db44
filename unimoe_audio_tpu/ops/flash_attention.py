"""Causal GQA flash attention — Pallas TPU kernel.

Replaces XLA's materialized-scores attention for prefill/training
(the reference relies on SDPA / FlashAttention-2,
UniMoEV2-Preview/training/Models/UniMoEV2.py:73-77; on TPU we stream
K/V blocks through VMEM with online softmax so the [T, S] score matrix
never touches HBM).

Layout: q [B, H, T, Dh], k/v [B, KV, S, Dh] with H = KV · groups.
Grid (B·H, T/bq, S/bk); the innermost S loop carries running max /
denominator / accumulator in VMEM scratch (classic flash-attention
recurrence).  Causal masking skips fully-masked K blocks; a padding mask
comes in as per-key validity.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
_STAT = 128  # lane width for the running-stat scratch


def _flash_kernel(
    q_ref, k_ref, v_ref, mask_ref, o_ref,
    m_scr, l_scr, acc_scr,
    *, scale: float, bq: int, bk: int, causal: bool, q_offset: int,
):
    qi = pl.program_id(1)
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q_start = qi * bq
    k_start = ki * bk
    # Rectangular q/k: query i sits at absolute key position i + q_offset
    # (q_offset = S - T for a suffix window).
    live_pred = (k_start <= q_start + bq - 1 + q_offset) if causal else True

    @pl.when(live_pred)
    def _compute():
        # Keep matmul operands in their native (bf16) dtype — the MXU runs
        # bf16×bf16→f32 at full rate; f32 operands would be ~8× slower.
        q = q_ref[0]                               # [bq, Dh]
        k = k_ref[0]                               # [bk, Dh]
        v = v_ref[0]                               # [bk, Dh]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale                                  # [bq, bk] f32

        kv_valid = mask_ref[0, 0] > 0              # [bk]
        s = jnp.where(kv_valid[None, :], s, NEG_INF)
        if causal:
            q_idx = q_start + q_offset + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
            k_idx = k_start + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
            s = jnp.where(k_idx <= q_idx, s, NEG_INF)

        m_prev = m_scr[:, :1]                      # [bq, 1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)                     # [bq, bk]
        alpha = jnp.exp(m_prev - m_new)            # [bq, 1]
        l_new = alpha * l_scr[:, :1] + jnp.sum(p, axis=-1, keepdims=True)
        acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
        l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(ki == nk - 1)
    def _finalize():
        denom = jnp.maximum(l_scr[:, :1], 1e-30)
        o_ref[0] = (acc_scr[:] / denom).astype(o_ref.dtype)


def _reference_attention(q, k, v, kv_valid, causal):
    """Pure-XLA attention with identical semantics (used for the backward
    pass and as a numerical oracle)."""
    B, H, T, Dh = q.shape
    KV, S = k.shape[1], k.shape[2]
    g = H // KV
    kk = jnp.repeat(k, g, axis=1)
    vv = jnp.repeat(v, g, axis=1)
    s = jnp.einsum("bhtd,bhsd->bhts", q, kk).astype(jnp.float32) * Dh ** -0.5
    s = jnp.where(kv_valid[:, None, None, :] > 0, s, NEG_INF)
    if causal:
        s = jnp.where(jnp.tril(jnp.ones((T, S), bool), k=S - T)[None, None], s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("bhts,bhsd->bhtd", p, vv)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _flash_with_vjp(q, k, v, kv_valid, causal, bq, bk, interpret):
    return _flash_forward(q, k, v, kv_valid, causal, bq, bk, interpret)


def _flash_vjp_fwd(q, k, v, kv_valid, causal, bq, bk, interpret):
    out = _flash_forward(q, k, v, kv_valid, causal, bq, bk, interpret)
    return out, (q, k, v, kv_valid)


def _flash_vjp_bwd(causal, bq, bk, interpret, res, g):
    # Backward recomputes attention in XLA and differentiates that — exact
    # gradients (same math), flash speed on the forward; a fused backward
    # kernel is a future optimization.
    q, k, v, kv_valid = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_: _reference_attention(q_, k_, v_, kv_valid, causal),
        q, k, v,
    )
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


_flash_with_vjp.defvjp(_flash_vjp_fwd, _flash_vjp_bwd)


@functools.partial(
    jax.jit, static_argnames=("causal", "bq", "bk", "interpret")
)
def flash_attention(
    q: jnp.ndarray,            # [B, H, T, Dh]
    k: jnp.ndarray,            # [B, KV, S, Dh]
    v: jnp.ndarray,            # [B, KV, S, Dh]
    kv_valid: Optional[jnp.ndarray] = None,  # [B, S] 1 = attendable
    *,
    causal: bool = True,
    bq: int = 512,
    bk: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Flash attention with exact gradients (Pallas forward + XLA-recompute
    backward).  See _flash_forward for layout details."""
    B, S = q.shape[0], k.shape[2]
    if kv_valid is None:
        kv_valid = jnp.ones((B, S), dtype=jnp.int32)
    return _flash_with_vjp(q, k, v, kv_valid.astype(jnp.int32),
                           causal, bq, bk, interpret)


def _flash_forward(
    q: jnp.ndarray,            # [B, H, T, Dh]
    k: jnp.ndarray,            # [B, KV, S, Dh]
    v: jnp.ndarray,            # [B, KV, S, Dh]
    kv_valid: jnp.ndarray,     # [B, S] 1 = attendable
    causal: bool,
    bq: int,
    bk: int,
    interpret: bool,
) -> jnp.ndarray:
    """Returns [B, H, T, Dh].  T and S are padded to block multiples
    internally; GQA maps query head h → kv head (h % H) // (H/KV)."""
    B, H, T, Dh = q.shape
    KV, S = k.shape[1], k.shape[2]
    groups = H // KV
    scale = Dh ** -0.5

    # Shrink blocks for short sequences to avoid heavy padding.
    bq = min(bq, max(128, -(-T // 128) * 128))
    bk = min(bk, max(128, -(-S // 128) * 128))
    Tp = -(-T // bq) * bq
    Sp = -(-S // bk) * bk
    if kv_valid is None:
        kv_valid = jnp.ones((B, S), dtype=jnp.int32)
    kv_valid = kv_valid.astype(jnp.int32)
    if Tp != T:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, Tp - T), (0, 0)))
    if Sp != S:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, Sp - S), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, Sp - S), (0, 0)))
        kv_valid = jnp.pad(kv_valid, ((0, 0), (0, Sp - S)))

    q2 = q.reshape(B * H, Tp, Dh)
    k2 = k.reshape(B * KV, Sp, Dh)
    v2 = v.reshape(B * KV, Sp, Dh)

    grid = (B * H, Tp // bq, Sp // bk)

    # NB: use lax.div/rem — jnp's `//` lowers signed floor-division with a
    # select, which Pallas index maps reject.
    def kv_map(h, qi, ki):
        b = jax.lax.div(h, H)
        hh = jax.lax.rem(h, H)
        return (b * KV + jax.lax.div(hh, groups), ki, 0)

    out = pl.pallas_call(
        functools.partial(
            _flash_kernel, scale=scale, bq=bq, bk=bk, causal=causal,
            q_offset=S - T,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, Dh), lambda h, qi, ki: (h, qi, 0)),
            pl.BlockSpec((1, bk, Dh), kv_map),
            pl.BlockSpec((1, bk, Dh), kv_map),
            pl.BlockSpec((1, 1, bk), lambda h, qi, ki: (jax.lax.div(h, H), 0, ki)),
        ],
        out_specs=pl.BlockSpec((1, bq, Dh), lambda h, qi, ki: (h, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((B * H, Tp, Dh), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, _STAT), jnp.float32),
            pltpu.VMEM((bq, _STAT), jnp.float32),
            pltpu.VMEM((bq, Dh), jnp.float32),
        ],
        interpret=interpret,
    )(q2, k2, v2, kv_valid[:, None, :])

    return out.reshape(B, H, Tp, Dh)[:, :, :T]
