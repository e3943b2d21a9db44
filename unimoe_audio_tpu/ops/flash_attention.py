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
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
_STAT = 128  # lane width for the running-stat scratch


def _flash_kernel(
    q_ref, k_ref, v_ref, mask_ref, o_ref, m_ref, l_ref,
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
        l_fin = l_scr[:, :1]
        denom = jnp.maximum(l_fin, 1e-30)
        # Fully-masked rows (m never left its -inf init: no attendable key)
        # output 0 and carry zero gradient — these are padding rows whose
        # outputs are never consumed; zeros don't propagate garbage the way
        # a torch-style uniform softmax over masked keys would.
        dead = m_scr[:, :1] <= NEG_INF * 0.5
        o_ref[0] = jnp.where(dead, 0.0, acc_scr[:] / denom).astype(o_ref.dtype)
        # Softmax stats (residuals for the fused backward): p = exp(s-m)/l.
        # Stored separately rather than as lse = m + log(l): m = -1e30
        # absorbs log(l) in f32.  Dead rows get l = +big so the backward's
        # 1/l makes p == 0 for every key.
        m_ref[0] = m_scr[:, :1]
        l_ref[0] = jnp.where(dead, -NEG_INF, l_fin)


def _reference_attention(q, k, v, kv_valid, causal):
    """Pure-XLA attention with identical semantics (numerical oracle).
    Fully-masked query rows output 0 (matching the kernel), not a
    torch-style uniform softmax over masked keys."""
    B, H, T, Dh = q.shape
    KV, S = k.shape[1], k.shape[2]
    g = H // KV
    kk = jnp.repeat(k, g, axis=1)
    vv = jnp.repeat(v, g, axis=1)
    s = jnp.einsum("bhtd,bhsd->bhts", q, kk).astype(jnp.float32) * Dh ** -0.5
    allowed = jnp.broadcast_to(kv_valid[:, None, None, :] > 0, s.shape)
    if causal:
        allowed = allowed & jnp.tril(jnp.ones((T, S), bool), k=S - T)[None, None]
    s = jnp.where(allowed, s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    p = jnp.where(jnp.any(allowed, axis=-1, keepdims=True), p, 0)
    return jnp.einsum("bhts,bhsd->bhtd", p, vv)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _flash_with_vjp(q, k, v, kv_valid, causal, bq, bk, interpret):
    return _flash_forward(q, k, v, kv_valid, causal, bq, bk, interpret)[0]


def _flash_vjp_fwd(q, k, v, kv_valid, causal, bq, bk, interpret):
    out, m, l = _flash_forward(q, k, v, kv_valid, causal, bq, bk, interpret)
    return out, (q, k, v, kv_valid, out, m, l)


def _flash_vjp_bwd(causal, bq, bk, interpret, res, g):
    # Fused Pallas backward (classic two-pass flash backward: dq streams
    # over K blocks; dk/dv stream over Q blocks), replacing round-1's
    # XLA-recompute VJP.  Same math as _reference_attention's VJP; on TPU
    # the dS/P intermediates are bf16-rounded before the MXU matmuls, so
    # gradients match the oracle exactly in the f32/interpret configuration
    # and to bf16 tolerance on-device (tests/test_flash_attention.py).
    q, k, v, kv_valid, out, m, l = res
    dq, dk, dv = _flash_backward(
        q, k, v, kv_valid, out, m, l, g, causal, bq, bk, interpret
    )
    return dq, dk, dv, None


_flash_with_vjp.defvjp(_flash_vjp_fwd, _flash_vjp_bwd)


# ---------------------------------------------------------------------------
# Fused backward kernels
# ---------------------------------------------------------------------------

def _flash_bwd_dq_kernel(
    q_ref, k_ref, v_ref, do_ref, m_ref, l_ref, dvec_ref, mask_ref, dq_ref,
    acc_scr,
    *, scale: float, bq: int, bk: int, causal: bool, q_offset: int,
):
    """dq[i] = scale · Σ_j dS[i,j]·K[j],  dS = P ∘ (dP − D),  dP = dO·Vᵀ.

    Grid (B·H, T/bq, S/bk), K innermost; dq accumulates in VMEM scratch.
    """
    qi = pl.program_id(1)
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q_start = qi * bq
    k_start = ki * bk
    live = (k_start <= q_start + bq - 1 + q_offset) if causal else True

    @pl.when(live)
    def _compute():
        q = q_ref[0]                                   # [bq, Dh]
        k = k_ref[0]                                   # [bk, Dh]
        v = v_ref[0]
        do = do_ref[0]                                 # [bq, Dh]
        m = m_ref[0]                                   # [bq, 1] f32
        linv = 1.0 / jnp.maximum(l_ref[0], 1e-30)      # [bq, 1] f32
        dvec = dvec_ref[0]                             # [bq, 1] f32

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale                                      # [bq, bk]
        allowed = jnp.broadcast_to(mask_ref[0, 0] > 0, (bq, bk))
        if causal:
            q_idx = q_start + q_offset + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
            k_idx = k_start + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
            allowed = allowed & (k_idx <= q_idx)
        s = jnp.where(allowed, s, NEG_INF)
        p = jnp.exp(s - m) * linv                      # [bq, bk] f32
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )                                              # [bq, bk]
        # The mask `where` cuts the q/k dependence of masked scores, so ds
        # is zeroed there (matters only for degenerate fully-masked rows,
        # whose p is uniform rather than 0).
        ds = jnp.where(allowed, p * (dp - dvec), 0.0)  # [bq, bk]
        acc_scr[:] += jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale

    @pl.when(ki == nk - 1)
    def _finalize():
        dq_ref[0] = acc_scr[:].astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, mt_ref, lt_ref, dt_ref, mask_ref,
    dk_ref, dv_ref,
    dk_scr, dv_scr,
    *, scale: float, bq: int, bk: int, causal: bool, q_offset: int,
):
    """dv[j] = Σ_i P[i,j]·dO[i];  dk[j] = scale · Σ_i dS[i,j]·Q[i].

    Grid (B·H, S/bk, T/bq), Q innermost; dk/dv accumulate in VMEM scratch.
    Scores are computed TRANSPOSED [bk, bq] so every gemm contracts along
    lanes (sublane-contracting dot_generals force Mosaic transposes of the
    [bq, bk] probability tile, measured ~30% of backward time).  The m/l/D
    row stats come in transposed [1, bq] for the same reason.  GQA
    group-summing happens outside (per-query-head dk/dv summed in XLA).
    """
    ki = pl.program_id(1)
    qi = pl.program_id(2)
    nq = pl.num_programs(2)

    @pl.when(qi == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    q_start = qi * bq
    k_start = ki * bk
    live = (k_start <= q_start + bq - 1 + q_offset) if causal else True

    @pl.when(live)
    def _compute():
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        do = do_ref[0]
        m_row = mt_ref[0]                              # [1, bq]
        linv_row = 1.0 / jnp.maximum(lt_ref[0], 1e-30)
        d_row = dt_ref[0]                              # [1, bq]

        st = jax.lax.dot_general(
            k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale                                      # [bk, bq]
        # Insert the minor dim on the int32 mask BEFORE comparing — Mosaic
        # only supports minor-dim insertion for 32-bit types, not i1.
        allowed = jnp.broadcast_to(mask_ref[0, 0][:, None], (bk, bq)) > 0
        if causal:
            k_idx = k_start + jax.lax.broadcasted_iota(jnp.int32, (bk, bq), 0)
            q_idx = q_start + q_offset + jax.lax.broadcasted_iota(jnp.int32, (bk, bq), 1)
            allowed = allowed & (k_idx <= q_idx)
        st = jnp.where(allowed, st, NEG_INF)
        pt = jnp.exp(st - m_row) * linv_row            # [bk, bq]
        dv_scr[:] += jax.lax.dot_general(
            pt.astype(do.dtype), do, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                              # [bk, Dh]
        dpt = jax.lax.dot_general(
            v, do, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )                                              # [bk, bq]
        # Masked scores carry no gradient to q/k (see dq kernel note).
        dst = jnp.where(allowed, pt * (dpt - d_row), 0.0)
        dk_scr[:] += jax.lax.dot_general(
            dst.astype(q.dtype), q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale

    @pl.when(qi == nq - 1)
    def _finalize():
        dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


def _flash_backward(q, k, v, kv_valid, out, m, l, g, causal, bq, bk, interpret):
    """Pad/reshape exactly like _flash_forward, run the two backward kernels,
    GQA-sum dk/dv over query-head groups, unpad."""
    B, H, T, Dh = q.shape
    KV, S = k.shape[1], k.shape[2]
    groups = H // KV
    scale = Dh ** -0.5

    bq = min(bq, max(128, -(-T // 128) * 128))
    bk = min(bk, max(128, -(-S // 128) * 128))
    Tp = -(-T // bq) * bq
    Sp = -(-S // bk) * bk
    g = g.astype(q.dtype)
    kv_valid = kv_valid.astype(jnp.int32)
    if Tp != T:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, Tp - T), (0, 0)))
        g = jnp.pad(g, ((0, 0), (0, 0), (0, Tp - T), (0, 0)))
        out = jnp.pad(out, ((0, 0), (0, 0), (0, Tp - T), (0, 0)))
    if Sp != S:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, Sp - S), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, Sp - S), (0, 0)))
        kv_valid = jnp.pad(kv_valid, ((0, 0), (0, Sp - S)))

    q2 = q.reshape(B * H, Tp, Dh)
    k2 = k.reshape(B * KV, Sp, Dh)
    v2 = v.reshape(B * KV, Sp, Dh)
    g2 = g.reshape(B * H, Tp, Dh)
    out2 = out.reshape(B * H, Tp, Dh)
    # m/l come in already padded to [B·H, Tp, 1] from the forward.
    dvec = jnp.sum(g2.astype(jnp.float32) * out2.astype(jnp.float32),
                   axis=-1, keepdims=True)            # [BH, Tp, 1]

    def kv_map(h, qi, ki):
        b = jax.lax.div(h, H)
        hh = jax.lax.rem(h, H)
        return (b * KV + jax.lax.div(hh, groups), ki, 0)

    def kv_map_t(h, ki, qi):
        b = jax.lax.div(h, H)
        hh = jax.lax.rem(h, H)
        return (b * KV + jax.lax.div(hh, groups), ki, 0)

    q_offset = S - T
    common = dict(scale=scale, bq=bq, bk=bk, causal=causal, q_offset=q_offset)

    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, **common),
        grid=(B * H, Tp // bq, Sp // bk),
        in_specs=[
            pl.BlockSpec((1, bq, Dh), lambda h, qi, ki: (h, qi, 0)),   # q
            pl.BlockSpec((1, bk, Dh), kv_map),                          # k
            pl.BlockSpec((1, bk, Dh), kv_map),                          # v
            pl.BlockSpec((1, bq, Dh), lambda h, qi, ki: (h, qi, 0)),   # dO
            pl.BlockSpec((1, bq, 1), lambda h, qi, ki: (h, qi, 0)),    # m
            pl.BlockSpec((1, bq, 1), lambda h, qi, ki: (h, qi, 0)),    # l
            pl.BlockSpec((1, bq, 1), lambda h, qi, ki: (h, qi, 0)),    # D
            pl.BlockSpec((1, 1, bk), lambda h, qi, ki: (jax.lax.div(h, H), 0, ki)),
        ],
        out_specs=pl.BlockSpec((1, bq, Dh), lambda h, qi, ki: (h, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((B * H, Tp, Dh), q.dtype),
        scratch_shapes=[pltpu.VMEM((bq, Dh), jnp.float32)],
        interpret=interpret,
    )(q2, k2, v2, g2, m, l, dvec, kv_valid[:, None, :])

    # Transposed row stats [BH, 1, Tp] so the dkv kernel reads them as
    # lane-major [1, bq] rows (broadcast against [bk, bq] score tiles).
    m_t = jnp.swapaxes(m, 1, 2)
    l_t = jnp.swapaxes(l, 1, 2)
    dvec_t = jnp.swapaxes(dvec, 1, 2)

    dk_h, dv_h = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, **common),
        grid=(B * H, Sp // bk, Tp // bq),
        in_specs=[
            pl.BlockSpec((1, bq, Dh), lambda h, ki, qi: (h, qi, 0)),   # q
            pl.BlockSpec((1, bk, Dh), kv_map_t),                        # k
            pl.BlockSpec((1, bk, Dh), kv_map_t),                        # v
            pl.BlockSpec((1, bq, Dh), lambda h, ki, qi: (h, qi, 0)),   # dO
            pl.BlockSpec((1, 1, bq), lambda h, ki, qi: (h, 0, qi)),    # mᵀ
            pl.BlockSpec((1, 1, bq), lambda h, ki, qi: (h, 0, qi)),    # lᵀ
            pl.BlockSpec((1, 1, bq), lambda h, ki, qi: (h, 0, qi)),    # Dᵀ
            pl.BlockSpec((1, 1, bk), lambda h, ki, qi: (jax.lax.div(h, H), 0, ki)),
        ],
        out_specs=(
            pl.BlockSpec((1, bk, Dh), lambda h, ki, qi: (h, ki, 0)),
            pl.BlockSpec((1, bk, Dh), lambda h, ki, qi: (h, ki, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B * H, Sp, Dh), k.dtype),
            jax.ShapeDtypeStruct((B * H, Sp, Dh), v.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((bk, Dh), jnp.float32),
            pltpu.VMEM((bk, Dh), jnp.float32),
        ],
        interpret=interpret,
    )(q2, k2, v2, g2, m_t, l_t, dvec_t, kv_valid[:, None, :])

    dq = dq.reshape(B, H, Tp, Dh)[:, :, :T]
    # GQA: each kv head serves `groups` query heads — sum their pulls.
    dk = dk_h.reshape(B, KV, groups, Sp, Dh).sum(axis=2)[:, :, :S]
    dv = dv_h.reshape(B, KV, groups, Sp, Dh).sum(axis=2)[:, :, :S]
    return dq, dk.astype(k.dtype), dv.astype(v.dtype)


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
    """Flash attention with exact gradients (Pallas forward + fused Pallas
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
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns ([B, H, T, Dh], m [B·H, Tp, 1], l [B·H, Tp, 1]).  T and S
    are padded to block multiples internally; GQA maps query head h → kv
    head (h % H) // (H/KV).  The per-query-row softmax stats m (running
    max) and l (denominator), f32, PADDED to Tp, are the residuals for the
    fused backward (p = exp(s - m) / l)."""
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

    out, m_stat, l_stat = pl.pallas_call(
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
        out_specs=(
            pl.BlockSpec((1, bq, Dh), lambda h, qi, ki: (h, qi, 0)),
            pl.BlockSpec((1, bq, 1), lambda h, qi, ki: (h, qi, 0)),
            pl.BlockSpec((1, bq, 1), lambda h, qi, ki: (h, qi, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B * H, Tp, Dh), q.dtype),
            jax.ShapeDtypeStruct((B * H, Tp, 1), jnp.float32),
            jax.ShapeDtypeStruct((B * H, Tp, 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((bq, _STAT), jnp.float32),
            pltpu.VMEM((bq, _STAT), jnp.float32),
            pltpu.VMEM((bq, Dh), jnp.float32),
        ],
        interpret=interpret,
    )(q2, k2, v2, kv_valid[:, None, :])

    return out.reshape(B, H, Tp, Dh)[:, :, :T], m_stat, l_stat
