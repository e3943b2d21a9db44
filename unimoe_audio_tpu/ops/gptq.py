"""Error-compensated int4 expert quantization (GPTQ-style).

Round-to-nearest (RTN) group-wise int4 (ops/quant.quantize_tensor_int4)
minimizes WEIGHT error; what matters at serving time is OUTPUT error
||X W - X Wq||.  GPTQ [Frantar et al. 2022] minimizes the latter: given
the calibration Hessian H = X^T X over the weight's contraction dim, it
quantizes contraction rows one at a time and folds each row's rounding
error into the not-yet-quantized rows through the Cholesky factor of
H^-1 — correlated input directions absorb each other's error.

TPU-shaped implementation: rows are processed in blocks of `group_size`
(in the non-default group-wise mode one scale group = one block, scales
found by the same MSE clip search the RTN path uses; the DEFAULT
per-channel mode fixes one upfront scale per output column while error
compensation still runs in 128-row blocks), the within-block row
recursion is a lax.scan, and
the cross-block error propagation is one [G, D] x [G, F] matmul per
block — the O(D^2 F) work lands on the MXU.  Everything jits; stacked
expert leaves ([L, E, D, F]) vmap over experts and lax.map over layers.

Calibration inputs come from the model itself: text_model_forward's
`output_moe_inputs=True` returns each layer's DCMoE block input (the
gate/up contraction activations); down-projection Hessians are built by
pushing the same activations through each expert's already-quantized
gate/up (so later matrices compensate the earlier ones' quantization).

Reference anchor: the weight-streaming-bound AR decode loop this serves,
/root/reference/utils/UniMoE_Audio_model.py:918-1068.  The reference has
no quantization at all — this is TPU-native added capability.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from .quant import (
    QTensor,
    _group_size_for,
    _quantize_grouped_int4_core,
    _to_packed_int4,
)


def _cholesky_inv_upper(H: jnp.ndarray, damp_frac: float = 0.01) -> jnp.ndarray:
    """U = upper Cholesky factor of (H + damp·I)^-1 (f32, [D, D])."""
    D = H.shape[-1]
    damp = damp_frac * jnp.mean(jnp.diagonal(H, axis1=-2, axis2=-1), axis=-1)
    Hd = H + (damp[..., None, None] + 1e-8) * jnp.eye(D, dtype=H.dtype)
    Hinv = jnp.linalg.inv(Hd)
    # Symmetrize before Cholesky (inv of a symmetric matrix drifts).
    Hinv = 0.5 * (Hinv + jnp.swapaxes(Hinv, -1, -2))
    return jnp.swapaxes(jnp.linalg.cholesky(Hinv), -1, -2)


def _gptq_core(w32: jnp.ndarray, U: jnp.ndarray, G: int,
               per_channel: bool = False):
    """GPTQ one matrix: w32 [D, F] f32, U [D, D] upper-triangular.

    Returns (q int8 in [-8, 7] [D, F], s bf16 [D//G, F]) — the same
    storage contract as quant._quantize_grouped_int4_core, so the result
    drops into the existing QTensor/packed-s4 serving path unchanged.

    per_channel=True decouples scale granularity from the processing
    block: ONE clip-searched scale per output column is fixed upfront
    (from the original weights — GPTQ "static groups" style) and every
    block compensates against it; the emitted s is [1, F], which keeps
    the decode matmul on the fast convert-fused path (quant.matmul's
    Dg == 1 branch) instead of materializing dequantized weights.
    """
    D, F = w32.shape
    nb = D // G
    if per_channel:
        _, s_pc = _quantize_grouped_int4_core(w32, D)    # s: [1, F] bf16
        s_pc32 = s_pc.astype(jnp.float32)

    def block_step(W, b):
        i0 = b * G
        Wb = jax.lax.dynamic_slice(W, (i0, 0), (G, F))
        Ub = jax.lax.dynamic_slice(U, (i0, 0), (G, D))  # rows i0..i0+G-1
        Ubb = jax.lax.dynamic_slice(Ub, (0, i0), (G, G))  # within-block
        if per_channel:
            s, s32 = s_pc, s_pc32
        else:
            # One scale per (block, out-column), MSE clip search on the
            # incoming (already error-compensated) block weights.
            _, s = _quantize_grouped_int4_core(Wb, G)    # s: [1, F] bf16
            s32 = s.astype(jnp.float32)

        def row_step(carry, i):
            Wb, Err = carry
            wi = jax.lax.dynamic_slice(Wb, (i, 0), (1, F))[0]
            qi = jnp.clip(jnp.round(wi / s32[0]), -8, 7)
            di = Ubb[i, i]
            ei = (wi - qi * s32[0]) / jnp.where(jnp.abs(di) > 1e-12, di, 1.0)
            # Fold the error into later rows of THIS block only
            # (Wb[j] -= U[i, j]·e_i for j > i); later blocks get one
            # matmul update after the scan.
            mask = (jnp.arange(G) > i).astype(w32.dtype)
            Wb = Wb - (Ubb[i] * mask)[:, None] * ei[None, :]
            Err = jax.lax.dynamic_update_slice(Err, ei[None, :], (i, 0))
            return (Wb, Err), qi

        (Wb, Err), qrows = jax.lax.scan(
            row_step, (Wb, jnp.zeros((G, F), w32.dtype)), jnp.arange(G))
        # Cross-block propagation: rows j >= i0+G get
        #   W[j] -= sum_i U[i0+i, j] * Err[i].
        colmask = (jnp.arange(D) >= i0 + G).astype(w32.dtype)
        W = W - (Ub * colmask[None, :]).T @ Err
        # Freeze the processed block (its value no longer matters).
        return W, (qrows, s.astype(jnp.bfloat16)[0])

    _, (q, s) = jax.lax.scan(block_step, w32, jnp.arange(nb))
    if per_channel:
        s = s[:1]                                        # [1, F]
    return q.reshape(D, F).astype(jnp.int8), s  # s: [nb, F] | [1, F]


def _gptq_int4_raw(w: jnp.ndarray, H: jnp.ndarray, group_size: int):
    """GPTQ int4 of `w` [..., D, F] with Hessian `H` over the contraction
    dim.  H's leading dims align with w's LEADING leading dims (layer-
    major): [D, D] is shared by all, [L, D, D] is shared across the
    expert dim of a [L, E, D, F] leaf.  Returns (q int8, s bf16) raw —
    callers pack to s4 once at the end (packed arrays must not be
    re-stacked: jax 0.9 s4 relayout bug, see quant.packed_int4_format).

    The innermost leading dim (experts) is vmapped — its matrices share
    each sequential row-scan step — and outer dims go through lax.map,
    so an [L, E, D, F] leaf costs L·D scan steps, not L·E·D."""
    w32 = jnp.asarray(w).astype(jnp.float32)
    D = w32.shape[-2]
    # group_size == 0: per-channel scales (the fast serving layout),
    # error-compensated in 128-row processing blocks.
    per_channel = not group_size or group_size >= D
    G = _group_size_for(D, 128 if per_channel else group_size)
    U = _cholesky_inv_upper(jnp.asarray(H).astype(jnp.float32))
    # Align H's leading dims layer-major: [L, D, D] -> [L, 1, D, D] etc.
    while U.ndim < w32.ndim:
        U = U[..., None, :, :]
    lead = w32.shape[:-2]
    B = lead[-1] if lead else 1
    wf = w32.reshape((-1, B) + w32.shape[-2:])
    Uf = jnp.broadcast_to(U, lead + U.shape[-2:]).reshape(
        (-1, B) + U.shape[-2:])
    batched = jax.vmap(lambda wi, ui: _gptq_core(wi, ui, G, per_channel))
    q, s = jax.lax.map(lambda args: batched(args[0], args[1]), (wf, Uf))
    return q.reshape(w32.shape), s.reshape(lead + s.shape[-2:])


def gptq_quantize_int4(
    w: jnp.ndarray, H: jnp.ndarray, group_size: int = 0
) -> QTensor:
    """GPTQ int4 QTensor (packed s4 on TPU) — interchangeable with
    quant.quantize_tensor_int4's output.  Default group_size=0 =
    per-channel scales (the fast convert-fused serving layout; the
    compensation still runs block-wise).  See _gptq_int4_raw for the H
    broadcasting contract."""
    q, s = jax.jit(_gptq_int4_raw, static_argnums=2)(w, H, group_size)
    return QTensor(q=_to_packed_int4(q, jnp.asarray(w)), s=s)


# ---------------------------------------------------------------------------
# Calibration capture + whole-model expert conversion
# ---------------------------------------------------------------------------


def collect_moe_calibration(
    params: Dict,
    cfg,
    input_ids: jnp.ndarray,
    *,
    codec_input_ids: Optional[jnp.ndarray] = None,
    attention_mask: Optional[jnp.ndarray] = None,
    max_calib_tokens: int = 4096,
) -> jnp.ndarray:
    """Per-layer DCMoE block inputs X[L, N, D] over a calibration batch
    (padding positions dropped, N ≤ max_calib_tokens).  X calibrates every
    expert's gate/up projection (contraction dim = hidden); pushing it
    through the quantized gate/up yields the down projection's inputs."""
    from ..models.model import calculate_input_embedding, text_model_forward

    B, T = input_ids.shape
    if attention_mask is None:
        attention_mask = jnp.ones((B, T), jnp.int32)
    embeds = calculate_input_embedding(
        params, input_ids, codec_input_ids, cfg.codec_placeholder_value)
    pos = jnp.cumsum(attention_mask, axis=-1) - 1
    pos = jnp.where(attention_mask == 0, 1, pos)
    position_ids = jnp.broadcast_to(pos[None], (3, B, T))

    x = jax.jit(
        lambda p, e, pi, am: text_model_forward(
            p, e, pi, cfg.text_config, kv_valid_mask=am,
            padding_token_mask=am, output_moe_inputs=True).moe_inputs
    )(params, embeds, position_ids, attention_mask)  # [L, B, T, D] f32
    L = x.shape[0]
    X = jax.device_get(x.reshape(L, B * T, -1))
    keep = jax.device_get(attention_mask).reshape(-1).astype(bool)
    return jnp.asarray(X[:, keep, :][:, :max_calib_tokens, :])  # [L, N, D]


def collect_moe_hessians(
    params: Dict,
    cfg,
    input_ids: jnp.ndarray,
    *,
    codec_input_ids: Optional[jnp.ndarray] = None,
    attention_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Per-layer Hessians H[L, D, D] = X_l^T X_l of the DCMoE block inputs
    (see collect_moe_calibration)."""
    X = collect_moe_calibration(
        params, cfg, input_ids, codec_input_ids=codec_input_ids,
        attention_mask=attention_mask)
    return jnp.einsum("lsd,lse->lde", X, X)


def _expert_act(x: jnp.ndarray, gate, up) -> jnp.ndarray:
    """silu(x @ gate) * (x @ up) — the down-projection's input.  gate/up
    may already be QTensors (use the quantized values so the down GPTQ
    compensates their error)."""
    from .quant import matmul

    return jax.nn.silu(matmul(x, gate)) * matmul(x, up)


def quantize_experts_int4_gptq(
    params: Dict,
    cfg,
    calib_input_ids: jnp.ndarray,
    *,
    codec_input_ids: Optional[jnp.ndarray] = None,
    attention_mask: Optional[jnp.ndarray] = None,
    group_size: int = 0,
    max_calib_tokens: int = 4096,
    pad_multiple: Optional[int] = 128,
) -> Dict:
    """Convert the expert FFN weights to error-compensated packed-s4 int4.

    Pipeline per layer: (1) GPTQ gate+up against the shared layer Hessian
    H_l = X_l^T X_l; (2) push the calibration activations through the NOW
    QUANTIZED gate/up of each expert to build that expert's down-proj
    Hessian; (3) GPTQ the down projection against it.  Applies to both
    dynamic and fixed expert groups.

    The intermediate dim is zero-padded to `pad_multiple` lanes BEFORE
    quantization (numerics-exact: padded gate/up columns emit silu(0)·0
    == 0 and padded down rows only multiply those zeros), so the scale
    groups tile the PADDED dim — the flagship's shared F=1376 doesn't
    tile by G=64 unpadded — and the subsequent pad_expert_ffn pass is a
    no-op on the experts.  Work streams layer by layer (one [E, D, F]
    f32 transient, ~180 MB at flagship width) with int8 q accumulated
    until a single final s4 pack per leaf.  MUTATES and returns `params`.
    """
    import gc

    X = collect_moe_calibration(
        params, cfg, calib_input_ids, codec_input_ids=codec_input_ids,
        attention_mask=attention_mask, max_calib_tokens=max_calib_tokens)
    H = jnp.einsum("lsd,lse->lde", X, X)
    L = X.shape[0]

    gptq_raw = jax.jit(_gptq_int4_raw, static_argnums=2)
    pad_out = jax.jit(lambda w, n: jnp.pad(w, ((0, 0),) * (w.ndim - 1)
                                           + ((0, n),)), static_argnums=1)
    pad_contract = jax.jit(lambda w, n: jnp.pad(
        w, ((0, 0),) * (w.ndim - 2) + ((0, n), (0, 0))), static_argnums=1)

    @jax.jit
    def down_hessians(gq, gs, uq, us, Xl):
        """[E, Fp, Fp] Hessians of each expert's down input for one layer,
        from the QUANTIZED (padded) gate/up (int8 q + group scales)."""

        def one(gq_e, gs_e, uq_e, us_e):
            g = QTensor(q=gq_e, s=gs_e)
            u = QTensor(q=uq_e, s=us_e)
            act = _expert_act(Xl.astype(jnp.float32), g, u)
            return act.T @ act

        return jax.vmap(one)(gq, gs, uq, us)

    moe = params["layers"]["moe"]
    for gname in ("dynamic", "fixed"):
        grp = moe.get(gname)
        if not isinstance(grp, dict) or "gate" not in grp:
            continue
        F = grp["gate"].shape[-1]
        Fp = -(-F // pad_multiple) * pad_multiple if pad_multiple else F

        parts = {k: ([], []) for k in ("gate", "up", "down")}
        for l in range(L):
            gq, gs = gptq_raw(pad_out(grp["gate"][l], Fp - F), H[l],
                              group_size)            # int8 [E, D, Fp]
            uq, us = gptq_raw(pad_out(grp["up"][l], Fp - F), H[l],
                              group_size)
            Hl = down_hessians(gq, gs, uq, us, X[l])
            dq, ds = gptq_raw(pad_contract(grp["down"][l], Fp - F), Hl,
                              group_size)            # int8 [E, Fp, D]
            for key, (q_, s_) in (("gate", (gq, gs)), ("up", (uq, us)),
                                  ("down", (dq, ds))):
                parts[key][0].append(q_)
                parts[key][1].append(s_)
            del gq, gs, uq, us, Hl, dq, ds
        for key in ("gate", "up", "down"):
            q_ = jnp.stack(parts[key][0])
            s_ = jnp.stack(parts[key][1])
            old = grp[key]
            grp[key] = QTensor(q=_to_packed_int4(q_, q_), s=s_)
            del old, q_, s_
            parts[key] = None
            gc.collect()
    return params
