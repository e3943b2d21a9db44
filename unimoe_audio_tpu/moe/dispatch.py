"""Expert dispatch & compute paths for DCMoE.

Replaces the reference's compress_matrix → einsum → DeepSpeed all-to-all
pipeline (reference: utils/UniMoE_Audio_core.py:419-493 and the pack/unpack
primitives at utils/UniMoE_Audio_utils.py:436-523) with three TPU-native
paths:

  * dense   — every expert runs on every token; combine with the routing
              weight matrix.  One batched einsum per projection, fully
              MXU-resident.  Optimal when S is small (AR decode steps) and
              exact for tests.
  * packed  — capacity-packed gather dispatch: tokens are packed per-expert
              by a stable sort of the routing mask (the argsort pack in
              compress_matrix, utils/UniMoE_Audio_utils.py:460-483, becomes
              a cumsum + gather), experts run on [E, cap, D] blocks, and the
              combine gathers each token's row back.  No all-to-all.
  * ep      — packed dispatch inside `shard_map` over the 'expert' mesh axis
              with `jax.lax.all_to_all` around local expert compute and a
              pmax capacity sync — the reference's _AllToAll/allreduce-MAX
              EP pipeline (utils/UniMoE_Audio_core.py:455-488) as XLA
              collectives over ICI.

All paths share one stacked-parameter layout:
  params = {"gate": [E, D, F], "up": [E, D, F], "down": [E, F, D]}
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp


def _a8_eligible(params: Dict[str, jnp.ndarray]) -> bool:
    """a8 requires per-channel-scaled QTensor weights on all three
    projections (the serving layout); anything else falls back to bf16."""
    from ..ops.quant import QTensor

    return all(
        isinstance(params[k], QTensor) and params[k].s.shape[-2] == 1
        for k in ("gate", "up", "down")
    )


def swiglu_expert_ffn(
    x_ecd: jnp.ndarray, params: Dict[str, jnp.ndarray], *, a8: bool = False
) -> jnp.ndarray:
    """Batched per-expert SwiGLU FFN: [E, C, D] → [E, C, D].

    Mirrors AudioDynamicExpertMLP (reference: utils/UniMoE_Audio_core.py:34-49)
    batched over the expert dim so every projection is one MXU matmul.
    Accepts raw or int8-quantized weights (ops.quant).

    a8=True runs the projections on the int8 MXU path: activations are
    quantized per row (ops.quant.act_quant_int8), the dots run s8×s8→s32
    at 2× the bf16 MXU rate (v5e: 394 TOPS vs 197 TFLOP/s — the B=88
    decode step is expert-COMPUTE-bound, docs/ROOFLINE.md), and outputs
    are rescaled by the rank-1 (row scale × per-channel weight scale)
    outer product.  Contractions are overflow-safe: |sum| ≤ D·127·127
    ≈ 3.3e7 ≪ 2^31.  The g/u epilogues cast to bf16 BEFORE the silu·u
    product: the f32 formulation was VMEM-write-bound (xprof: loop
    fusion 10.6% of step @ 177 GiB/s) and bf16 epilogues measured +2.1%
    aggregate with 12L quality unchanged (87.6%/KL 0.00377 — identical
    to bf16-compute GPTQ; docs/ROOFLINE.md).  Serving-only (round() is
    not differentiable); requires per-channel QTensor weights, else
    falls back to bf16."""
    from ..ops.quant import act_quant_int8, expert_einsum

    if a8 and _a8_eligible(params):
        q, s = act_quant_int8(x_ecd)

        def dot8(spec, qx, w):
            return jnp.einsum(spec, qx, w.q.astype(jnp.int8),
                              preferred_element_type=jnp.int32)

        g = (dot8("ecd,edf->ecf", q, params["gate"]).astype(jnp.float32)
             * (s * params["gate"].s.astype(jnp.float32))).astype(x_ecd.dtype)
        u = (dot8("ecd,edf->ecf", q, params["up"]).astype(jnp.float32)
             * (s * params["up"].s.astype(jnp.float32))).astype(x_ecd.dtype)
        h = jax.nn.silu(g) * u
        hq, hs = act_quant_int8(h)
        y = dot8("ecf,efd->ecd", hq, params["down"]).astype(jnp.float32) \
            * (hs * params["down"].s.astype(jnp.float32))
        return y.astype(x_ecd.dtype)

    g = expert_einsum("ecd,edf->ecf", x_ecd, params["gate"])
    u = expert_einsum("ecd,edf->ecf", x_ecd, params["up"])
    h = jax.nn.silu(g) * u
    return expert_einsum("ecf,efd->ecd", h, params["down"])


def swiglu_ffn(x_sd: jnp.ndarray, params: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """Single-expert SwiGLU FFN: [S, D] → [S, D] with params [D, F]/[F, D]."""
    from ..ops.quant import matmul

    h = jax.nn.silu(matmul(x_sd, params["gate"])) * matmul(x_sd, params["up"])
    return matmul(h, params["down"])


def moe_ffn_dense(
    hidden: jnp.ndarray,
    expert_mask: jnp.ndarray,
    router_weight: jnp.ndarray,
    params: Dict[str, jnp.ndarray],
    *,
    a8: bool = False,
) -> jnp.ndarray:
    """Dense path: run all experts on all tokens, combine by weight.

    combined[s] = Σ_e (w[s,e]·mask[s,e]) · FFN_e(hidden[s])

    Semantically identical to AudioMOELayer.forward with ep_group=None
    (reference: utils/UniMoE_Audio_core.py:446-493) because the packed
    dispatch there zeroes non-selected slots before combining.
    """
    from ..ops.quant import wshape

    w = router_weight * expert_mask.astype(router_weight.dtype)  # [S, E]
    x = jnp.broadcast_to(hidden[None], (wshape(params["gate"])[0],) + hidden.shape)
    y = swiglu_expert_ffn(x, params, a8=a8)  # [E, S, D]
    # Combine = Σ_e y[e,s,d]·w[s,e].  Written as broadcast-multiply +
    # reduce rather than an einsum: the contraction is over E (tiny, VPU
    # work either way), and the einsum's VJP emits a transposed dot whose
    # sharding GSPMD can only satisfy by involuntary full rematerialization
    # under an expert-sharded mesh; elementwise-mul + reduce shards
    # trivially (forward AND backward) with one psum over the expert axis.
    return jnp.sum(y * jnp.swapaxes(w, 0, 1)[:, :, None].astype(y.dtype), axis=0)


def pack_by_expert(
    hidden: jnp.ndarray, expert_mask: jnp.ndarray, capacity: int
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Pack each expert's selected tokens into a dense [E, cap, D] block.

    The stable argsort pack of compress_matrix (reference:
    utils/UniMoE_Audio_utils.py:460-483): selected tokens keep sequence
    order; slot c of expert e holds the c-th selected token.  Returns
    (packed [E, cap, D], token_idx [E, cap], pos [S, E]) where
    pos[s, e] = slot of token s in expert e's block (valid where mask).
    """
    S = hidden.shape[0]
    mask = expert_mask.astype(jnp.int32)
    pos = jnp.cumsum(mask, axis=0) - 1  # [S, E]
    order = jnp.argsort(1 - mask, axis=0, stable=True)  # selected tokens first
    token_idx = order[:capacity, :].T  # [E, cap]
    packed = hidden[token_idx]  # [E, cap, D]
    counts = jnp.sum(mask, axis=0)  # [E]
    slot_valid = jnp.arange(capacity)[None, :] < counts[:, None]  # [E, cap]
    packed = jnp.where(slot_valid[..., None], packed, 0)
    return packed, token_idx, pos


def combine_from_packed(
    y_packed: jnp.ndarray,
    pos: jnp.ndarray,
    expert_mask: jnp.ndarray,
    router_weight: jnp.ndarray,
) -> jnp.ndarray:
    """Weighted gather-combine of packed expert outputs back to [S, D].

    Inverse of pack_by_expert + the combine einsum (reference:
    utils/UniMoE_Audio_core.py:486-488).
    """
    capacity = y_packed.shape[1]
    w = (router_weight * expert_mask.astype(router_weight.dtype)).astype(y_packed.dtype)
    safe_pos = jnp.clip(pos, 0, capacity - 1)  # [S, E]
    # y_tok[s, e, :] = y_packed[e, pos[s, e], :]
    y_tok = y_packed[jnp.arange(y_packed.shape[0])[None, :], safe_pos, :]  # [S, E, D]
    # Tokens beyond capacity contribute zero (their slot was dropped).
    in_cap = (pos < capacity) & (expert_mask > 0)
    w = jnp.where(in_cap, w, 0)
    return jnp.einsum("se,sed->sd", w, y_tok)


# One-hot dispatch tensors stay under this many elements before the packed
# path falls back to the argsort pack (the [S, E, cap] one-hot is S·E·cap).
_ONEHOT_BUDGET = 4 << 20


def _dispatch_onehot(expert_mask: jnp.ndarray, capacity: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One-hot dispatch tensor oh[s, e, c] = 1 iff token s is expert e's
    c-th selected token (sequence order), plus pos [S, E].

    Slot assignment identical to pack_by_expert's stable argsort; built
    from a cumsum + compare instead of a sort — at decode shapes the sort
    costs ~5 ms/step across 36 layers while the one-hot matmuls are ~0.6 ms
    of MXU work (each one-hot row selects exactly ONE token, so the matmul
    is an exact gather)."""
    mask = expert_mask.astype(jnp.int32)
    pos = jnp.cumsum(mask, axis=0) - 1                       # [S, E]
    slot = jnp.arange(capacity, dtype=jnp.int32)
    oh = (pos[:, :, None] == slot[None, None, :]) & (mask[:, :, None] > 0)
    return oh, pos


def moe_ffn_packed(
    hidden: jnp.ndarray,
    expert_mask: jnp.ndarray,
    router_weight: jnp.ndarray,
    params: Dict[str, jnp.ndarray],
    capacity: int,
    *,
    a8: bool = False,
) -> jnp.ndarray:
    """Capacity-packed path: pack → batched expert FFN → weighted combine.

    Two internally-equivalent dispatch strategies (same slot assignment,
    same numerics): one-hot MXU matmuls when the [S, E, cap] one-hot fits
    the budget (AR decode shapes — the hot path), argsort pack + gather
    otherwise (training shapes, where S·E·cap is quadratic in S)."""
    S, E = expert_mask.shape
    if S * E * capacity <= _ONEHOT_BUDGET:
        oh, pos = _dispatch_onehot(expert_mask, capacity)
        packed = jnp.einsum("sec,sd->ecd", oh.astype(hidden.dtype), hidden)
        y = swiglu_expert_ffn(packed, params, a8=a8)         # [E, cap, D]
        w = (router_weight * expert_mask.astype(router_weight.dtype))
        cw = oh.astype(y.dtype) * w[:, :, None].astype(y.dtype)
        return jnp.einsum("sec,ecd->sd", cw, y)
    packed, _, pos = pack_by_expert(hidden, expert_mask, capacity)
    y = swiglu_expert_ffn(packed.astype(hidden.dtype), params, a8=a8)
    return combine_from_packed(y, pos, expert_mask, router_weight)


def moe_ffn_ep(
    hidden: jnp.ndarray,
    expert_mask: jnp.ndarray,
    router_weight: jnp.ndarray,
    params: Dict[str, jnp.ndarray],
    capacity: int,
    *,
    axis_name: str = "expert",
    a8: bool = False,
) -> jnp.ndarray:
    """Expert-parallel packed path — call INSIDE shard_map.

    The caller shards `params` over experts along `axis_name` (each shard
    holds E_local = E/ep experts) and shards tokens over the same axis
    (expert-parallel ranks hold distinct token shards, like DeepSpeed's
    expert+data process groups, utils/UniMoE_Audio_core.py:513-520).

    Pipeline per shard (reference: utils/UniMoE_Audio_core.py:446-493):
      pack local tokens for ALL E experts → [E, cap, D]
      all-to-all over `axis_name`          → [E_local, ep·cap, D]
      local expert FFN
      all-to-all back                      → [E, cap, D]
      gather-combine into local tokens.

    `capacity` must already be the pmax-synced global capacity; use
    `ep_capacity` below.
    """
    from ..ops.quant import wshape

    ep = jax.lax.axis_size(axis_name)
    E_local = wshape(params["gate"])[0]
    E = E_local * ep

    packed, _, pos = pack_by_expert(hidden, expert_mask, capacity)  # [E, cap, D]
    D = packed.shape[-1]
    # Group the expert dim by destination rank: [ep, E_local, cap, D].
    packed = packed.reshape(ep, E_local, capacity, D)
    # all_to_all: scatter dim 0 to ranks, gather source-rank dim.
    recv = jax.lax.all_to_all(packed, axis_name, split_axis=0, concat_axis=0, tiled=False)
    # recv: [ep(src), E_local, cap, D] → merge src-rank and cap dims.
    x_local = jnp.swapaxes(recv, 0, 1).reshape(E_local, ep * capacity, D)
    y_local = swiglu_expert_ffn(x_local.astype(hidden.dtype), params, a8=a8)
    # Undo: [E_local, ep, cap, D] → [ep, E_local, cap, D] → all_to_all back.
    y_send = jnp.swapaxes(y_local.reshape(E_local, ep, capacity, D), 0, 1)
    y_home = jax.lax.all_to_all(y_send, axis_name, split_axis=0, concat_axis=0, tiled=False)
    y_packed = y_home.reshape(E, capacity, D)
    return combine_from_packed(y_packed, pos, expert_mask, router_weight)


def moe_ffn_gmm(
    hidden: jnp.ndarray,
    expert_mask: jnp.ndarray,
    router_weight: jnp.ndarray,
    params: Dict[str, jnp.ndarray],
    *,
    assignment_budget: Optional[int] = None,
) -> jnp.ndarray:
    """Ragged grouped-GEMM path (Pallas megablox `gmm`).

    Flattens (token, expert) assignments, sorts them expert-major (stable
    ⇒ grouped and sequence-ordered), and runs ONE grouped matmul per
    projection whose compute is proportional to the ACTUAL number of
    assignments — no all-experts dense work, no capacity padding.

    RETIRED as a candidate default (measured verdict, v5e 2026-08-19,
    table + roofline argument in docs/ROOFLINE.md, probe
    tools/probe_gmm.py): gmm loses 4-9x to dense/packed at every
    training regime and ~100 ms/step at decode shapes — the FLOPs it
    saves are either hidden under the weight stream (int8) or small
    (capacity waste ≤1.24x at the serving point), while the grouped
    Mosaic kernel runs ~4x below XLA's batched-einsum MXU utilization.
    Kept as an exactness-tested experimental mode; 'dense' (skewed
    loads / large S) and 'packed' (uniform low-k) are the production
    choices.

    assignment_budget: static row count (multiple of 128) for the packed
    assignment matrix.  None → S·E (exact, never drops).  Overflow beyond
    the budget drops highest-expert assignments (budgeted routing).
    """
    from jax.experimental.pallas.ops.tpu.megablox import gmm

    S, Dm = hidden.shape
    E = expert_mask.shape[1]
    Fd = params["gate"].shape[-1] if not hasattr(params["gate"], "q") else params["gate"].q.shape[-1]

    mask_es = expert_mask.T.reshape(-1)                      # [E·S] expert-major
    n_slots = S * E
    A = assignment_budget or -(-n_slots // 128) * 128
    order = jnp.argsort(1 - mask_es, stable=True)            # selected first
    if A > n_slots:
        order = jnp.concatenate([order, jnp.zeros(A - n_slots, order.dtype)])
    slots = order[:A]                                        # [A]
    slot_expert = slots // S
    slot_token = slots % S
    slot_valid = (jnp.arange(A) < n_slots) & (mask_es[slots] > 0)

    x_rows = jnp.where(slot_valid[:, None], hidden[slot_token], 0)  # [A, D]
    counts = jnp.sum(expert_mask.astype(jnp.int32), axis=0)         # [E]
    kept = jnp.minimum(jnp.cumsum(counts), A)
    kept_counts = jnp.diff(jnp.concatenate([jnp.zeros(1, jnp.int32), kept.astype(jnp.int32)]))
    # Pad rows belong to the last group so every row is computed (zeros in →
    # zeros out; gmm leaves rows past sum(group_sizes) as garbage otherwise).
    pad = A - jnp.sum(kept_counts)
    group_sizes = kept_counts.at[E - 1].add(pad)

    def w(name):
        p = params[name]
        if hasattr(p, "q"):
            if p.s.shape[-2] > 1:  # group-wise scales: post-matmul scaling
                from ..ops.quant import dequantize  # doesn't factor — dequantize
                return dequantize(p, hidden.dtype)
            return p.q.astype(hidden.dtype)
        return p.astype(hidden.dtype)

    def scale(name, y):
        p = params[name]
        if hasattr(p, "q") and p.s.shape[-2] == 1:
            # per-expert scales [E, 1, N] → per-row via slot_expert
            return y * p.s[slot_expert, 0].astype(y.dtype)
        return y

    interpret = jax.default_backend() not in ("tpu", "axon")

    def run(x, wt):
        # Mosaic tile dims must divide (or equal) the array dims; the 2752
        # FFN dim is not 128-divisible, so those axes use full-dim tiles.
        # NOTE: measured on v5e, the dense all-experts einsum still wins at
        # flagship shapes (the batched einsum hits ~178 TFLOP/s effective
        # while gmm pays scatter/gather + large-tile overheads) — this path
        # is kept for load-imbalanced regimes and future tuning; 'dense'
        # stays the training default.
        K, Nn = wt.shape[-2], wt.shape[-1]
        tiling = (128, 128 if K % 128 == 0 else K, 128 if Nn % 128 == 0 else Nn)
        return gmm(x, wt, group_sizes, tiling=tiling,
                   preferred_element_type=jnp.float32, interpret=interpret)
    g = scale("gate", run(x_rows, w("gate")))
    u = scale("up", run(x_rows, w("up")))
    h = (jax.nn.silu(g) * u).astype(hidden.dtype)
    y = scale("down", run(h, w("down")))  # [A, D]

    w_rows = router_weight[slot_token, slot_expert] * expert_mask[
        slot_token, slot_expert
    ].astype(router_weight.dtype)
    w_rows = jnp.where(slot_valid, w_rows, 0)
    out = jnp.zeros((S, Dm), dtype=jnp.float32)
    out = out.at[slot_token].add(y.astype(jnp.float32) * w_rows[:, None].astype(jnp.float32))
    return out.astype(hidden.dtype)


def compress_matrix(A: jnp.ndarray, mask: jnp.ndarray, force_dim: int) -> jnp.ndarray:
    """Reference-surface pack: [S, E, ...] → [force_dim, E, ...] with each
    column's selected rows packed to the top in sequence order, zeros below
    (reference: utils/UniMoE_Audio_utils.py:436-485; `force_dim` is the
    static capacity — XLA shapes forbid the reference's dynamic max)."""
    S, E = mask.shape
    order = jnp.argsort(1 - mask.astype(jnp.int32), axis=0, stable=True)  # [S, E]
    idx = order[:force_dim]  # [X, E]
    gathered = jnp.take_along_axis(
        A, idx.reshape((min(force_dim, S),) + (E,) + (1,) * (A.ndim - 2)), axis=0
    ) if force_dim <= S else None
    if force_dim > S:
        pad = jnp.zeros((force_dim - S,) + A.shape[1:], dtype=A.dtype)
        base = jnp.take_along_axis(
            A, order.reshape((S, E) + (1,) * (A.ndim - 2)), axis=0
        )
        gathered = jnp.concatenate([base, pad], axis=0)
    counts = jnp.sum(mask.astype(jnp.int32), axis=0)
    valid = jnp.arange(force_dim)[:, None] < counts[None, :]
    return gathered * valid.reshape((force_dim, E) + (1,) * (A.ndim - 2)).astype(A.dtype)


def decompress_matrix(B_mat: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Inverse scatter of compress_matrix (reference:
    utils/UniMoE_Audio_utils.py:488-523): row c of column e returns to the
    c-th selected sequence position.  Unselected positions are zero."""
    S, E = mask.shape
    X = min(B_mat.shape[0], S)
    order = jnp.argsort(1 - mask.astype(jnp.int32), axis=0, stable=True)[:X]
    out = jnp.zeros((S, E) + B_mat.shape[2:], dtype=B_mat.dtype)
    e_idx = jnp.broadcast_to(jnp.arange(E)[None, :], (X, E))
    # Zero the over-capacity pack rows so they don't scatter garbage onto
    # re-used (wrapped) argsort positions.
    counts = jnp.sum(mask.astype(jnp.int32), axis=0)
    valid = (jnp.arange(X)[:, None] < counts[None, :]).reshape(
        (X, E) + (1,) * (B_mat.ndim - 2)
    )
    src = B_mat[:X] * valid.astype(B_mat.dtype)
    return out.at[order, e_idx].set(src)


def ep_capacity(expert_mask: jnp.ndarray, *, axis_name: Optional[str] = None) -> jnp.ndarray:
    """Max tokens routed to any expert, optionally pmax-synced across EP ranks
    (the reference's allreduce-MAX capacity sync,
    utils/UniMoE_Audio_core.py:455-457)."""
    cap = jnp.max(jnp.sum(expert_mask.astype(jnp.int32), axis=0))
    if axis_name is not None:
        cap = jax.lax.pmax(cap, axis_name)
    return cap
