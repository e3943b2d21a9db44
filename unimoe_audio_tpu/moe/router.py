"""DCMoE routing math — Top-P expert-count selection + iterative expert mixer.

TPU-native re-implementation of the reference router
(reference: utils/UniMoE_Audio_core.py:64-193).  Two key departures from the
reference, both for XLA-friendliness with identical semantics:

1.  The reference buckets tokens by their dynamic top-k and runs the
    iterative mixer separately per bucket (utils/UniMoE_Audio_core.py:262-282,
    a Python loop over up to 9 groups).  Each mixer round depends only on the
    running masked-score state — not on the bucket's k — so we run a single
    `lax.scan` of max_k rounds over ALL tokens and mask round r's
    contribution by `r < top_k(token)`.  Bit-identical results, one fused
    kernel, no host-side bucketing.

2.  The reference's custom autograd function (AudioMoERoutingFunction,
    utils/UniMoE_Audio_core.py:64-91) implements (a) the exact
    softmax-gather gradient w.r.t. unmasked scores and (b) a straight-through
    pass that ignores the Bernoulli mask_for_one scaling in the backward.
    Both fall out of ordinary JAX autodiff by construction:
      (a) build masked_gates = where(stop_grad(mask), -inf, scores) and
          gather from softmax(masked_gates) — autodiff of that expression IS
          the reference backward;
      (b) out = m + stop_grad(m * c - m) has value m*c and gradient dm.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = jnp.float32(-1e30)


def dynamic_expert_selection(logits: jnp.ndarray, top_p: float) -> jnp.ndarray:
    """Per-token dynamic expert count via cumulative-probability threshold.

    Port of audio_dynamic_expert_selection (reference:
    utils/UniMoE_Audio_core.py:157-167): softmax → sort desc → cumsum →
    count entries with cumsum < top_p, plus one.

    Args:
      logits: [S, E_dyn] dynamic router logits.
    Returns:
      [S] int32 per-token k in [1, E_dyn].
    """
    scores = jax.nn.softmax(logits, axis=-1)
    scores_sorted = jnp.sort(scores, axis=-1)[:, ::-1]
    csum = jnp.cumsum(scores_sorted, axis=-1)
    k = jnp.sum((csum < top_p).astype(jnp.int32), axis=-1) + 1
    return k


class MixerResult(NamedTuple):
    routing_weights: jnp.ndarray  # [S, E_dyn] scatter of per-round multipliers
    expert_mask: jnp.ndarray      # [S, E_dyn] int32 selection counts (0/1)


def sparse_expert_mixer(
    scores: jnp.ndarray,
    top_k: jnp.ndarray,
    *,
    max_k: int,
    jitter_eps: float,
    training: bool = False,
    rng: Optional[jax.Array] = None,
    return_internals: bool = False,
) -> MixerResult:
    """Iterative argmax-without-replacement expert mixer, vectorized over k.

    Port of audio_sparse_expert_mixer (reference:
    utils/UniMoE_Audio_core.py:94-154).  Runs max_k rounds for every token;
    round r contributes only where r < top_k[token].

    Per round (on running state `masked_scores`, initially == scores):
      * threshold mask: (max(masked_scores) - scores)/clamp(|scores|,|max|)
        > 2*jitter_eps  → excluded from this round's softmax
      * eval: select argmax(masked_scores); train: argmax(masked_gates+gumbel)
      * multiplier = softmax(masked_gates)[selected]; training additionally
        applies the Bernoulli(0.75) straight-through mask_for_one scaling
      * selected expert's score is knocked out (-inf) for later rounds

    Args:
      scores: [S, E_dyn] dynamic router logits (fp32 recommended).
      top_k: [S] int32 per-token round count.
      max_k: static upper bound on rounds (== E_dyn).
      jitter_eps: router_jitter_noise config value.
      training: enables Gumbel exploration + straight-through scaling.
      rng: PRNG key, required when training.
    Returns:
      routing_weights [S, E_dyn] (un-normalized), expert_mask [S, E_dyn].
    """
    S, E = scores.shape
    scores = scores.astype(jnp.float32)
    if training and rng is None:
        raise ValueError("training mixer requires an rng key")
    round_keys = (
        jax.random.split(rng, max_k) if training else jnp.zeros((max_k, 2), dtype=jnp.uint32)
    )

    def round_fn(masked_scores, round_in):
        r, key = round_in
        # Threshold mask computed on non-differentiable state (reference wraps
        # this block in torch.no_grad, utils/UniMoE_Audio_core.py:104-107).
        ms = jax.lax.stop_gradient(masked_scores)
        mask_logits_threshold = jnp.max(ms, axis=-1, keepdims=True)
        max_ind = jnp.argmax(ms, axis=-1)
        factor = jnp.maximum(jnp.abs(jax.lax.stop_gradient(scores)), jnp.abs(mask_logits_threshold))
        excluded = ((mask_logits_threshold - jax.lax.stop_gradient(scores)) / factor) > (2 * jitter_eps)

        # Differentiable gates: -inf at excluded, raw scores elsewhere. Using
        # `scores` (not masked_scores) keeps the gradient path identical to the
        # reference backward: previously-knocked-out experts are inside
        # `excluded` by construction (their state is -inf ⇒ ratio huge).
        knocked_out = ms <= NEG_INF
        gate_mask = jnp.logical_or(excluded, knocked_out)
        masked_gates = jnp.where(gate_mask, NEG_INF, scores)
        probs = jax.nn.softmax(masked_gates, axis=-1)

        if training:
            gumbel = jax.random.gumbel(key, shape=scores.shape, dtype=jnp.float32)
            selected = jnp.argmax(jnp.where(gate_mask, NEG_INF, ms) + gumbel, axis=-1)
        else:
            selected = max_ind

        multiplier_o = jnp.take_along_axis(probs, selected[:, None], axis=-1)[:, 0]

        if training:
            probs_max_ind = jnp.argmax(jax.lax.stop_gradient(probs), axis=-1)
            coin = jax.random.uniform(jax.random.fold_in(key, 1), shape=(S,))
            mask_for_one = jnp.logical_or(selected == probs_max_ind, coin > 0.75)
            mask_for_one = 0.3333 + 0.6667 * mask_for_one.astype(jnp.float32)
            # Straight-through: value m*c, gradient dm (reference backward
            # ignores mask_for_one, utils/UniMoE_Audio_core.py:82-91).
            multiplier = multiplier_o + jax.lax.stop_gradient(
                multiplier_o * mask_for_one - multiplier_o
            )
        else:
            multiplier = multiplier_o

        # Knock out the selected expert for subsequent rounds.
        new_state = jnp.where(
            jax.nn.one_hot(selected, E, dtype=jnp.bool_), NEG_INF, masked_scores
        )
        return new_state, (multiplier, selected, gate_mask)

    rounds = jnp.arange(max_k)
    _, (multipliers, selections, gate_masks) = jax.lax.scan(
        round_fn, scores, (rounds, round_keys)
    )
    # multipliers: [max_k, S]; selections: [max_k, S]; gate_masks: [max_k, S, E]

    active = rounds[:, None] < top_k[None, :]  # [max_k, S]
    onehots = jax.nn.one_hot(selections, E, dtype=jnp.float32)  # [max_k, S, E]
    # Broadcast-multiply + reduce over the k rounds instead of einsum: the
    # contraction is tiny (k ≤ E, VPU work either way) and the einsum's VJP
    # emits transposed dots whose shardings cost GSPMD involuntary full
    # rematerialization under a dp×ep×tp mesh.
    onehots_sg = jax.lax.stop_gradient(onehots)
    w = jnp.sum(jnp.where(active, multipliers, 0.0)[:, :, None] * onehots, axis=0)
    m = jnp.sum(jnp.where(active[:, :, None], onehots_sg, 0.0), axis=0)
    result = MixerResult(routing_weights=w, expert_mask=m.astype(jnp.int32))
    if return_internals:
        return result, {
            "multipliers": multipliers,
            "selections": selections,
            "gate_masks": gate_masks,
            "active": active,
        }
    return result


def sparse_expert_mixer_eval(
    scores: jnp.ndarray,
    top_k: jnp.ndarray,
    *,
    jitter_eps: float,
) -> MixerResult:
    """Closed-form eval mixer — one sort instead of max_k scan rounds.

    At eval (no Gumbel, no straight-through) round r of the iterative mixer
    deterministically selects the r-th ranked expert, and its multiplier is
    a softmax over the experts within the 2·jitter_eps relative threshold
    of the r-th ranked score, restricted to not-yet-selected experts:

      mult_r = exp(v_r) / Σ_{j ≥ r, near_r(j)} exp(v_j),   v = sort desc

    This is exactly sparse_expert_mixer(training=False) (equality tested in
    tests/test_router.py) without the sequential scan — the scan costs
    ~1.3 ms/step of per-round gathers at decode shapes across 36 layers.
    Gradients also match: the permutation and the near-set mask are
    stop-gradded (the scan computes them under stop_grad too), so the
    gradient is the same masked-softmax-gather gradient.
    """
    S, E = scores.shape
    scores = scores.astype(jnp.float32)
    # Descending stable order WITHOUT a sort: E is tiny (≤ 11), so the
    # O(E²) pairwise comparison matrix is pure fusable VPU work while a
    # per-layer lax.sort costs ~13 µs of dispatch overhead × 36 layers ×
    # every decode step (xprof: 2.6% of device time in category "sort").
    # rank[s, e] = |{j : v_j > v_e, or v_j == v_e and j < e}| reproduces
    # lax.sort_key_val's stable descending permutation exactly (ties keep
    # index order).  oh[s, r, e] = (rank[s, e] == r) is the permutation
    # one-hot the combine below already consumed; the sorted values are
    # its exact one-hot contraction with the scores.  Gradient flows
    # through v via the (constant, stop-gradded) permutation — same as
    # gathering with a stop-gradded order.
    ss = jax.lax.stop_gradient(scores)
    gt = ss[:, None, :] > ss[:, :, None]                     # [S, e, j]
    eq = ss[:, None, :] == ss[:, :, None]
    idx = jnp.arange(E, dtype=jnp.int32)
    tie = eq & (idx[None, :, None] > idx[None, None, :])     # j < e wins ties
    rank = jnp.sum((gt | tie).astype(jnp.int32), axis=-1)    # [S, E]
    ranks = jnp.arange(E)
    oh = (rank[:, :, None] == ranks[None, None, :]).astype(jnp.float32)
    # oh[s, e, r]: expert e sits at rank r.  v[s, r] = Σ_e oh·scores.
    v = jnp.sum(oh * scores[:, :, None], axis=1)             # [S, E] desc
    oh = jnp.swapaxes(oh, 1, 2)                              # [S, r, e]
    vs = jax.lax.stop_gradient(v)
    # ratio[s, r, j] = (v_r - v_j) / max(|v_r|, |v_j|); expert at rank j is
    # in round r's softmax iff j >= r and NOT(ratio > 2·eps) — the negated
    # form mirrors the reference's `excluded = ratio > threshold` so 0/0
    # NaNs fall on the included side exactly like the scan path.
    factor = jnp.maximum(jnp.abs(vs)[:, :, None], jnp.abs(vs)[:, None, :])
    ratio = (vs[:, :, None] - vs[:, None, :]) / factor       # [S, r, j]
    ranks = jnp.arange(E)
    include = (ranks[None, None, :] >= ranks[None, :, None]) & ~(
        ratio > 2 * jitter_eps
    )                                                        # [S, r, j]
    include = jax.lax.stop_gradient(include)
    # mult_r = softmax over included at rank r, evaluated at v_r:
    # 1 / Σ_j include · exp(v_j - v_r)   (v_j ≤ v_r for included j ⇒ stable)
    z = jnp.exp(v[:, None, :] - jax.lax.stop_gradient(v)[:, :, None])
    # Differentiable numerator/denominator pair equal to the scan's
    # softmax(masked_gates)[selected]: exp(v_r)/Σ include exp(v_j).
    denom = jnp.sum(jnp.where(include, z, 0.0), axis=-1)     # [S, r]
    num = jnp.exp(v - jax.lax.stop_gradient(v))              # == 1, grads flow
    mult = num / denom                                       # [S, r]
    active = ranks[None, :] < top_k[:, None]                 # [S, r]
    # Rank→expert scatter through the permutation one-hot built above
    # (put_along_axis lowers to a TPU scatter, measured slower than the
    # scan this mixer replaces).  Broadcast-multiply + reduce over ranks
    # (see sparse_expert_mixer: the einsum form costs involuntary full
    # remat in the VJP under GSPMD).
    w = jnp.sum(jnp.where(active, mult, 0.0)[:, :, None] * oh, axis=1)
    m = jnp.sum(jnp.where(active[:, :, None], oh, 0.0), axis=1)
    return MixerResult(routing_weights=w, expert_mask=m.astype(jnp.int32))


def global_routing_weight(
    expert_mask: jnp.ndarray,
    full_router_logits: jnp.ndarray,
    num_dynamic: int,
    routing_weights: jnp.ndarray,
) -> jnp.ndarray:
    """Renormalize the full softmax over selected experts; scale the dynamic
    block by its group mass.

    Port of calculate_audio_global_routing_weight (reference:
    utils/UniMoE_Audio_core.py:178-193).
    """
    masked = jnp.where(expert_mask == 0, NEG_INF, full_router_logits.astype(jnp.float32))
    gw = jax.nn.softmax(masked, axis=-1)
    dyn, fixed = gw[:, :num_dynamic], gw[:, num_dynamic:]
    dyn_mass = jnp.sum(dyn, axis=-1, keepdims=True)
    return jnp.concatenate([routing_weights * dyn_mass, fixed], axis=-1)


def load_balancing_loss(
    expert_mask: jnp.ndarray,
    full_router_logits: jnp.ndarray,
    num_dynamic: int,
    aux_balance_weight: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Switch-style load-balancing aux loss over the dynamic (+null) experts.

    Port of audio_load_balancing_loss_func (reference:
    utils/UniMoE_Audio_core.py:361-389).  `aux_balance_weight`, when given,
    is a flat [S] per-token emphasis weight (the reference reshapes a
    [B, T] map; callers flatten it here).
    """
    masked = jnp.where(
        expert_mask == 0, jnp.finfo(jnp.float32).min, full_router_logits.astype(jnp.float32)
    )
    gw = jax.nn.softmax(masked[:, :num_dynamic], axis=-1)
    dyn_mask = expert_mask[:, :num_dynamic].astype(jnp.float32)
    if aux_balance_weight is None:
        tokens_per_expert = jnp.mean(dyn_mask, axis=0)
        prob_per_expert = jnp.mean(gw, axis=0)
    else:
        wgt = aux_balance_weight.astype(jnp.float32)[:, None]
        denom = jnp.sum(wgt, axis=0) + 1e-9
        tokens_per_expert = jnp.sum(dyn_mask * wgt, axis=0) / denom
        prob_per_expert = jnp.sum(gw * wgt, axis=0) / denom
    return jnp.sum(tokens_per_expert * prob_per_expert) * num_dynamic


def expert_capacity(num_tokens: int, num_experts: int, capacity_factor: float, min_capacity: int) -> int:
    """Static expert capacity (reference: utils/UniMoE_Audio_core.py:170-175)."""
    import math

    capacity = math.ceil(num_tokens / num_experts * capacity_factor)
    return max(capacity, min_capacity)
