"""The DCMoE block: dynamic-capacity Top-P MoE FFN with shared experts.

TPU-native port of UniMoEAudioSparseMoeBlock.forward (reference:
utils/UniMoE_Audio_core.py:196-358).  Pure function over a param pytree:

  params = {
    "gate":    [D, num_experts]               router projection (no bias)
    "dynamic": {"gate"/"up": [E_real, D, Fd], "down": [E_real, Fd, D]}
    "fixed":   {"gate"/"up": [n_fixed, D, Fs], "down": [n_fixed, Fs, D]}
  }

Null experts (indices [E_real, E_real+n_null)) are parameter-free and exist
only in the router (reference: AudioNullExpertMLP,
utils/UniMoE_Audio_core.py:52-61); dispatch slices them away.

Capacity is STATIC under jit (XLA shapes): callers pick the packed path's
capacity; `capacity == S` reproduces the reference's dropless dynamic
capacity exactly.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config import TextMoEConfig
from . import dispatch as D
from . import router as R


class MoEOutput(NamedTuple):
    hidden_states: jnp.ndarray       # [B, T, D]
    router_logits: jnp.ndarray       # [S, num_experts]
    router_top_k: jnp.ndarray        # [S]
    expert_mask: jnp.ndarray         # [S, num_experts]
    router_weight: jnp.ndarray       # [S, num_experts]
    aux_loss: jnp.ndarray            # scalar


def dcmoe_block(
    params: Dict,
    hidden_states: jnp.ndarray,
    cfg: TextMoEConfig,
    *,
    padding_token_mask: Optional[jnp.ndarray] = None,
    aux_balance_weight: Optional[jnp.ndarray] = None,
    training: bool = False,
    rng: Optional[jax.Array] = None,
    dispatch_mode: str = "dense",
    capacity: Optional[int] = None,
    assignment_budget: Optional[int] = None,
    ep_axis: str = "expert",
) -> MoEOutput:
    """Forward pass of the DCMoE block.

    Args:
      hidden_states: [B, T, D].
      padding_token_mask: [B, T] 1 for real tokens (gates expert selection;
        reference: utils/UniMoE_Audio_core.py:286-288).
      aux_balance_weight: [B, T] per-token emphasis for the aux loss.
      dispatch_mode: 'dense' | 'packed' | 'ep' | 'gmm' (see moe.dispatch),
        optionally with an '_a8' suffix ('packed_a8', ...): expert FFNs
        (dynamic AND fixed) run on the int8 MXU path — per-row activation
        quant, s8×s8→s32 dots at 2× bf16 throughput (the B=88 decode step
        is expert-compute-bound, docs/ROOFLINE.md).  Serving-only: a8
        with training=True is an error (round() has no gradient).
      capacity: static per-expert slot count for packed/ep paths.
    """
    a8 = dispatch_mode.endswith("_a8")
    if a8:
        dispatch_mode = dispatch_mode[: -len("_a8")]
        if training:
            raise ValueError("a8 expert compute is serving-only (round() "
                             "is not differentiable); drop the _a8 suffix "
                             "for training")
        if dispatch_mode == "gmm":
            raise ValueError("gmm dispatch has no a8 variant (the grouped "
                             "Pallas kernel is bf16; gmm is retired anyway "
                             "— docs/ROOFLINE.md)")
    B, T, dim = hidden_states.shape
    S = B * T
    E_dyn = cfg.num_dynamic_experts
    E_real = cfg.mlp_dynamic_expert_num
    E_total = cfg.num_experts
    original = hidden_states

    x = hidden_states
    if training and cfg.fp32_gate:
        x = x.astype(jnp.float32)
    if training and cfg.input_jitter_noise > 0:
        if rng is None:
            raise ValueError("training DCMoE requires an rng key")
        rng, jit_key = jax.random.split(rng)
        x = x * jax.random.uniform(
            jit_key, x.shape, dtype=x.dtype,
            minval=1.0 - cfg.input_jitter_noise, maxval=1.0 + cfg.input_jitter_noise,
        )
    x = x.reshape(S, dim)

    gate_w = params["gate"]
    if training and cfg.fp32_gate:
        gate_w = gate_w.astype(jnp.float32)
    full_router_logits = x @ gate_w  # [S, E_total]
    dynamic_logits = full_router_logits[:, :E_dyn].astype(jnp.float32)

    if cfg.mlp_dynamic_top_p != 0:
        dynamic_top_k = R.dynamic_expert_selection(dynamic_logits, cfg.mlp_dynamic_top_p)
    else:
        dynamic_top_k = jnp.full((S,), cfg.mlp_dynamic_top_k, dtype=jnp.int32)

    mixer_rng = None
    mixer_training = training and not cfg.ignore_differentiable_router
    if mixer_training:
        rng, mixer_rng = jax.random.split(rng)
        routing_weights, dyn_mask = R.sparse_expert_mixer(
            dynamic_logits,
            dynamic_top_k,
            max_k=E_dyn,
            jitter_eps=cfg.router_jitter_noise,
            training=True,
            rng=mixer_rng,
        )
    else:
        # Deterministic mixer: closed-form ranked softmax (== the scan with
        # training=False, value and gradient; tested in tests/test_router.py)
        # — removes max_k sequential rounds from the decode hot path.
        routing_weights, dyn_mask = R.sparse_expert_mixer_eval(
            dynamic_logits, dynamic_top_k, jitter_eps=cfg.router_jitter_noise
        )
    routing_weights = routing_weights / (
        jnp.sum(routing_weights, axis=-1, keepdims=True) + 1e-6
    )

    expert_mask = jnp.concatenate(
        [dyn_mask, jnp.zeros((S, E_total - E_dyn), dtype=jnp.int32)], axis=-1
    )
    if padding_token_mask is not None:
        expert_mask = expert_mask * padding_token_mask.reshape(S, 1).astype(jnp.int32)
    if E_dyn < E_total:
        # Fixed experts are always on (reference: utils/UniMoE_Audio_core.py:290-291).
        expert_mask = expert_mask.at[:, E_dyn:].set(1)

    aux_loss = R.load_balancing_loss(
        expert_mask,
        full_router_logits,
        E_dyn,
        None if aux_balance_weight is None else aux_balance_weight.reshape(S),
    )

    if cfg.token_drop:
        cap = R.expert_capacity(S, E_dyn, cfg.capacity_factor, cfg.min_capacity)
        cap = min(cap, S)
        dyn = expert_mask[:, :E_dyn]
        if cfg.drop_policy == "probs":
            # Keep each expert's top-`cap` tokens by router logit
            # (reference: utils/UniMoE_Audio_core.py:305-314).
            masked_logits = jnp.where(dyn > 0, dynamic_logits, jnp.finfo(jnp.float32).min)
            _, keep_idx = jax.lax.top_k(masked_logits.T, cap)  # [E_dyn, cap]
            cap_mask = jnp.zeros((E_dyn, S), dtype=jnp.int32)
            cap_mask = cap_mask.at[jnp.arange(E_dyn)[:, None], keep_idx].set(1)
            dyn = dyn * cap_mask.T
        elif cfg.drop_policy == "position":
            locations = jnp.cumsum(dyn, axis=0) - 1
            dyn = dyn * (locations < cap).astype(dyn.dtype)
        else:
            raise ValueError(f"Invalid drop_policy: {cfg.drop_policy}")
        expert_mask = jnp.concatenate([dyn, expert_mask[:, E_dyn:]], axis=-1)
        routing_weights = jnp.where(dyn > 0, routing_weights, 0.0)
        routing_weights = routing_weights / (
            jnp.sum(routing_weights, axis=-1, keepdims=True) + 1e-6
        )

    if E_dyn < E_total:
        global_weight = R.global_routing_weight(
            expert_mask, full_router_logits, E_dyn, routing_weights
        )
    else:
        global_weight = routing_weights

    x_orig = original.reshape(S, dim)
    gw = global_weight.astype(x_orig.dtype)

    real_mask = expert_mask[:, :E_real]
    real_w = gw[:, :E_real]
    if dispatch_mode == "dense":
        out = D.moe_ffn_dense(x_orig, real_mask, real_w, params["dynamic"],
                              a8=a8)
    elif dispatch_mode == "packed":
        out = D.moe_ffn_packed(
            x_orig, real_mask, real_w, params["dynamic"],
            capacity if capacity is not None else S, a8=a8
        )
    elif dispatch_mode == "ep":
        out = D.moe_ffn_ep(
            x_orig, real_mask, real_w, params["dynamic"], capacity if capacity is not None else S,
            axis_name=ep_axis, a8=a8,
        )
    elif dispatch_mode == "gmm":
        # NB: gmm's budget counts TOTAL (token, expert) assignments — a
        # different unit from the per-expert `capacity` knob.
        out = D.moe_ffn_gmm(
            x_orig, real_mask, real_w, params["dynamic"],
            assignment_budget=assignment_budget,
        )
    else:
        raise ValueError(f"Unknown dispatch_mode: {dispatch_mode}")

    if not training and cfg.avg_hidden_states_last and dispatch_mode == "ep":
        # Eval-time smoothing across the expert-parallel group (reference:
        # all_reduce AVG, utils/UniMoE_Audio_core.py:355-357).
        out = jax.lax.pmean(out, ep_axis)

    # Fixed (shared) experts: dense over all tokens, weighted
    # (reference: utils/UniMoE_Audio_core.py:344-351).
    if cfg.mlp_fixed_expert_num > 0:
        x_fixed = jnp.broadcast_to(
            x_orig[None], (cfg.mlp_fixed_expert_num,) + x_orig.shape
        )
        y_fixed = D.swiglu_expert_ffn(x_fixed, params["fixed"], a8=a8)  # [nF, S, D]
        # Combine as broadcast-multiply + reduce, not einsum: the einsum's
        # VJP emits a transposed dot whose sharding GSPMD can only satisfy
        # with involuntary full rematerialization under an expert-sharded
        # mesh (same reasoning as moe_ffn_dense's combine).
        w_fixed = jnp.swapaxes(gw[:, E_dyn:], 0, 1)[:, :, None]  # [nF, S, 1]
        out = out + jnp.sum(y_fixed * w_fixed.astype(y_fixed.dtype), axis=0)

    return MoEOutput(
        hidden_states=out.reshape(B, T, dim).astype(original.dtype),
        router_logits=full_router_logits,
        router_top_k=dynamic_top_k,
        expert_mask=expert_mask,
        router_weight=global_weight,
        aux_loss=aux_loss,
    )


def init_dcmoe_params(
    rng: jax.Array, cfg: TextMoEConfig, dtype=jnp.bfloat16
) -> Dict:
    """Random init of a DCMoE block param pytree (normal, std=initializer_range
    for the gate per reference FAST_INIT, utils/UniMoE_Audio_model.py:272-282;
    lecun-normal-style scaled init for expert projections)."""
    keys = jax.random.split(rng, 7)
    dim = cfg.hidden_size
    Fd, Fs = cfg.dynamic_intermediate_size, cfg.shared_intermediate_size
    Er, Nf = cfg.mlp_dynamic_expert_num, cfg.mlp_fixed_expert_num
    std = cfg.initializer_range

    def nrm(key, shape, scale):
        return (jax.random.normal(key, shape, dtype=jnp.float32) * scale).astype(dtype)

    return {
        "gate": nrm(keys[0], (dim, cfg.num_experts), std).astype(jnp.float32),
        "dynamic": {
            "gate": nrm(keys[1], (Er, dim, Fd), dim ** -0.5),
            "up": nrm(keys[2], (Er, dim, Fd), dim ** -0.5),
            "down": nrm(keys[3], (Er, Fd, dim), Fd ** -0.5),
        },
        "fixed": {
            "gate": nrm(keys[4], (Nf, dim, Fs), dim ** -0.5),
            "up": nrm(keys[5], (Nf, dim, Fs), dim ** -0.5),
            "down": nrm(keys[6], (Nf, Fs, dim), Fs ** -0.5),
        },
    }
