"""Pipeline parallelism: GPipe-style microbatched stage execution.

Beyond the reference (it has no PP — SURVEY §2.5); natural here because
every per-layer tensor is already layer-stacked [L, ...]: stage s owns the
contiguous layer slice [s·L/S, (s+1)·L/S).  Inside `shard_map` over a
'pipe' mesh axis, each device scans the classic (n_micro + S - 1)-tick
schedule: at tick t, stage s processes microbatch t-s and hands its
activations to stage s+1 via `lax.ppermute` (ICI neighbour transfer).

Forward-only eval/inference pipeline; `jax.grad` differentiates through
scan+ppermute so training works, with GPipe's (not 1F1B's) bubble profile.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import TextMoEConfig
from ..models.layers import attention, compute_mrope, rms_norm
from ..moe.block import dcmoe_block


def _stage_forward(stage_params: Dict, h: jnp.ndarray, cos, sin, cfg: TextMoEConfig,
                   kv_valid_mask, dispatch_mode: str):
    """Run this stage's local layer slice (a lax.scan, same body as
    models.model.text_model_forward without caches/aux collection)."""

    def layer_fn(x, lp):
        residual = x
        hn = rms_norm(x, lp["input_layernorm"], cfg.rms_norm_eps)
        attn_out, _ = attention(
            lp["attn"], hn, cos, sin, cfg, kv_valid_mask=kv_valid_mask,
            use_flash=False,
        )
        x = residual + attn_out
        residual = x
        hn = rms_norm(x, lp["post_attention_layernorm"], cfg.rms_norm_eps)
        moe_out = dcmoe_block(lp["moe"], hn, cfg, dispatch_mode=dispatch_mode)
        return residual + moe_out.hidden_states, None

    h, _ = jax.lax.scan(layer_fn, h, stage_params)
    return h


def pipeline_forward(
    layer_params: Dict,
    final_norm: jnp.ndarray,
    inputs_embeds: jnp.ndarray,       # [B, T, D]
    position_ids: jnp.ndarray,        # [3, B, T]
    cfg: TextMoEConfig,
    mesh: Mesh,
    *,
    axis: str = "pipe",
    n_micro: Optional[int] = None,
    attention_mask: Optional[jnp.ndarray] = None,
    dispatch_mode: str = "dense",
) -> jnp.ndarray:
    """Stage-sharded forward over mesh axis `axis`.

    layer_params: the layer-stacked pytree (leading dim L divisible by the
    number of stages).  Returns the final-norm hidden states [B, T, D].
    """
    S = mesh.shape[axis]
    B, T, D = inputs_embeds.shape
    n_micro = n_micro or S
    assert B % n_micro == 0, f"batch {B} must divide into {n_micro} microbatches"
    mb = B // n_micro
    L = jax.tree.leaves(layer_params)[0].shape[0]
    assert L % S == 0, f"layers {L} must divide into {S} stages"

    cos, sin = compute_mrope(position_ids, cfg.head_dim, cfg.rope_theta, cfg.mrope_section)
    micro_x = inputs_embeds.reshape(n_micro, mb, T, D)
    micro_cos = cos.reshape(n_micro, mb, T, -1)
    micro_sin = sin.reshape(n_micro, mb, T, -1)
    micro_mask = (
        attention_mask.reshape(n_micro, mb, T) if attention_mask is not None
        else jnp.ones((n_micro, mb, T), jnp.int32)
    )

    # Stage-sharded params: layer axis split into [S, L/S, ...].
    staged = jax.tree.map(lambda a: a.reshape((S, L // S) + a.shape[1:]), layer_params)

    def run(staged_local, mx, mc, ms, mm):
        stage = jax.lax.axis_index(axis)
        local = jax.tree.map(lambda a: a[0], staged_local)  # [L/S, ...]
        n_ticks = n_micro + S - 1

        def tick(carry, t):
            outputs, held = carry
            # Microbatch this stage works on at tick t.
            mb_idx = t - stage
            active = (mb_idx >= 0) & (mb_idx < n_micro)
            idx = jnp.clip(mb_idx, 0, n_micro - 1)
            # Stage 0 reads fresh input; later stages use what arrived.
            x_in = jnp.where(stage == 0, mx[idx], held)
            c, s_, m = mc[idx], ms[idx], mm[idx]
            y = _stage_forward(local, x_in, c, s_, cfg, m, dispatch_mode)
            y = jnp.where(active, y, held)
            # Pass activations to the next stage (ring; last stage's output
            # wraps to stage 0 where it is ignored).
            passed = jax.lax.ppermute(
                y, axis, [(i, (i + 1) % S) for i in range(S)]
            )
            # Last stage banks finished microbatches.
            outputs = jnp.where(
                (stage == S - 1) & active,
                outputs.at[idx].set(y),
                outputs,
            )
            return (outputs, passed), None

        init_out = jnp.zeros_like(mx)
        (outputs, _), _ = jax.lax.scan(
            tick, (init_out, jnp.zeros_like(mx[0])), jnp.arange(n_ticks)
        )
        # Broadcast the last stage's results to every device (masked psum).
        outputs = jax.lax.psum(
            jnp.where(stage == S - 1, outputs, jnp.zeros_like(outputs)), axis
        )
        return outputs

    from jax import shard_map

    out = shard_map(
        run,
        mesh=mesh,
        in_specs=(P(axis), P(), P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )(staged, micro_x, micro_cos, micro_sin, micro_mask)

    h = out.reshape(B, T, D)
    return rms_norm(h, final_norm, cfg.rms_norm_eps)
