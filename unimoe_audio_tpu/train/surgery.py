"""Dense→MoE initialization surgery.

Port of initial_model's state-dict surgery (reference:
UniMoEV2-Preview/training/train_unimoev2_qwen2vl.py:109-261): a dense
Qwen FFN of intermediate size F seeds the experts —

  * dynamic expert e takes the contiguous slice
    [offset_e, offset_e + F_d) of the dense intermediate dim with
    ROTATING offsets offset_e = (e · F_d) mod F (the reference's
    EP-rank-aware progression collapses to exactly this in a global
    expert-stacked layout: rank r's initial offset is
    (r·E_local·F_d) mod F and advances F_d per local expert);
  * every fixed expert takes the leading slice [0, F_s);
  * moe_copy='single' seeds only expert 0, the rest random-init;
  * moe_copy='none' leaves all experts random-init;
  * the router gate is always fresh random-init.
"""

from __future__ import annotations

from typing import Dict, Literal

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TextMoEConfig


def dense_ffn_to_experts(
    dense: Dict[str, np.ndarray],   # {"gate"/"up": [D, F], "down": [F, D]}
    cfg: TextMoEConfig,
    *,
    moe_copy: Literal["all", "single", "none"] = "all",
    rng: jax.Array = None,
) -> Dict[str, Dict[str, np.ndarray]]:
    """One layer's dense FFN → {"dynamic": {...[E_r,...]}, "fixed": {...}}."""
    F = dense["gate"].shape[1]
    Fd, Fs = cfg.dynamic_intermediate_size, cfg.shared_intermediate_size
    Er, Nf = cfg.mlp_dynamic_expert_num, cfg.mlp_fixed_expert_num
    assert F % Fd == 0 and F % Fs == 0, (
        f"dense intermediate {F} must divide into expert sizes {Fd}/{Fs}"
    )
    if rng is None:
        rng = jax.random.PRNGKey(0)

    def dyn_slice(w, e, axis):
        off = (e * Fd) % F
        sl = [slice(None)] * w.ndim
        sl[axis] = slice(off, off + Fd)
        return np.asarray(w[tuple(sl)])

    def rand_like(key, shape, std):
        return np.asarray(jax.random.normal(key, shape) * std, dtype=np.float32)

    keys = jax.random.split(rng, 3 * Er)
    std = cfg.initializer_range
    D = dense["gate"].shape[0]

    dynamic = {"gate": [], "up": [], "down": []}
    for e in range(Er):
        if moe_copy == "all" or (moe_copy == "single" and e == 0):
            dynamic["gate"].append(dyn_slice(dense["gate"], e, axis=1))
            dynamic["up"].append(dyn_slice(dense["up"], e, axis=1))
            dynamic["down"].append(dyn_slice(dense["down"], e, axis=0))
        else:
            dynamic["gate"].append(rand_like(keys[3 * e], (D, Fd), std))
            dynamic["up"].append(rand_like(keys[3 * e + 1], (D, Fd), std))
            dynamic["down"].append(rand_like(keys[3 * e + 2], (Fd, D), std))
    fixed = {
        "gate": [np.asarray(dense["gate"][:, :Fs]) for _ in range(Nf)],
        "up": [np.asarray(dense["up"][:, :Fs]) for _ in range(Nf)],
        "down": [np.asarray(dense["down"][:Fs, :]) for _ in range(Nf)],
    }
    return {
        "dynamic": {k: np.stack(v) for k, v in dynamic.items()},
        "fixed": {k: np.stack(v) for k, v in fixed.items()},
    }


def moeify_dense_params(
    dense_params: Dict,
    cfg: TextMoEConfig,
    *,
    moe_copy: Literal["all", "single", "none"] = "all",
    rng: jax.Array = None,
    dtype=jnp.bfloat16,
) -> Dict:
    """Full-model surgery: a dense param pytree (same layout as
    init_model_params but with layers.mlp {"gate"/"up": [L, D, F],
    "down": [L, F, D]} instead of layers.moe) → a DCMoE pytree."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    L = cfg.num_hidden_layers
    D = cfg.hidden_size
    dense_mlp = dense_params["layers"]["mlp"]

    moe_layers = {"gate": [], "dynamic": [], "fixed": []}
    keys = jax.random.split(rng, L + 1)
    for l in range(L):
        per_layer = dense_ffn_to_experts(
            {k: np.asarray(dense_mlp[k][l]) for k in ("gate", "up", "down")},
            cfg, moe_copy=moe_copy, rng=keys[l],
        )
        moe_layers["dynamic"].append(per_layer["dynamic"])
        moe_layers["fixed"].append(per_layer["fixed"])
        # Fresh router gate (the reference never copies it; FAST_INIT
        # normal(0, initializer_range), utils/UniMoE_Audio_model.py:274-278).
        moe_layers["gate"].append(np.asarray(
            jax.random.normal(jax.random.fold_in(keys[L], l), (D, cfg.num_experts))
            * cfg.initializer_range, dtype=np.float32,
        ))

    stacked_moe = {
        "gate": np.stack(moe_layers["gate"]),
        "dynamic": jax.tree.map(lambda *xs: np.stack(xs), *moe_layers["dynamic"]),
        "fixed": jax.tree.map(lambda *xs: np.stack(xs), *moe_layers["fixed"]),
    }
    out = dict(dense_params)
    # Pure-function contract: shallow-copy containers; never mutate the
    # caller's pytree (the previous .pop('mlp') destroyed the input).
    out["layers"] = {k: v for k, v in dense_params["layers"].items()
                     if k != "mlp"}
    out["layers"]["moe"] = stacked_moe
    out = jax.tree.map(lambda a: jnp.asarray(a, dtype=dtype), out)
    # The router gate stays fp32 (fp32_gate contract, init_dcmoe_params).
    out["layers"]["moe"]["gate"] = out["layers"]["moe"]["gate"].astype(jnp.float32)
    return out
