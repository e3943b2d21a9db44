#!/usr/bin/env python3
"""Probe: megablox gmm vs packed vs dense dispatch — the retirement table.

SURVEY.md §7 planned a Pallas ragged grouped-GEMM as the EP dispatch
centerpiece (vs the reference's capacity-padded compress+einsum,
/root/reference/utils/UniMoE_Audio_core.py:459-488).  Rounds 2-4 found it
loses at every regime tried; this probe produces the durable table that
either justifies auto-selecting it somewhere or retires it for good
(VERDICT r4 item 5).  Regimes:

  decode   — the serving hot path: S=176 (B=88 CFG rows), mean k≈4.1
  train-u  — training, uniform low-k: S=4096, k=2
  train-s  — training, 80% of assignments on 2 of 8 experts, S=4096
  long-s   — large-S skew where ragged grouping has the most to save:
             S=8192, 90% on 2 experts (capacity padding is worst here)

Each regime times the three dispatch fns on flagship-width experts
(D=2048, F=2816 lane-padded, E=8) in bf16 inside one jit loop
(utils/profiling.timeit_in_jit) and prints one JSON line per point plus
a summary with the best mode per regime.

Run on the real chip: python tools/probe_gmm.py   (~5 min, claims HBM)
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from unimoe_audio_tpu.moe import dispatch as D
from unimoe_audio_tpu.utils.profiling import timeit_in_jit

E, DM, FF = 8, 2048, 2816


def make_params(key):
    ks = jax.random.split(key, 3)
    scale = DM ** -0.5
    return {
        "gate": jax.random.normal(ks[0], (E, DM, FF), jnp.bfloat16) * scale,
        "up": jax.random.normal(ks[1], (E, DM, FF), jnp.bfloat16) * scale,
        "down": jax.random.normal(ks[2], (E, FF, DM), jnp.bfloat16) * scale,
    }


def make_routing(key, S, kbar, skew_frac=None, skew_experts=2):
    """Random expert mask with mean k assignments/token; optionally
    concentrate `skew_frac` of assignments on the first `skew_experts`."""
    kw, ke = jax.random.split(key)
    if skew_frac is None:
        probs = jnp.full((E,), kbar / E)
    else:
        hot = skew_frac * kbar / skew_experts
        cold = (1 - skew_frac) * kbar / (E - skew_experts)
        probs = jnp.concatenate([
            jnp.full((skew_experts,), hot), jnp.full((E - skew_experts,), cold)])
    mask = (jax.random.uniform(ke, (S, E)) < probs[None, :]).astype(jnp.int32)
    w = jax.nn.softmax(jax.random.normal(kw, (S, E)), axis=-1)
    w = w * mask
    w = w / (w.sum(-1, keepdims=True) + 1e-6)
    return mask, w.astype(jnp.float32)


def main():
    dev = jax.devices()[0]
    print(json.dumps({"device": str(dev)}), flush=True)
    params = make_params(jax.random.PRNGKey(0))
    regimes = [
        ("decode", 176, 4.1, None, 112),
        ("train-u", 4096, 2.0, None, 1536),
        ("train-s", 4096, 2.0, 0.8, 3584),
        ("long-s", 8192, 2.0, 0.9, 8192),
    ]
    summary = {}
    for name, S, kbar, skew, cap in regimes:
        mask, w = make_routing(jax.random.PRNGKey(1), S, kbar, skew)
        x = jax.random.normal(jax.random.PRNGKey(2), (S, DM), jnp.bfloat16)
        n_assign = int(mask.sum())
        budget = ((n_assign + 255) // 128) * 128  # headroom, 128-aligned
        # params passes as an ARGUMENT: closing over the ~280 MB expert
        # weights serializes them into the program and the axon remote
        # compile rejects it (HTTP 413 — CLAUDE.md gotcha).
        fns = {
            "dense": lambda x, m, w, p: D.moe_ffn_dense(x, m, w, p),
            "packed": lambda x, m, w, p: D.moe_ffn_packed(x, m, w, p, cap),
            "gmm": lambda x, m, w, p: D.moe_ffn_gmm(
                x, m, w, p, assignment_budget=budget),
        }
        row = {"regime": name, "S": S, "assignments": n_assign, "cap": cap}
        best, best_t = None, 1e9
        for mode, fn in fns.items():
            try:
                t = timeit_in_jit(fn, x, mask, w, params, iters=8)
            except Exception as e:  # noqa: BLE001 — record, keep probing
                row[mode + "_ms"] = None
                row[mode + "_err"] = f"{type(e).__name__}: {e}"[:120]
                continue
            row[mode + "_ms"] = round(t * 1e3, 3)
            if t < best_t:
                best, best_t = mode, t
        if row.get("gmm_ms") and row.get("packed_ms"):
            row["gmm_vs_best_other"] = round(
                row["gmm_ms"] / min(v for k, v in row.items()
                                    if k in ("dense_ms", "packed_ms") and v), 2)
        row["best"] = best
        summary[name] = best
        print(json.dumps(row), flush=True)
    print(json.dumps({"best_per_regime": summary}), flush=True)


if __name__ == "__main__":
    main()
