#!/usr/bin/env python3
"""Probe: speculative decoding on the REAL chip at flagship scale.

VERDICT r4 item 9: generate/speculative.py is built and exactness-tested
(tests/test_speculative.py) but had no TPU number.  Single-stream greedy
latency (int4 experts, 6.23 ms/step → 3.21× RT) is its target use case.

This probe measures, on the real chip with flagship (36L) int4 params:
  1. baseline: generate_jit greedy ms/step (the 3.21× operating point),
  2. speculative_generate_jit at a (draft_layers, spec_len) grid —
     real end-to-end RTF with the acceptance rate random weights give
     (draft = first-K layers of the same stack: alpha is low on random
     weights, so this is the mechanics-cost lower bound), and
  3. the component costs the economics need: with decode weight-
     streaming-bound, a K-layer draft step ≈ K/36 of a full step and a
     verify ≈ one full step over spec_len positions; projected speedup
     at acceptance alpha:  (alpha·(d−1) + 1) / ((d−1)·K/36 + 1 + eps).
     The projection is evaluated at the toy-TRAINED alphas from
     tools/probe_speculative.py (CPU, trained model), giving the
     accept/reject decision data the battery row needs.

Run: python tools/probe_speculative_tpu.py   (~10 min, claims HBM)
Prints one JSON line per point + a decision summary line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from unimoe_audio_tpu.config import TextMoEConfig, UniMoEAudioConfig
from unimoe_audio_tpu.codec import delay as dl
from unimoe_audio_tpu.generate.loop import generate_jit, pad_buffer
from unimoe_audio_tpu.generate.speculative import speculative_generate_jit
from unimoe_audio_tpu.models.model import init_model_params
from unimoe_audio_tpu.ops.quant import (
    pad_expert_ffn, quantize_model_params_inplace,
    requantize_experts_int4_inplace,
)

FRAME_RATE = 50.0
MAX_TOKENS = 100


def main():
    print(json.dumps({"device": str(jax.devices()[0])}), flush=True)
    cfg = UniMoEAudioConfig(text_config=TextMoEConfig(), vision_config=None)
    t0 = time.time()
    params = jax.jit(lambda k: init_model_params(k, cfg, dtype=jnp.bfloat16))(
        jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    params = quantize_model_params_inplace(params)
    params = pad_expert_ffn(params)
    params = requantize_experts_int4_inplace(params)
    print(json.dumps({"init_quant_s": round(time.time() - t0, 1)}), flush=True)

    T_text = 32
    ids = jnp.asarray(np.random.default_rng(0).integers(
        0, cfg.text_config.vocab_size - 1, size=(2, T_text)))
    attn = jnp.ones((2, T_text), jnp.int32)
    prefill, steps = dl.prepare_audio_prompt(
        [None], num_channels=cfg.codec_channels,
        bos_value=cfg.codec_bos_value, delay_pattern=cfg.codec_delay_pattern)
    buf = pad_buffer(prefill, MAX_TOKENS)
    steps = jnp.asarray(steps, jnp.int32)

    common = dict(
        cfg_scale=jnp.float32(10.0),
        eos_prob_mul_factor=jnp.float32(0.6),
        min_tokens=jnp.int32(MAX_TOKENS),
    )

    # ---- baseline greedy ------------------------------------------------
    kw = dict(max_tokens=MAX_TOKENS, do_sample=False, temperature=jnp.float32(1.0),
              top_p=jnp.float32(1.0), cfg_filter_top_k=45, **common)
    r = generate_jit(params, cfg, ids, attn, None, buf, steps,
                     jax.random.PRNGKey(0), **kw)
    jax.block_until_ready(r.codes)
    best = 1e9
    for _ in range(2):
        t0 = time.time()
        r = generate_jit(params, cfg, ids, attn, None, buf, steps,
                         jax.random.PRNGKey(1), **kw)
        jax.block_until_ready(r.codes)
        best = min(best, (time.time() - t0) / int(r.steps))
    base_ms = best * 1e3
    base_rtf = 1.0 / best / FRAME_RATE
    print(json.dumps({"baseline_ms_per_step": round(base_ms, 2),
                      "baseline_rtf": round(base_rtf, 2)}), flush=True)

    # ---- speculative grid ----------------------------------------------
    L = cfg.text_config.num_hidden_layers
    results = []
    for draft_layers in (6, 12):
        for spec_len in (3, 5):
            skw = dict(max_tokens=MAX_TOKENS, spec_len=spec_len,
                       draft_layers=draft_layers, **common)
            try:
                s = speculative_generate_jit(params, cfg, ids, attn, None,
                                             buf, steps, **skw)
                jax.block_until_ready(s.codes)
                bt = 1e9
                for _ in range(2):
                    t0 = time.time()
                    s = speculative_generate_jit(params, cfg, ids, attn, None,
                                                 buf, steps, **skw)
                    jax.block_until_ready(s.codes)
                    bt = min(bt, (time.time() - t0) / max(int(s.frames), 1))
                alpha = float(s.accept_rate)
                row = {
                    "draft_layers": draft_layers, "spec_len": spec_len,
                    "measured_ms_per_frame": round(bt * 1e3, 2),
                    "measured_rtf": round(1.0 / bt / FRAME_RATE, 2),
                    "alpha_random_weights": round(alpha, 3),
                    "cycles": int(s.cycles), "frames": int(s.frames),
                }
                # Projection at trained-model alphas (probe_speculative.py
                # toy-trained grid measured alpha in this band).
                frac = draft_layers / L
                for a in (0.5, 0.7, 0.9):
                    speed = (a * (spec_len - 1) + 1) / ((spec_len - 1) * frac + 1)
                    row[f"projected_rtf_alpha{a}"] = round(base_rtf * speed, 2)
                results.append(row)
                print(json.dumps(row), flush=True)
            except Exception as e:  # noqa: BLE001 — record and continue
                print(json.dumps({"draft_layers": draft_layers,
                                  "spec_len": spec_len,
                                  "error": f"{type(e).__name__}: {e}"[:200]}),
                      flush=True)

    ok = [r for r in results if r["measured_rtf"] > base_rtf]
    print(json.dumps({
        "decision": "accept" if ok else "reject-at-random-alpha",
        "baseline_rtf": round(base_rtf, 2),
        "best_measured": max((r["measured_rtf"] for r in results), default=0.0),
        "note": "measured alpha uses random weights (floor); projections "
                "give the trained-weights economics",
    }), flush=True)


if __name__ == "__main__":
    main()
