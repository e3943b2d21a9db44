#!/usr/bin/env python3
"""Probe: int8 KV cache vs bf16 at long-generation cache lengths.

Decode attends over the whole static KV buffer every step, so the
per-step cost at a given cache_len is independent of how much is
actually filled — measuring a short run at a 20 s-equivalent buffer
(cache_len ≈ 1184 = 32 text + 1000 frames + slack) prices the END of a
long generation, where the bf16 KV stream (~36L × 2KV × 128Dh × 1184pos
× 176rows × 2B ≈ 3.9 GB/step at B=88) rivals the int8 weight stream.

Prints one JSON line per (config, cache_len): step ms + aggregate RTF.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from unimoe_audio_tpu.codec import delay as dl
from unimoe_audio_tpu.config import TextMoEConfig, UniMoEAudioConfig
from unimoe_audio_tpu.generate.loop import generate_jit, pad_buffer
from unimoe_audio_tpu.models.model import init_model_params
from unimoe_audio_tpu.ops.quant import (
    pad_expert_ffn, quantize_model_params_inplace,
)

FRAME_RATE = 50.0
B = 88
T_TEXT = 32
STEPS = 40  # enough decode steps to time; buffer length sets the cost

cfg = UniMoEAudioConfig(text_config=TextMoEConfig(), vision_config=None)
t0 = time.time()
params = jax.jit(lambda k: init_model_params(k, cfg, dtype=jnp.bfloat16))(
    jax.random.PRNGKey(0))
jax.block_until_ready(params)
params = pad_expert_ffn(quantize_model_params_inplace(params))
print(f"init+quant {time.time()-t0:.0f}s", flush=True)

ids = jnp.asarray(np.random.default_rng(0).integers(
    5, cfg.text_config.vocab_size - 1, size=(2 * B, T_TEXT)))
attn = jnp.ones((2 * B, T_TEXT), jnp.int32)
prefill, steps = dl.prepare_audio_prompt(
    [None] * B, num_channels=cfg.codec_channels,
    bos_value=cfg.codec_bos_value, delay_pattern=cfg.codec_delay_pattern)
buf = pad_buffer(prefill, STEPS)
steps = jnp.asarray(steps, jnp.int32)

base_kw = dict(
    max_tokens=STEPS, min_tokens=jnp.int32(STEPS), do_sample=True,
    dispatch_mode="packed", prefill_capacity=3328,
    decode_dispatch_mode="packed", decode_capacity=112,
    cfg_scale=jnp.float32(10.0), temperature=jnp.float32(1.0),
    top_p=jnp.float32(1.0), cfg_filter_top_k=45,
    eos_prob_mul_factor=jnp.float32(0.6),
)


def measure(kv_dtype, cache_len):
    kw = dict(base_kw, cache_len=cache_len)
    if kv_dtype:
        kw["kv_dtype"] = kv_dtype

    def run(seed):
        r = generate_jit(params, cfg, ids, attn, None, buf, steps,
                         jax.random.PRNGKey(seed), **kw)
        jax.block_until_ready(r.codes)
        return int(r.steps)

    n = run(1)  # compile + warm
    best = 1e9
    for i in range(3):
        t0 = time.time()
        n = run(2 + i)
        best = min(best, (time.time() - t0) / n)
    tag = kv_dtype or "bf16"
    print(json.dumps({
        "config": f"kv_{tag}", "cache_len": cache_len,
        "step_ms": round(best * 1e3, 2),
        "agg_rtf": round(B / best / FRAME_RATE, 1),
    }), flush=True)
    return best


results = {}
for cache_len in (192, 640, 1184):   # ≈ bench (150f), 10 s, 20 s horizons
    t_bf = measure(None, cache_len)
    t_i8 = measure("int8", cache_len)
    results[cache_len] = round(t_bf / t_i8, 3)
print(json.dumps({"int8_kv_speedup_by_cache_len": results}), flush=True)
