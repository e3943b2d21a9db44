"""Probe: aggregate decode RTF at B=88 with int4 (packed s4) expert FFNs.

int8 baseline reads ~6.6 GB weights/step (~8 ms of the ~17.8 ms step);
int4 halves the expert stream. Measures both configs in one process.
"""
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from unimoe_audio_tpu.config import TextMoEConfig, UniMoEAudioConfig
from unimoe_audio_tpu.codec import delay as dl
from unimoe_audio_tpu.generate.loop import generate_jit, pad_buffer
from unimoe_audio_tpu.models.model import init_model_params
from unimoe_audio_tpu.ops.quant import (
    pad_expert_ffn, quantize_model_params_inplace,
    requantize_experts_int4_inplace,
)

FRAME_RATE = 50.0
B = 88
T_text = 32
max_tokens = 150
DCAP = 112
PCAP = 3328

cfg = UniMoEAudioConfig(text_config=TextMoEConfig(), vision_config=None)
t0 = time.time()
params = jax.jit(lambda k: init_model_params(k, cfg, dtype=jnp.bfloat16))(
    jax.random.PRNGKey(0))
jax.block_until_ready(params)
params = quantize_model_params_inplace(params)
params = pad_expert_ffn(params)
print(f"init+quant {time.time()-t0:.0f}s", flush=True)

ids = jnp.asarray(np.random.default_rng(0).integers(
    0, cfg.text_config.vocab_size - 1, size=(2 * B, T_text)))
attn = jnp.ones((2 * B, T_text), dtype=jnp.int32)
prefill, steps = dl.prepare_audio_prompt(
    [None] * B, num_channels=cfg.codec_channels,
    bos_value=cfg.codec_bos_value, delay_pattern=cfg.codec_delay_pattern)
buf = pad_buffer(prefill, max_tokens)
steps = jnp.asarray(steps, jnp.int32)

kwargs = dict(
    max_tokens=max_tokens, min_tokens=jnp.int32(max_tokens), do_sample=True,
    dispatch_mode="packed", prefill_capacity=PCAP,
    decode_dispatch_mode="packed", decode_capacity=DCAP,
    cfg_scale=jnp.float32(10.0), temperature=jnp.float32(1.0),
    top_p=jnp.float32(1.0), cfg_filter_top_k=45,
    eos_prob_mul_factor=jnp.float32(0.6),
)


def measure(p, tag):
    r = generate_jit(p, cfg, ids, attn, None, buf, steps,
                     jax.random.PRNGKey(1), **kwargs)
    jax.block_until_ready(r.codes)
    best = 1e9
    for i in range(3):
        t0 = time.time()
        r = generate_jit(p, cfg, ids, attn, None, buf, steps,
                         jax.random.PRNGKey(2 + i), **kwargs)
        jax.block_until_ready(r.codes)
        best = min(best, (time.time() - t0) / int(r.steps))
    rtf = B / best / FRAME_RATE
    print(json.dumps({f"agg_rtf_{tag}": round(rtf, 2),
                      f"step_ms_{tag}": round(best * 1e3, 2)}), flush=True)
    return rtf


rtf8 = measure(params, "int8")
t0 = time.time()
params4 = requantize_experts_int4_inplace(params)
del params
print(f"int4 requant {time.time()-t0:.0f}s", flush=True)
rtf4 = measure(params4, "int4")
print(json.dumps({"int4_vs_int8": round(rtf4 / rtf8, 3)}), flush=True)
