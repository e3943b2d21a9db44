#!/usr/bin/env python3
"""Focused latency probe: TTFA p50 + single-stream decode RTF (int8, int4).

A fallback for when bench.py's full run (deep-train + stream-train
subprocesses + aggregate headline) exceeds a battery timeout: this
measures ONLY the latency-facing numbers, mirroring bench.py's TTFA and
single-stream sections (same shapes, same kwargs), in ~5 minutes.

Usage: python tools/probe_latency.py [--tiny]
Prints one JSON line.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TINY = "--tiny" in sys.argv

import jax  # noqa: E402

if TINY:
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from unimoe_audio_tpu.config import (  # noqa: E402
    TextMoEConfig, UniMoEAudioConfig, tiny_test_config,
)
from unimoe_audio_tpu.codec import delay as dl  # noqa: E402
from unimoe_audio_tpu.generate.loop import generate_jit, pad_buffer  # noqa: E402
from unimoe_audio_tpu.models.model import init_model_params  # noqa: E402
from unimoe_audio_tpu.ops.quant import (  # noqa: E402
    pad_expert_ffn, quantize_model_params_inplace,
    requantize_experts_int4_inplace,
)

FRAME_RATE = 50.0
T_TEXT = 32


def main():
    if TINY:
        cfg = tiny_test_config(num_hidden_layers=2)
    else:
        cfg = UniMoEAudioConfig(text_config=TextMoEConfig(), vision_config=None)

    params = jax.jit(lambda k: init_model_params(k, cfg, dtype=jnp.bfloat16))(
        jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    params = quantize_model_params_inplace(params)
    params = pad_expert_ffn(params)

    def inputs(mt):
        ids = jnp.asarray(np.random.default_rng(0).integers(
            0, cfg.text_config.vocab_size - 1, size=(2, T_TEXT)))
        attn = jnp.ones((2, T_TEXT), dtype=jnp.int32)
        prefill, steps = dl.prepare_audio_prompt(
            [None], num_channels=cfg.codec_channels,
            bos_value=cfg.codec_bos_value,
            delay_pattern=cfg.codec_delay_pattern,
        )
        return ids, attn, pad_buffer(prefill, mt), jnp.asarray(steps, jnp.int32)

    common = dict(cfg_scale=jnp.float32(10.0), temperature=jnp.float32(1.0),
                  top_p=jnp.float32(1.0), cfg_filter_top_k=45,
                  eos_prob_mul_factor=jnp.float32(0.6))
    out = {}

    # TTFA p50: prefill + first decode step (bench.py's definition).
    ids, attn, buf, steps = inputs(24)
    kw = dict(max_tokens=24, min_tokens=jnp.int32(24), do_sample=True, **common)
    stop = jnp.int32(int(steps[0]))
    r = generate_jit(params, cfg, ids, attn, None, buf, steps,
                     jax.random.PRNGKey(0), stop_at=stop, **kw)
    jax.block_until_ready(r.codes)
    lat = []
    for i in range(5):
        t0 = time.time()
        r = generate_jit(params, cfg, ids, attn, None, buf, steps,
                         jax.random.PRNGKey(1 + i), stop_at=stop, **kw)
        jax.block_until_ready(r.codes)
        lat.append(time.time() - t0)
    lat.sort()
    out["ttfa_p50_ms"] = round(lat[len(lat) // 2] * 1e3, 1)

    # Single-stream greedy decode RTF, int8 then int4 experts.
    n = 100 if not TINY else 12
    kw_ss = dict(max_tokens=n, min_tokens=jnp.int32(n), do_sample=False,
                 **common)
    ids, attn, buf, steps = inputs(n)

    def measure(p):
        r = generate_jit(p, cfg, ids, attn, None, buf, steps,
                         jax.random.PRNGKey(0), **kw_ss)
        jax.block_until_ready(r.codes)
        best = 1e9
        for _ in range(2):
            t0 = time.time()
            r = generate_jit(p, cfg, ids, attn, None, buf, steps,
                             jax.random.PRNGKey(1), **kw_ss)
            jax.block_until_ready(r.codes)
            best = min(best, (time.time() - t0) / int(r.steps))
        return round(1.0 / best / FRAME_RATE, 2), round(best * 1e3, 2)

    out["single_stream_rtf_int8"], out["step_ms_int8"] = measure(params)

    params4 = requantize_experts_int4_inplace({
        **params, "layers": {**params["layers"],
                             "moe": {k: (dict(v) if isinstance(v, dict) else v)
                                     for k, v in params["layers"]["moe"].items()}}
    })
    out["single_stream_rtf_int4"], out["step_ms_int4"] = measure(params4)
    out["single_stream_rtf"] = out["single_stream_rtf_int4"]
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
