"""Probe: aggregate decode RTF with int8-MXU expert compute (w4a8).

docs/ROOFLINE.md: the B=88 int4 decode step is expert-COMPUTE-bound —
the FFN fusions run at 83-97% of the bf16 MXU peak and are 64% of device
time.  tools/probe_w8a8_matmul.py measured the s8xs8->s32 FFN 2.6x
faster than the convert-fused bf16 FFN at the decode expert shape
(0.064 vs 0.165 ms), because v5e-class MXUs rate int8 at 2x bf16.

This probe measures what that buys END-TO-END (the only number CLAUDE.md
trusts over the tunnel): the bench headline config (int4 packed-s4
experts, B=88, 150 frames) with decode and/or prefill dispatch flipped
to 'packed_a8', then a batch sweep on the winner under the per-stream
>=1.1x guarantee, plus B=1 rows for the single-stream story.

Usage: python tools/probe_a8_agg.py [--tiny] [--skip-sweep] [--skip-b1]
Prints one JSON line per point; ends with a summary line.
"""
import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

TINY = "--tiny" in sys.argv
if TINY:
    jax.config.update("jax_platforms", "cpu")

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
T_text = 32
max_tokens = 150

if TINY:
    from unimoe_audio_tpu.config import tiny_test_config
    cfg = tiny_test_config(num_hidden_layers=2)
    max_tokens, T_text = 10, 4
else:
    cfg = UniMoEAudioConfig(text_config=TextMoEConfig(), vision_config=None)

t0 = time.time()
params = jax.jit(lambda k: init_model_params(k, cfg, dtype=jnp.bfloat16))(
    jax.random.PRNGKey(0))
jax.block_until_ready(params)
params = quantize_model_params_inplace(params)
params = pad_expert_ffn(params)
params = requantize_experts_int4_inplace(params)
print(f"init+quant(int4) {time.time()-t0:.0f}s", flush=True)


def inputs(B):
    ids = jnp.asarray(np.random.default_rng(0).integers(
        0, cfg.text_config.vocab_size - 1, size=(2 * B, T_text)))
    attn = jnp.ones((2 * B, T_text), dtype=jnp.int32)
    prefill, steps = dl.prepare_audio_prompt(
        [None] * B, num_channels=cfg.codec_channels,
        bos_value=cfg.codec_bos_value, delay_pattern=cfg.codec_delay_pattern)
    return ids, attn, pad_buffer(prefill, max_tokens), \
        jnp.asarray(steps, jnp.int32)


def measure(tag, B, prefill_mode="packed", decode_mode="packed"):
    """One point: compile + 3 timed generates; returns (rtf, step_s)."""
    dcap = max(int(round(112 * B / 88 / 8)) * 8, 8)
    pcap = max(int(round(3328 * B / 88 / 128)) * 128, 128)
    kwargs = dict(
        max_tokens=max_tokens, min_tokens=jnp.int32(max_tokens),
        do_sample=True, dispatch_mode=prefill_mode, prefill_capacity=pcap,
        decode_dispatch_mode=decode_mode, decode_capacity=dcap,
        cfg_scale=jnp.float32(10.0), temperature=jnp.float32(1.0),
        top_p=jnp.float32(1.0), cfg_filter_top_k=45,
        eos_prob_mul_factor=jnp.float32(0.6),
    )
    ids, attn, buf, steps = inputs(B)
    try:
        r = generate_jit(params, cfg, ids, attn, None, buf, steps,
                         jax.random.PRNGKey(1), **kwargs)
        jax.block_until_ready(r.codes)
        best = 1e9
        for i in range(3):
            t0 = time.time()
            r = generate_jit(params, cfg, ids, attn, None, buf, steps,
                             jax.random.PRNGKey(2 + i), **kwargs)
            jax.block_until_ready(r.codes)
            best = min(best, (time.time() - t0) / int(r.steps))
    except Exception as e:  # noqa: BLE001 — OOM at large B is expected
        print(json.dumps({"config": tag, "B": B,
                          "error": f"{type(e).__name__}: {e}"[:300]}),
              flush=True)
        return None
    rtf = B / best / FRAME_RATE
    print(json.dumps({
        "config": tag, "B": B,
        "agg_rtf": round(rtf, 2),
        "step_ms": round(best * 1e3, 2),
        "per_stream_rtf": round(1.0 / best / FRAME_RATE, 3),
    }), flush=True)
    return rtf, best


results = {}
B0 = 2 if TINY else 88

if "--bs" in sys.argv:
    # Sweep-only mode: measure int4+a8all at the given batch sizes and
    # exit (extends the default sweep without re-measuring the matrix).
    i = sys.argv.index("--bs")
    for B in [int(v) for v in sys.argv[i + 1:] if v.isdigit()]:
        r = measure("int4+a8all", B, prefill_mode="packed_a8",
                    decode_mode="packed_a8")
        if r:
            results[f"int4+a8all@B{B}"] = r
    if results:
        best = max(results, key=lambda k: results[k][0])
        print(json.dumps({"best_config": best,
                          "best_agg_rtf": round(results[best][0], 2)}),
              flush=True)
    sys.exit(0)

r = measure("int4", B0)
if r:
    results["int4"] = r
r = measure("int4+a8dec", B0, decode_mode="packed_a8")
if r:
    results["int4+a8dec"] = r
r = measure("int4+a8all", B0, prefill_mode="packed_a8",
            decode_mode="packed_a8")
if r:
    results["int4+a8all"] = r

if results.get("int4") and results.get("int4+a8all"):
    print(json.dumps({"a8_vs_base": round(
        results["int4+a8all"][0] / results["int4"][0], 3)}), flush=True)

# --- batch sweep on the best a8 config under per-stream >= 1.1x --------
if not TINY and "--skip-sweep" not in sys.argv:
    a8_tags = [t for t in results if "a8" in t]
    if a8_tags:
        best_tag = max(a8_tags, key=lambda t: results[t][0])
        pm = "packed_a8" if best_tag.endswith("a8all") else "packed"
        for B in (96, 104, 112, 128):
            r = measure(best_tag, B, prefill_mode=pm,
                        decode_mode="packed_a8")
            if r is None:
                break
            results[f"{best_tag}@B{B}"] = r
            if 1.0 / (r[1] * FRAME_RATE) < 1.1:
                print(json.dumps({"B_sweep_stop": B,
                                  "reason": "per_stream_rtf < 1.1"}),
                      flush=True)
                break

# --- single-stream (B=1) rows ------------------------------------------
if not TINY and "--skip-b1" not in sys.argv:
    for tag, dm in (("int4@B1", "packed"), ("int4+a8dec@B1", "packed_a8")):
        r = measure(tag, 1, decode_mode=dm)
        if r:
            results[tag] = r

if results:
    best = max(results, key=lambda k: results[k][0])
    print(json.dumps({"best_config": best,
                      "best_agg_rtf": round(results[best][0], 2)}),
          flush=True)
