#!/usr/bin/env python3
"""Model-level int8/int4 numerics table (docs/STATUS.md), reproducibly.

Measures codec-logit deltas of the quantized serving configurations
against the bf16 reference on the 12-layer flagship-width model (random
init — the trained checkpoint is unavailable in this environment; see
BASELINE.md).  Round-3 numbers (per-channel amax/7 RTN int4): top-1
agreement 74.7%, mean KL 0.0172.  This probe re-measures with the
group-wise [-8,7] clip-searched quantizer at a G grid.

Usage:
  python tools/probe_int4_numerics.py            # real TPU, 12L flagship width
  python tools/probe_int4_numerics.py --tiny     # CPU smoke (tiny config)

Prints one JSON line per configuration.
"""

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true", help="CPU smoke mode")
    ap.add_argument("--layers", type=int, default=12)
    ap.add_argument("--groups", type=int, nargs="*", default=[128, 64, 32])
    ap.add_argument("--gptq", type=int, nargs="*", default=[64],
                    help="GPTQ group sizes to measure (calibrated on the "
                         "same prompt distribution)")
    ap.add_argument("--a8", action="store_true",
                    help="also measure each config with int8-MXU expert "
                         "compute (the *_a8 dispatch modes): adds per-row "
                         "activation quant error on top of weight quant")
    args = ap.parse_args()

    import jax

    if args.tiny:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import jax.numpy as jnp

    from unimoe_audio_tpu.config import TextMoEConfig, UniMoEAudioConfig, tiny_test_config
    from unimoe_audio_tpu.models.model import init_model_params, model_forward
    from unimoe_audio_tpu.ops import quant as Q

    if args.tiny:
        cfg = tiny_test_config(num_hidden_layers=2)
        B, T = 2, 16
    else:
        cfg = UniMoEAudioConfig(
            text_config=dataclasses.replace(
                TextMoEConfig(), num_hidden_layers=args.layers))
        B, T = 2, 64
    dtype = jnp.float32 if args.tiny else jnp.bfloat16

    rng = np.random.default_rng(0)
    ids = rng.integers(5, 1000, (B, T)).astype(np.int32)
    codes = rng.integers(0, cfg.codec_eos_value,
                         (B, T, cfg.codec_channels)).astype(np.int32)
    ids_j = jnp.asarray(np.where(np.arange(T)[None, :] < 8, ids,
                                 cfg.codec_placeholder_value))
    batch = dict(codec_input_ids=jnp.asarray(codes),
                 attention_mask=jnp.ones((B, T), jnp.int32))

    fwd = jax.jit(lambda p, dm: model_forward(
        p, cfg, ids_j, dispatch_mode=dm,
        **batch).codec_logits.astype(jnp.float32),
        static_argnames=("dm",))

    def logits_for(make_params, dm="dense"):
        p = make_params()
        out = np.asarray(jax.device_get(fwd(p, dm)))
        del p
        return out

    def fresh():
        return init_model_params(jax.random.PRNGKey(0), cfg, dtype=dtype)

    ref = logits_for(fresh)

    def metrics(x):
        d = x - ref
        # softmax KL over the codec vocab, mean over (B, T, C)
        def sm(v):
            v = v - v.max(-1, keepdims=True)
            e = np.exp(v)
            return e / e.sum(-1, keepdims=True)
        pr, px = sm(ref), sm(x)
        kl = float(np.mean(np.sum(pr * (np.log(pr + 1e-20)
                                        - np.log(px + 1e-20)), -1)))
        return {
            "mean_abs_delta": round(float(np.mean(np.abs(d))), 4),
            "max_abs_delta": round(float(np.max(np.abs(d))), 3),
            "top1_agree_pct": round(100 * float(np.mean(
                ref.argmax(-1) == x.argmax(-1))), 1),
            "mean_kl": round(kl, 5),
        }

    def int8_params():
        p = fresh()
        p = Q.quantize_model_params_inplace(p)
        return Q.pad_expert_ffn(p)

    print(json.dumps({"config": "int8", **metrics(logits_for(int8_params))}),
          flush=True)
    if args.a8:
        print(json.dumps({"config": "int8_a8", **metrics(
            logits_for(int8_params, dm="dense_a8"))}), flush=True)

    for G in args.groups:
        def int4_params(G=G):
            p = int8_params()
            return Q.requantize_experts_int4_inplace(p, group_size=G)
        print(json.dumps({"config": f"int4_experts_G{G}",
                          **metrics(logits_for(int4_params))}), flush=True)
        if args.a8 and G == 0:
            print(json.dumps({"config": "int4_a8", **metrics(
                logits_for(int4_params, dm="dense_a8"))}), flush=True)

    # GPTQ (error-compensated) expert int4, calibrated on the SAME prompt
    # distribution the deltas are measured on (the favorable case — real
    # deployments calibrate on held-out prompts); non-expert weights int8.
    from unimoe_audio_tpu.ops.gptq import quantize_experts_int4_gptq

    for G in args.gptq:
        def gptq_params(G=G):
            p = fresh()
            p = quantize_experts_int4_gptq(
                p, cfg, ids_j, codec_input_ids=batch["codec_input_ids"],
                attention_mask=batch["attention_mask"], group_size=G)
            p = Q.quantize_model_params_inplace(p)  # skips QTensor experts
            return Q.pad_expert_ffn(p)
        print(json.dumps({"config": f"int4_gptq_G{G}",
                          **metrics(logits_for(gptq_params))}), flush=True)
        if args.a8:
            print(json.dumps({"config": f"int4_gptq_G{G}_a8", **metrics(
                logits_for(gptq_params, dm="dense_a8"))}), flush=True)


if __name__ == "__main__":
    main()
