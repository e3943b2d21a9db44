#!/usr/bin/env python3
"""The "full flagship trains on one chip" ARTIFACT run (VERDICT r3 #4).

Trains the FULL 36-layer flagship (layer-streamed params + host-resident
int8 Adam moments, train/stream.py) for ≥50 APPLIED steps with gradient
accumulation, on a small fixed batch set the model can memorize — the
loss curve must actually go down, making the capability an artifact
instead of a code comment.  Writes one metrics.jsonl row per applied
step and a final summary JSON line to stdout.

Reference capability anchor: ZeRO-2 offload_param + offload_optimizer
(/root/reference/UniMoEV2-Preview/deepspeed_zero2.conf:23-37).

Usage:
  python tools/run_stream_train_artifact.py [--steps 60] [--t 512]
      [--out tools/battery_logs/stream_train_metrics.jsonl] [--tiny]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=60, help="applied steps")
    ap.add_argument("--gas", type=int, default=2)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--t", type=int, default=512)
    ap.add_argument("--moment_dtype", default="int8")
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--out", default="tools/battery_logs/stream_train_metrics.jsonl")
    ap.add_argument("--tiny", action="store_true", help="CPU smoke (tiny cfg)")
    args = ap.parse_args()

    import jax

    if args.tiny:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import jax.numpy as jnp

    from unimoe_audio_tpu.config import (
        TextMoEConfig, UniMoEAudioConfig, tiny_test_config,
    )
    from unimoe_audio_tpu.train.stream import StreamTrainer

    if args.tiny:
        cfg = tiny_test_config(num_hidden_layers=2)
        args.batch, args.t, args.steps = 2, 32, 6
    else:
        cfg = UniMoEAudioConfig(text_config=TextMoEConfig(), vision_config=None)
    B, T, C = args.batch, args.t, cfg.codec_channels

    tr = StreamTrainer(cfg, rng=jax.random.PRNGKey(0), learning_rate=args.lr,
                       grad_clip=1.0, moment_dtype=args.moment_dtype)
    if hasattr(tr, "outer_opt") and hasattr(tr.outer_opt, "precompile"):
        tr.outer_opt.precompile(tr.outer_state.params)

    # A fixed, memorizable micro-batch pool: the same 4·gas batches cycle,
    # so a real optimizer drives the loss well below its initial value.
    def mk_batch(seed):
        codec = np.random.default_rng(seed).integers(
            0, cfg.codec_eos_value, size=(B, T, C)).astype(np.int32)
        return {
            "input_ids": jnp.full((B, T), cfg.codec_placeholder_value, jnp.int32),
            "codec_input_ids": jnp.asarray(codec),
            "attention_mask": jnp.ones((B, T), jnp.int32),
            "codec_labels": jnp.asarray(codec),
        }

    pool = [mk_batch(i) for i in range(4 * args.gas)]

    def sync():
        jax.block_until_ready(jax.tree.leaves(tr.layers_host[-1])[0])
        jax.block_until_ready(jax.tree.leaves(tr.outer_state.params)[0])

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    losses, times = [], []
    with open(args.out, "w") as f:
        for i in range(args.steps):
            micros = [pool[(i * args.gas + j) % len(pool)]
                      for j in range(args.gas)]
            t0 = time.time()
            m = tr.train_step(micros if args.gas > 1 else micros[0],
                              jax.random.PRNGKey(100 + i))
            sync()
            dt = time.time() - t0
            loss = float(m["loss"])
            losses.append(loss)
            times.append(dt)
            row = {"step": i + 1, "loss": round(loss, 4),
                   "skipped": float(m["skipped"]), "step_s": round(dt, 2),
                   "tokens_per_sec": round(args.gas * B * T / dt, 0)}
            f.write(json.dumps(row) + "\n")
            f.flush()
            print(json.dumps(row), file=sys.stderr, flush=True)

    k = max(3, len(losses) // 5)
    first, last = float(np.mean(losses[:k])), float(np.mean(losses[-k:]))
    steady = sorted(times[2:])[: max(1, (len(times) - 2) // 2)]
    print(json.dumps({
        "stream_train_artifact": True,
        "layers": cfg.text_config.num_hidden_layers,
        "applied_steps": args.steps,
        "gas": args.gas, "batch": B, "seq_len": T,
        "moment_dtype": args.moment_dtype,
        "loss_first_mean": round(first, 4),
        "loss_last_mean": round(last, 4),
        "loss_decreased": bool(last < first),
        "steady_tokens_per_sec": round(
            args.gas * B * T / float(np.mean(steady)), 0),
        "metrics_jsonl": args.out,
    }), flush=True)


if __name__ == "__main__":
    main()
