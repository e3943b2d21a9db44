#!/usr/bin/env python3
"""Multi-chip serving entry.

TPU-native replacement for the reference's EP inference scripts
(reference: UniMoEV2-Preview/inference/single_gpu_without_ep.py and
multi_gpu_with_ep.py:21-34): instead of `deepspeed.init_inference` +
per-rank expert shard loading, ONE process builds a
Mesh('data','expert','model'), places the stacked params by
parallel.mesh.param_specs, and runs the jitted generation loop — GSPMD
inserts the expert/tensor collectives.  Multi-host pods only add
`jax.distributed.initialize()` before mesh construction.

Also the TTFA/latency harness: `--measure-latency` reports p50/p90
time-to-first-audio (prefill + first decode step + first-frame DAC decode).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from typing import List, Optional

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


def build_server(model_path: Optional[str], *, ep_size: int = 1, tp_size: int = 1,
                 allow_random: bool = False, quantize: bool = False,
                 tokenizer=None, config=None, max_tokens: int = 1000,
                 min_tokens: int = 100):
    """Load + shard a model for serving; returns the UniMoEAudio instance."""
    import jax

    from unimoe_audio_tpu.api import UniMoEAudio
    from unimoe_audio_tpu.parallel.mesh import default_mesh_shape, make_mesh, shard_params

    model = UniMoEAudio(
        model_path, allow_random=allow_random, config=config, tokenizer=tokenizer,
        max_tokens=max_tokens, min_tokens=min_tokens,
        # serving_mode = int8 + lane-padded expert FFNs + capacity-packed
        # dispatch (the bench configuration).
        serving_mode=quantize,
    )

    n_dev = len(jax.devices())
    if ep_size * tp_size > 1 or n_dev > 1:
        shape = default_mesh_shape(n_dev, ep_size, tp_size)
        mesh = make_mesh(*shape)
        # shard_params handles int8 QTensor leaves (scale specs derived
        # from the weight specs).
        model.params = shard_params(model.params, mesh, model.config)
        print(f"serving on mesh (data, expert, model) = {shape}"
              + (" [int8]" if quantize else ""))
    return model


def measure_ttfa(model, *, n_trials: int = 5, text: str = "A peaceful piano melody"):
    """p50/p90 time-to-first-audio: prefill + one decode step + codec decode
    of the first emitted frame (BASELINE.json's second headline metric)."""
    import numpy as np

    # First call compiles; excluded from stats.
    lat: List[float] = []
    for i in range(n_trials + 1):
        t0 = time.time()
        saved_max, saved_min = model.MAX_TOKENS, model.MIN_TOKENS
        model.MAX_TOKENS, model.MIN_TOKENS = max(model.config.max_delay + 2, 20), 1
        try:
            paths = model.text_to_music(text, output_dir="/tmp/ttfa", seed=i)
        finally:
            model.MAX_TOKENS, model.MIN_TOKENS = saved_max, saved_min
        dt = time.time() - t0
        if i > 0:
            lat.append(dt)
    lat.sort()
    return {
        "p50_ttfa_s": lat[len(lat) // 2],
        "p90_ttfa_s": lat[min(len(lat) - 1, int(len(lat) * 0.9))],
        "trials": n_trials,
    }


def main():
    parser = argparse.ArgumentParser(description="UniMoE-Audio TPU serving")
    from unimoe_audio_tpu.parallel.multihost import add_multihost_args

    add_multihost_args(parser)
    parser.add_argument("--model", default=None)
    parser.add_argument("--ep-size", type=int, default=1)
    parser.add_argument("--tp-size", type=int, default=1)
    parser.add_argument("--quantize", action="store_true", help="int8 serving path")
    parser.add_argument("--allow-random", action="store_true")
    parser.add_argument("--task", default="text_to_music")
    parser.add_argument("--input", default="A peaceful piano melody")
    parser.add_argument("--output", default="./served")
    parser.add_argument("--measure-latency", action="store_true")
    args = parser.parse_args()

    from unimoe_audio_tpu.parallel.multihost import maybe_initialize_multihost

    # Multi-host pods: the one-line replacement for the deepspeed
    # launcher's master_addr/master_port plumbing (script/training.sh:34-37).
    maybe_initialize_multihost(args)

    model = build_server(
        args.model, ep_size=args.ep_size, tp_size=args.tp_size,
        allow_random=args.allow_random, quantize=args.quantize,
    )
    if args.measure_latency:
        print(json.dumps(measure_ttfa(model)))
        return 0
    if args.task == "text_to_music":
        out = model.text_to_music(args.input, output_dir=args.output)
    else:
        raise SystemExit(f"serve CLI supports text_to_music; got {args.task}")
    print(json.dumps({"outputs": out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
