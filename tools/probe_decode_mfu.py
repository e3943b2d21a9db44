#!/usr/bin/env python3
"""xprof-verified decode MFU (VERDICT r3 stretch #9).

Captures a profiler trace of the B=88 packed-dispatch int8 decode loop
(the bench aggregate configuration) and aggregates hlo_stats: per-op
self time, achieved FLOP rate, and bound-by class.  Turns "fast" into
"provably near-roofline" — the decode step is weight-streaming-bound,
so the meaningful roofline is HBM bytes/step vs ~800 GB/s, with the MXU
rate reported for the matmul share.

Usage:
  python tools/probe_decode_mfu.py          # real TPU, flagship 36L B=88
  python tools/probe_decode_mfu.py --tiny   # CPU smoke (parsing path only)

Prints JSON lines: per-category aggregates, top ops, and the summary.
"""

import argparse
import glob
import json
import os
import re
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def aggregate_hlo_stats(trace_dir):
    """Parse the captured xplane into hlo_stats rows (memory recipe)."""
    from xprof.convert import raw_to_tool_data as rtd

    pbs = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                    recursive=True)
    if not pbs:
        raise FileNotFoundError(f"no xplane.pb under {trace_dir}")
    data, _ = rtd.xspace_to_tool_data(pbs, "hlo_stats",
                                      {"graph_viewer_options": {}})
    if isinstance(data, bytes):
        data = data.decode()
    rows = json.loads(data)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--batch", type=int, default=88)
    ap.add_argument("--frames", type=int, default=100)
    ap.add_argument("--int4", action="store_true",
                    help="measure the headline serving config "
                         "(packed-s4 int4 experts) instead of int8")
    ap.add_argument("--a8", action="store_true",
                    help="int8-MXU expert compute (packed_a8 dispatch on "
                         "prefill+decode — the int4a8 bench default; pair "
                         "with --int4 --batch 128)")
    args = ap.parse_args()

    import jax

    if args.tiny:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import jax.numpy as jnp

    from unimoe_audio_tpu.codec import delay as dl
    from unimoe_audio_tpu.config import (
        TextMoEConfig, UniMoEAudioConfig, tiny_test_config,
    )
    from unimoe_audio_tpu.generate.loop import generate_jit, pad_buffer
    from unimoe_audio_tpu.models.model import init_model_params
    from unimoe_audio_tpu.ops.quant import (
        pad_expert_ffn, quantize_model_params_inplace,
    )

    if args.tiny:
        cfg = tiny_test_config(num_hidden_layers=2)
        B, T_text, frames = 2, 16, 8
        kwargs = {}
    else:
        cfg = UniMoEAudioConfig(text_config=TextMoEConfig(), vision_config=None)
        B, T_text, frames = args.batch, 32, args.frames
        mode = "packed_a8" if args.a8 else "packed"
        # Slot budgets scale from the proven B=88 point (112 / 3328).
        dcap = max(int(round(112 * B / 88 / 8)) * 8, 8)
        pcap = max(int(round(3328 * B / 88 / 128)) * 128, 128)
        kwargs = dict(dispatch_mode=mode, prefill_capacity=pcap,
                      decode_dispatch_mode=mode, decode_capacity=dcap)

    params = jax.jit(lambda k: init_model_params(
        k, cfg, dtype=jnp.float32 if args.tiny else jnp.bfloat16))(
        jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    params = pad_expert_ffn(quantize_model_params_inplace(params))
    if args.int4:
        from unimoe_audio_tpu.ops.quant import requantize_experts_int4_inplace

        params = requantize_experts_int4_inplace(params)

    ids = jnp.asarray(np.random.default_rng(0).integers(
        5, cfg.text_config.vocab_size - 1, size=(2 * B, T_text)))
    attn = jnp.ones((2 * B, T_text), jnp.int32)
    prefill, steps = dl.prepare_audio_prompt(
        [None] * B, num_channels=cfg.codec_channels,
        bos_value=cfg.codec_bos_value, delay_pattern=cfg.codec_delay_pattern)
    buf = pad_buffer(prefill, frames)
    steps = jnp.asarray(steps, jnp.int32)
    kwargs.update(
        max_tokens=frames, min_tokens=jnp.int32(frames), do_sample=True,
        cfg_scale=jnp.float32(10.0), temperature=jnp.float32(1.0),
        top_p=jnp.float32(1.0), cfg_filter_top_k=45,
        eos_prob_mul_factor=jnp.float32(0.6))

    def run(seed):
        r = generate_jit(params, cfg, ids, attn, None, buf, steps,
                         jax.random.PRNGKey(seed), **kwargs)
        jax.block_until_ready(r.codes)
        return int(r.steps)

    run(1)  # compile + warm
    trace_dir = tempfile.mkdtemp(prefix="mfu_trace_")
    t0 = time.time()
    with jax.profiler.trace(trace_dir):
        n_steps = run(2)
    wall = time.time() - t0
    # NOTE: wall/steps includes tunnel latency + host dispatch + trace
    # capture overhead and over-reads the true step time by ~6x over the
    # axon tunnel.  The authoritative ms/step is device_time_us/steps,
    # printed with the summary below once hlo_stats are aggregated.
    print(json.dumps({"traced_wall_s": round(wall, 2),
                      "decode_steps": n_steps,
                      "traced_wall_ms_per_step":
                          round(1e3 * wall / n_steps, 2)}), flush=True)

    raw = aggregate_hlo_stats(trace_dir)
    # Google-Charts DataTable: {"cols": [{"label": ...}], "rows": [{"c":
    # [{"v": ...}, ...]}]}.  Column labels on this xprof: "HLO op
    # category", "Total self time (us)", "Model GFLOP/s",
    # "HBM BW (GiB/s)", "Bound by", "Source Info", ...
    cols = [c["label"] for c in raw["cols"]]
    table = [dict(zip(cols, [(c or {}).get("v") for c in r["c"]]))
             for r in raw.get("rows", [])]

    def num(r, label):
        try:
            return float(str(r.get(label, 0) or 0).replace(",", ""))
        except ValueError:
            return 0.0

    agg = {}
    for r in table:
        cat = str(r.get("HLO op category", "?"))
        t_us = num(r, "Total self time (us)")
        a = agg.setdefault(cat, {"time_us": 0.0, "flop_us": 0.0,
                                 "hbm_us": 0.0, "bound": {}})
        a["time_us"] += t_us
        a["flop_us"] += num(r, "Model GFLOP/s") * t_us
        a["hbm_us"] += num(r, "HBM BW (GiB/s)") * t_us
        b = str(r.get("Bound by", "") or "")
        a["bound"][b] = a["bound"].get(b, 0.0) + t_us
    total_us = sum(a["time_us"] for a in agg.values()) or 1.0
    for cat, a in sorted(agg.items(), key=lambda kv: -kv[1]["time_us"])[:12]:
        print(json.dumps({
            "category": cat,
            "time_pct": round(100 * a["time_us"] / total_us, 1),
            "time_us": round(a["time_us"], 0),
            "avg_gflops": round(a["flop_us"] / a["time_us"], 1)
            if a["time_us"] else 0,
            "avg_hbm_gibs": round(a["hbm_us"] / a["time_us"], 1)
            if a["time_us"] else 0,
            "bound_by": max(a["bound"], key=a["bound"].get)
            if a["bound"] else "",
        }), flush=True)

    for r in sorted(table, key=lambda r: num(r, "Total self time (us)"),
                    reverse=True)[:10]:
        print(json.dumps({
            "op": str(r.get("HLO op name", "?"))[:80],
            "category": str(r.get("HLO op category", "?")),
            "time_us": round(num(r, "Total self time (us)"), 0),
            "occurrences": num(r, "#Occurrences"),
            "gflops": num(r, "Model GFLOP/s"),
            "hbm_gibs": num(r, "HBM BW (GiB/s)"),
            "bound_by": str(r.get("Bound by", "") or ""),
            "source": re.sub(r"<[^>]*>", "",
                             str(r.get("Source Info", "") or ""))[:120],
        }), flush=True)
    # Whole-step aggregates: achieved FLOP/s and HBM BW over the traced
    # device time (time-weighted means), vs the chip's ~800 GiB/s HBM.
    tot_fl = sum(a["flop_us"] for a in agg.values())
    tot_bw = sum(a["hbm_us"] for a in agg.values())
    print(json.dumps({
        "hlo_stats_rows": len(table),
        "device_time_us": round(total_us, 0),
        "device_ms_per_step": round(total_us / 1e3 / n_steps, 2),
        "achieved_tflops_mean": round(tot_fl / total_us / 1e3, 2),
        "achieved_hbm_gibs_mean": round(tot_bw / total_us, 1),
        "hbm_roofline_frac": round(tot_bw / total_us / 800.0, 3),
        "trace_dir": trace_dir,
    }), flush=True)


if __name__ == "__main__":
    main()
