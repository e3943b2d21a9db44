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
                 allow_random: bool = False, quantize=False,
                 tokenizer=None, config=None, max_tokens: int = 1000,
                 min_tokens: int = 100, kv_cache: str = None):
    """Load + shard a model for serving; returns the UniMoEAudio instance."""
    import jax

    from unimoe_audio_tpu.api import UniMoEAudio
    from unimoe_audio_tpu.parallel.mesh import default_mesh_shape, make_mesh, shard_params

    model = UniMoEAudio(
        model_path, allow_random=allow_random, config=config, tokenizer=tokenizer,
        max_tokens=max_tokens, min_tokens=min_tokens,
        # serving_mode = quantized + lane-padded expert FFNs +
        # capacity-packed dispatch (the bench configuration); "int4" packs
        # the expert FFNs as s4 for the low-batch latency operating point.
        serving_mode=quantize,
        # kv_cache="int8" stores the decode KV cache int8 with
        # per-position scales — halves the per-step KV stream, which at
        # long generations rivals the int8 weight stream.
        kv_cache_dtype=kv_cache,
    )

    n_dev = len(jax.devices())
    if ep_size * tp_size > 1 or n_dev > 1:
        shape = default_mesh_shape(n_dev, ep_size, tp_size)
        mesh = make_mesh(*shape)
        # shard_params handles quantized QTensor leaves (scale specs
        # derived from the weight specs; s4 leaves re-emit packed+sharded
        # through jit — a direct relayout would hit the s4 device_put bug).
        model.params = shard_params(model.params, mesh, model.config)
        print(f"serving on mesh (data, expert, model) = {shape}"
              + (f" [{'int8' if quantize is True else quantize}]"
                 if quantize else ""))
    return model


def measure_ttfa(model, *, n_trials: int = 5, text: str = "A peaceful piano melody"):
    """p50/p90 time-to-first-audio: prefill + decode halted at the first
    emitted frame (generate_jit stop_at), matching bench.py's method —
    BASELINE.json's second headline metric.  No model state is mutated and
    nothing is written to disk."""
    import jax
    import jax.numpy as jnp

    from unimoe_audio_tpu.api import T2M_NEGATIVE_CAPTION, t2m_prompt
    from unimoe_audio_tpu.codec import delay as dl
    from unimoe_audio_tpu.generate.loop import generate_jit, pad_buffer

    cfg = model.config
    neg = t2m_prompt(T2M_NEGATIVE_CAPTION)
    pos = t2m_prompt(text)
    ids, mask = model._tokenize([neg, pos])
    prefill, steps = dl.prepare_audio_prompt(
        [None], num_channels=cfg.codec_channels,
        bos_value=cfg.codec_bos_value, delay_pattern=cfg.codec_delay_pattern,
    )
    mt = max(cfg.max_delay + 2, 24)
    buf = pad_buffer(prefill, mt)
    steps = jnp.asarray(steps, jnp.int32)
    stop = jnp.int32(int(steps[0]))  # halt right after the first frame
    kw = dict(
        max_tokens=mt, min_tokens=jnp.int32(mt),
        cfg_scale=jnp.float32(10.0), temperature=jnp.float32(1.0),
        top_p=jnp.float32(1.0), cfg_filter_top_k=45,
        eos_prob_mul_factor=jnp.float32(0.6), do_sample=True,
    )
    ids, mask = jnp.asarray(ids), jnp.asarray(mask)
    # First call compiles; excluded from stats.
    lat: List[float] = []
    for i in range(n_trials + 1):
        t0 = time.time()
        r = generate_jit(model.params, cfg, ids, mask, None, buf, steps,
                         jax.random.PRNGKey(i), stop_at=stop, **kw)
        jax.block_until_ready(r.codes)
        if i > 0:
            lat.append(time.time() - t0)
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
    parser.add_argument("--quantize", nargs="?", const="int8", default=False,
                        choices=["int8", "int4", "int4-gptq"],
                        help="quantized serving path (bare flag = int8; "
                             "int4 packs expert FFNs as s4 for low-batch; "
                             "int4-gptq self-calibrates the s4 experts "
                             "(ops/gptq.py) for tighter numerics)")
    parser.add_argument("--kv-cache", default=None, choices=["int8"],
                        help="int8 KV cache with per-position scales "
                             "(halves the decode KV stream; largest win "
                             "on long generations and --continuous)")
    parser.add_argument("--allow-random", action="store_true")
    parser.add_argument("--task", default="text_to_music",
                        choices=["text_to_music", "text_to_speech",
                                 "video_text_to_music"])
    parser.add_argument("--input", default="A peaceful piano melody",
                        help="caption (T2M/VT2M) or target text (TTS)")
    parser.add_argument("--prompt-text", default=None,
                        help="TTS: transcription of the voice prompt")
    parser.add_argument("--prompt-wav", default=None,
                        help="TTS: voice prompt wav path")
    parser.add_argument("--video", default=None, help="VT2M: video path")
    parser.add_argument("--requests", default=None,
                        help="JSON file with a list of {task, ...} request "
                             "dicts served concurrently through the "
                             "request batcher (heterogeneous batching)")
    parser.add_argument("--continuous", action="store_true",
                        help="serve --requests through the rolling slot "
                             "server (apps/continuous.py): requests admit "
                             "into a live decode batch as slots free up "
                             "instead of window-batching")
    parser.add_argument("--slots", type=int, default=4,
                        help="(--continuous) concurrent request slots")
    parser.add_argument("--chunk-frames", type=int, default=64,
                        help="(--continuous) decode frames between "
                             "admission/retirement boundaries")
    parser.add_argument("--deterministic", action="store_true",
                        help="(--continuous) dropless dense dispatch: a "
                             "request's output never depends on co-resident "
                             "load (disables the packed-dispatch aggregate "
                             "throughput config on wide servers)")
    parser.add_argument("--save-snapshot", default=None, metavar="DIR",
                        help="after quantization, persist the serving "
                             "params (core/export.save_serving_snapshot); "
                             "pointing --model at DIR later skips the "
                             "quantize/calibrate pass at startup")
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
        kv_cache=args.kv_cache,
    )
    if args.save_snapshot:
        print(f"serving snapshot: "
              f"{model.save_serving_snapshot(args.save_snapshot)}")
    if args.measure_latency:
        print(json.dumps(measure_ttfa(model)))
        return 0
    if args.requests and args.continuous:
        # Rolling admission: requests enter the live decode batch as slots
        # free up (beyond-reference serving; the batcher below decodes each
        # window to completion instead).
        with open(args.requests) as f:
            reqs = json.load(f)
        srv = model.continuous_server(
            slots=args.slots, chunk_frames=args.chunk_frames,
            deterministic=args.deterministic)
        outs, errs = [None] * len(reqs), []
        for i, r in enumerate(reqs):
            task = r.pop("task", "text_to_music")
            try:
                kw = dict(caption=r.get("caption") or r.get("text")
                          or r.get("input_text"), seed=int(r.get("seed", i)),
                          rid=i)
                for k in ("prompt_text", "prompt_wav", "video",
                          "max_audio_seconds", "min_audio_seconds",
                          "cfg_scale", "temperature", "top_p"):
                    if r.get(k) is not None:
                        kw[k] = r[k]
                srv.submit(model.make_slot_request(task, **kw))
            except Exception as e:  # noqa: BLE001 — bad request fails alone
                errs.append({"index": i, "error": str(e)})
        for res in srv.run_until_drained():
            outs[res.rid] = model.decode_slot_results(
                [res], output_dir=args.output)[0]
        print(json.dumps({"outputs": outs, "errors": errs}))
        return 1 if errs and not any(outs) else 0
    if args.requests:
        # Heterogeneous serving through the request batcher: every task
        # type coalesces into one generation batch on the mesh (the
        # reference EP inference scripts are task-agnostic,
        # multi_gpu_with_ep.py:21-34).
        from unimoe_audio_tpu.apps.batcher import RequestBatcher

        with open(args.requests) as f:
            reqs = json.load(f)
        batcher = RequestBatcher(model, output_dir=args.output)
        futs = [batcher.submit(r.pop("task"), r) for r in reqs]
        outs, errs = [], []
        for i, fut in enumerate(futs):
            try:
                outs.append(fut.result(timeout=3600))
            except Exception as e:  # noqa: BLE001
                outs.append(None)
                errs.append({"index": i, "error": str(e)})
        batcher.close()
        print(json.dumps({"outputs": outs, "errors": errs}))
        return 1 if errs and not any(outs) else 0
    if args.task == "text_to_music":
        out = model.text_to_music(args.input, output_dir=args.output)
    elif args.task == "text_to_speech":
        if not args.prompt_text or not args.prompt_wav:
            raise SystemExit("text_to_speech needs --prompt-text and --prompt-wav")
        out = model.text_to_speech(
            args.input, prompt_text=args.prompt_text,
            prompt_wav=args.prompt_wav, output_dir=args.output)
    else:  # video_text_to_music
        if not args.video:
            raise SystemExit("video_text_to_music needs --video")
        out = model.video_text_to_music(
            args.video, args.input, output_dir=args.output)
    print(json.dumps({"outputs": out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
