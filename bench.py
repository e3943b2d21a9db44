"""Benchmark: the full serving/training metric set on the flagship model.

Primary metric (the driver's headline): aggregate decode throughput
(audio-sec/sec/chip) — the full jitted generation loop (packed-dispatch
prefill + AR decode with CFG pairs, KV cache, delay-pattern EOS machine)
on the shipped checkpoint's architecture (36 layers, 2048 hidden,
8+1+2-expert Top-P DCMoE — SURVEY.md §2.6) in the int8 weight-only
serving configuration with lane-padded expert FFNs (ops/quant.py) and
capacity-packed dispatch, B=88 concurrent streams, per-stream ≥1.1×
real time at the codec's 50 frames/s.

Routing note: random-init gates route mean k≈4.1 of 8 dynamic experts —
BELOW the published model's average activation (paper Table II: avg 4.8B
of 7.1B params ⇒ k≈5.2), so the packed-dispatch capacity (112 slots for
176 tokens/expert mean load ≈90) is conservative rather than flattering.

Also emitted in the same JSON line (round-to-round regression tracking):
  per_stream_rtf        — the headline's per-stream guarantee
  ttfa_p50_ms           — prefill + first decode step, single stream
  single_stream_rtf     — greedy 1-stream decode RTF (serving config)
  flash_fwd_bwd_speedup — Pallas flash fwd+bwd vs XLA attention, T=2048
  train_tokens_per_sec  — 4L flagship-width train step, T=2048, remat

Output protocol (the driver parses the LAST valid JSON line): the
aggregate headline line prints FIRST — init → quantize → one compile →
two timed B=88 generations, minutes not tens of minutes — and is then
re-emitted with a richer `extra` after each additional measurement
lands.  The expensive train probes (12L deep-train, 36L stream-train
subprocesses) run LAST and only while wall-clock remains inside
BENCH_BUDGET_S (default 1500 s); a timed-out or skipped extra can no
longer starve the headline (round-4 failure mode: BENCH_r04 rc=124
with zero output because ~55 min of training subprocesses ran before
the first print).

A persistent XLA compile cache (JAX_COMPILATION_CACHE_DIR → ./.jax_cache)
is enabled for this process and the probe subprocesses; on a warm cache
the serving-segment compiles (~5 min each cold over the axon tunnel)
collapse to seconds, letting the full extra set fit the budget.

vs_baseline is value / 5.0 — BASELINE.json's ≥5× real-time per-chip target
(the reference publishes no throughput numbers).
"""

import json
import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))

_T0 = time.time()


def flash_speedup():
    import jax
    import jax.numpy as jnp

    from unimoe_audio_tpu.ops.flash_attention import (
        _reference_attention, flash_attention,
    )
    from unimoe_audio_tpu.utils.profiling import timeit_in_jit

    B, H, KV, T, Dh = 4, 16, 2, 2048, 128
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(ks[0], (B, H, T, Dh), jnp.bfloat16) * 0.3
    k = jax.random.normal(ks[1], (B, KV, T, Dh), jnp.bfloat16) * 0.3
    v = jax.random.normal(ks[2], (B, KV, T, Dh), jnp.bfloat16)
    valid = jnp.ones((B, T), jnp.int32)
    co = jax.random.normal(ks[3], (B, H, T, Dh), jnp.bfloat16)

    def g(attn):
        return jax.grad(lambda a, b, c: jnp.sum(
            attn(a, b, c).astype(jnp.float32) * co.astype(jnp.float32)
        ), argnums=(0, 1, 2))

    t_f = timeit_in_jit(g(lambda a, b, c: flash_attention(a, b, c, valid)),
                        q, k, v, iters=8)
    t_x = timeit_in_jit(g(lambda a, b, c: _reference_attention(a, b, c, valid, True)),
                        q, k, v, iters=8)
    return t_x / t_f


def train_tokens_per_sec():
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from unimoe_audio_tpu.config import TextMoEConfig, UniMoEAudioConfig
    from unimoe_audio_tpu.models.model import init_model_params
    from unimoe_audio_tpu.train.step import (
        init_train_state, make_optimizer, train_step,
    )

    cfg = UniMoEAudioConfig(
        text_config=dataclasses.replace(TextMoEConfig(), num_hidden_layers=4),
        vision_config=None,
    )
    params = jax.jit(lambda k: init_model_params(k, cfg, dtype=jnp.bfloat16))(
        jax.random.PRNGKey(0))
    opt = make_optimizer(learning_rate=1e-4, total_steps=100, warmup_steps=1)
    state = init_train_state(params, opt)
    B, T, C = 4, 2048, cfg.codec_channels
    rng = np.random.default_rng(0)
    codec = rng.integers(0, cfg.codec_eos_value, size=(B, T, C)).astype(np.int32)
    batch = {
        "input_ids": jnp.full((B, T), cfg.codec_placeholder_value, jnp.int32),
        "codec_input_ids": jnp.asarray(codec),
        "attention_mask": jnp.ones((B, T), jnp.int32),
        "codec_labels": jnp.asarray(codec),
    }
    step = jax.jit(
        lambda s, b, r: train_step(s, b, r, cfg=cfg, optimizer=opt, remat=True),
        donate_argnums=(0,),
    )
    state, m = step(state, batch, jax.random.PRNGKey(1))
    jax.block_until_ready(m["loss"])
    t0 = time.time()
    n = 3
    for i in range(n):
        state, m = step(state, batch, jax.random.PRNGKey(2 + i))
    jax.block_until_ready(m["loss"])
    dt = (time.time() - t0) / n
    del state
    return B * T / dt


def stream_train_probe(gas: int = 2, moment_dtype: str = "int8"):
    """FULL 36-layer flagship training on ONE chip via layer-streamed
    params + host-resident Adam moments (train/stream.py — the
    reference's ZeRO-2 param+optimizer CPU-offload regime,
    deepspeed_zero2.conf:23-37 offload_param/offload_optimizer).  Device
    residency is depth-independent; ~6.9B params train on 16 GB HBM.

    Measured configuration: int8 blockwise-quantized moments
    (train/qmoment.py, ~4x less update-phase PCIe) + gradient
    accumulation over `gas` micro-batches (one params+moments round trip
    per applied step — the reference's gradient_accumulation_steps).
    Runs as a bench subprocess (isolated HBM; one JSON line on stdout)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from unimoe_audio_tpu.config import TextMoEConfig, UniMoEAudioConfig
    from unimoe_audio_tpu.train.stream import StreamTrainer

    cfg = UniMoEAudioConfig(text_config=TextMoEConfig(), vision_config=None)
    L = cfg.text_config.num_hidden_layers
    t0 = time.time()
    tr = StreamTrainer(cfg, rng=jax.random.PRNGKey(0), learning_rate=1e-4,
                       grad_clip=1.0, moment_dtype=moment_dtype)
    n_params = sum(
        int(np.prod(x.shape))
        for lp in tr.layers_host for x in jax.tree.leaves(lp))
    n_params += sum(x.size for x in jax.tree.leaves(tr.outer_state.params))
    n_params += sum(x.size for x in jax.tree.leaves(tr.static_outer))
    init_s = time.time() - t0
    tr.outer_opt.precompile(tr.outer_state.params)

    # B=8 measured best on the axon v5e: the per-step PCIe param+moment
    # stream is batch-independent, so larger B amortizes it (B=4: 221
    # tok/s, B=8: 371 tok/s with fp32 moments / gas=1).
    B, T, C = 8, 2048, cfg.codec_channels
    rng = np.random.default_rng(0)

    def mk_batch(seed):
        codec = np.random.default_rng(seed).integers(
            0, cfg.codec_eos_value, size=(B, T, C)).astype(np.int32)
        return {
            "input_ids": jnp.full((B, T), cfg.codec_placeholder_value, jnp.int32),
            "codec_input_ids": jnp.asarray(codec),
            "attention_mask": jnp.ones((B, T), jnp.int32),
            "codec_labels": jnp.asarray(codec),
        }

    micros = [mk_batch(i) for i in range(gas)]
    step_in = micros if gas > 1 else micros[0]
    t0 = time.time()
    m = tr.train_step(step_in, jax.random.PRNGKey(1))  # compiles everything
    _sync(tr)
    compile_s = time.time() - t0
    assert m["skipped"] == 0.0 and np.isfinite(m["loss"])
    # The first 1-2 post-compile steps absorb the server-side async queue
    # backlog (sync() blocks the step's critical path, not the whole
    # queue) and can read 5-7x slower than steady state — time 4 and take
    # the min of the last 3 (measured: 77 s drain step vs 11.5 s steady).
    times = []
    for i in range(4):
        t0 = time.time()
        m = tr.train_step(step_in, jax.random.PRNGKey(2 + i))
        _sync(tr)
        times.append(time.time() - t0)
    dt = min(times[1:])
    print(json.dumps({
        "full_train_tokens_per_sec": round(gas * B * T / dt, 0),
        "full_train_layers": L,
        "full_train_params_b": round(n_params / 1e9, 2),
        "full_train_step_s": round(dt, 2),
        "full_train_accum": gas,
        "full_train_moment_dtype": moment_dtype,
        "full_train_init_s": round(init_s, 1),
        "full_train_compile_s": round(compile_s, 1),
        "full_train_final_loss": round(float(m["loss"]), 3),
    }))


def _sync(tr):
    """Block until the async update phase lands (last layer + outer)."""
    import jax

    jax.block_until_ready(jax.tree.leaves(tr.layers_host[-1])[0])
    jax.block_until_ready(jax.tree.leaves(tr.outer_state.params)[0])


def deep_train_probe(moment_dtype: str = "int8"):
    """12-layer flagship-WIDTH training on ONE chip via host-offloaded
    Adam moments (train/offload.py — the reference's ZeRO-2 CPU
    offload capability, deepspeed_zero2.conf:23-37).  3x the depth that
    fits with device-resident moments; int8 blockwise-quantized moments
    (train/qmoment.py) quarter the per-step moment PCIe stream.  Runs as
    a bench subprocess (isolated HBM; prints one JSON line on stdout)."""
    import dataclasses

    import numpy as np
    import jax
    import jax.numpy as jnp

    from unimoe_audio_tpu.config import TextMoEConfig, UniMoEAudioConfig
    from unimoe_audio_tpu.models.model import init_model_params
    from unimoe_audio_tpu.train.offload import OffloadAdamW, OffloadTrainer

    L = 12
    cfg = UniMoEAudioConfig(
        text_config=dataclasses.replace(TextMoEConfig(), num_hidden_layers=L),
        vision_config=None)
    params = jax.jit(lambda k: init_model_params(k, cfg, dtype=jnp.bfloat16))(
        jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    off = OffloadAdamW(learning_rate=1e-4, grad_clip=1.0,
                       moment_dtype=moment_dtype)
    n_progs = off.precompile(params)  # parallel remote compiles
    tr = OffloadTrainer(cfg, params, off, remat=True)
    del params
    B, T, C = 2, 2048, cfg.codec_channels
    rng = np.random.default_rng(0)
    codec = rng.integers(0, cfg.codec_eos_value, size=(B, T, C)).astype(np.int32)
    batch = {
        "input_ids": jnp.full((B, T), cfg.codec_placeholder_value, jnp.int32),
        "codec_input_ids": jnp.asarray(codec),
        "attention_mask": jnp.ones((B, T), jnp.int32),
        "codec_labels": jnp.asarray(codec),
    }
    m = tr.train_step(batch, jax.random.PRNGKey(1))  # compile step
    assert m["skipped"] == 0.0 and np.isfinite(m["loss"])
    times = []
    for i in range(4):
        t0 = time.time()
        m = tr.train_step(batch, jax.random.PRNGKey(2 + i))
        float(np.asarray(jax.tree.leaves(tr.state.params)[0]).ravel()[0])
        times.append(time.time() - t0)
    dt = min(times[1:])  # early steps drain leftover async queue backlog
    print(json.dumps({
        "deep_train_tokens_per_sec": round(B * T / dt, 0),
        "deep_train_layers": L,
        "deep_train_params_b": round(n_params / 1e9, 2),
        "deep_train_step_s": round(dt, 2),
        "deep_train_moment_dtype": moment_dtype,
        "offload_update_programs": n_progs,
        "final_loss": round(float(m["loss"]), 3),
    }))


def main(agg: str = "int4"):
    """agg picks the aggregate-headline serving config:
    "int8" | "int8+kv8" | "int4" | "int4+kv8" | "int4a8" — experts int8
    or packed-s4 int4 (identical runtime layout to the quality-audited
    int4-gptq mode), KV cache bf16 or int8 (models/layers.KVCache);
    "int4a8" adds int8-MXU expert compute (w4a8: per-row activation quant,
    s8×s8→s32 dots at 2× the bf16 MXU rate — the decode step is
    expert-compute-bound, docs/ROOFLINE.md) on prefill AND decode, and
    runs B=128: the extra compute headroom moves the per-stream-≥1.1×
    batch frontier out (measured 2026-08-19: B=88 139.4×/1.58×,
    B=128 155.7×/1.22×; int4 bf16-compute B=88 was 111.7×/1.27× the same
    session).  Earlier battery context: int4 109.33×/1.242× vs int8
    99.6×/1.132× at B=88; B=112 bf16-compute failed per-stream (1.007×).

    Measurement order is headline-first (see module docstring): the B=88
    aggregate prints as soon as it is measured, then TTFA/single-stream
    on the SAME serving params (int4 by default — the serving operating
    point), then the cheap extras, then the train subprocesses, each
    gated on remaining BENCH_BUDGET_S and each followed by a re-emit of
    the full JSON line."""
    import gc
    import subprocess

    import numpy as np
    import jax
    import jax.numpy as jnp

    from unimoe_audio_tpu.config import TextMoEConfig, UniMoEAudioConfig
    from unimoe_audio_tpu.codec import delay as dl
    from unimoe_audio_tpu.generate.loop import generate_jit, pad_buffer
    from unimoe_audio_tpu.models.model import init_model_params
    from unimoe_audio_tpu.ops.quant import (
        pad_expert_ffn, quantize_model_params_inplace,
        requantize_experts_int4_inplace,
    )

    budget = float(os.environ.get("BENCH_BUDGET_S", "1500"))

    def remaining():
        return budget - (time.time() - _T0)

    FRAME_RATE = 50.0
    A8 = agg.endswith("a8")
    B = 128 if A8 else 88
    T_text = 32
    max_tokens = 150
    # Per-expert slot budgets, scaled from the proven B=88 operating point
    # (112 decode / 3328 prefill slots) like tools/probe_a8_agg.py.
    DCAP = max(int(round(112 * B / 88 / 8)) * 8, 8)
    PCAP = max(int(round(3328 * B / 88 / 128)) * 128, 128)

    extra = {"agg_config": agg}
    state = {"rtf": 0.0, "layers": 0}

    def emit():
        extra["bench_elapsed_s"] = round(time.time() - _T0, 0)
        print(json.dumps({
            "metric": f"audio-sec/sec/chip (aggregate decode RTF, {agg}+packed "
                      f"serving, B={B}, {state['layers']}L flagship cfg)",
            "value": round(state["rtf"], 3),
            "unit": "x_realtime",
            "vs_baseline": round(state["rtf"] / 5.0, 3),
            "extra": dict(extra),
        }), flush=True)

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
    state["layers"] = cfg.text_config.num_hidden_layers
    params = quantize_model_params_inplace(params)
    params = pad_expert_ffn(params)
    if agg.startswith("int4"):
        # In-place int8→packed-s4 requantization of the expert FFNs
        # (per-channel scales — the fused-dequant serving layout).  The
        # int8 originals are freed leaf-by-leaf as it streams.
        params = requantize_experts_int4_inplace(params)
        gc.collect()

    def inputs(n_streams, mt):
        ids = jnp.asarray(
            np.random.default_rng(0).integers(0, cfg.text_config.vocab_size - 1,
                                              size=(2 * n_streams, T_text)))
        attn = jnp.ones((2 * n_streams, T_text), dtype=jnp.int32)
        prefill, steps = dl.prepare_audio_prompt(
            [None] * n_streams, num_channels=cfg.codec_channels,
            bos_value=cfg.codec_bos_value, delay_pattern=cfg.codec_delay_pattern,
        )
        return ids, attn, pad_buffer(prefill, mt), jnp.asarray(steps, jnp.int32)

    common = dict(
        cfg_scale=jnp.float32(10.0), temperature=jnp.float32(1.0),
        top_p=jnp.float32(1.0), cfg_filter_top_k=45,
        eos_prob_mul_factor=jnp.float32(0.6),
    )

    # ---- headline FIRST: aggregate decode RTF, B=88, packed dispatch ---
    ids, attn, buf, steps = inputs(B, max_tokens)
    mode = "packed_a8" if A8 else "packed"
    kwargs = dict(
        max_tokens=max_tokens, min_tokens=jnp.int32(max_tokens), do_sample=True,
        dispatch_mode=mode, prefill_capacity=PCAP,
        decode_dispatch_mode=mode, decode_capacity=DCAP, **common,
    )
    if agg.endswith("+kv8"):
        kwargs["kv_dtype"] = "int8"
    res = generate_jit(params, cfg, ids, attn, None, buf, steps,
                       jax.random.PRNGKey(1), **kwargs)
    jax.block_until_ready(res.codes)
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
    state["rtf"] = B * steps_per_sec / FRAME_RATE
    extra["per_stream_rtf"] = round(steps_per_sec / FRAME_RATE, 3)
    del res, ids, attn, buf, steps
    emit()

    # ---- TTFA p50: prefill + first decode step, single stream ----------
    # Measured on the SAME serving params as the headline (int4 experts
    # by default — the operating point a latency-sensitive request sees).
    try:
        ids1, attn1, buf1, steps1 = inputs(1, 24)
        kw1 = dict(max_tokens=24, min_tokens=jnp.int32(24), do_sample=True,
                   **common)
        stop = jnp.int32(int(steps1[0]))
        r = generate_jit(params, cfg, ids1, attn1, None, buf1, steps1,
                         jax.random.PRNGKey(0), stop_at=stop, **kw1)
        jax.block_until_ready(r.codes)
        lat = []
        for i in range(5):
            t0 = time.time()
            r = generate_jit(params, cfg, ids1, attn1, None, buf1, steps1,
                             jax.random.PRNGKey(1 + i), stop_at=stop, **kw1)
            jax.block_until_ready(r.codes)
            lat.append(time.time() - t0)
        lat.sort()
        extra["ttfa_p50_ms"] = round(lat[len(lat) // 2] * 1e3, 1)

        # ---- single-stream decode RTF (greedy latency mode) ------------
        # int4 default: packed-s4 expert FFNs halve the dominant weight
        # stream — measured 6.23 ms/step, 3.21x RT (int8: 9.55 ms, 2.10x).
        kw_ss = dict(max_tokens=100, min_tokens=jnp.int32(100),
                     do_sample=False, **common)
        ids1, attn1, buf1, steps1 = inputs(1, 100)
        r = generate_jit(params, cfg, ids1, attn1, None, buf1, steps1,
                         jax.random.PRNGKey(0), **kw_ss)
        jax.block_until_ready(r.codes)
        best_ss = 1e9
        for i in range(2):
            t0 = time.time()
            r = generate_jit(params, cfg, ids1, attn1, None, buf1, steps1,
                             jax.random.PRNGKey(1), **kw_ss)
            jax.block_until_ready(r.codes)
            best_ss = min(best_ss, (time.time() - t0) / int(r.steps))
        extra["single_stream_rtf"] = round(1.0 / best_ss / FRAME_RATE, 2)
        if not agg.startswith("int4"):
            extra["single_stream_rtf_int8"] = extra["single_stream_rtf"]
        del r, ids1, attn1, buf1, steps1
        emit()
    except Exception as e:  # noqa: BLE001 — keep the headline alive
        print(f"single-stream segment failed: {type(e).__name__}: {e}",
              file=sys.stderr)

    # ---- extras, cheapest first, each gated on the remaining budget ----
    del params
    gc.collect()

    if remaining() > 120:
        try:
            extra["flash_fwd_bwd_speedup"] = round(flash_speedup(), 2)
            emit()
        except Exception as e:  # noqa: BLE001
            print(f"flash probe failed: {e}", file=sys.stderr)
    if remaining() > 300:
        try:
            extra["train_tokens_per_sec"] = round(train_tokens_per_sec(), 0)
            emit()
        except Exception as e:  # noqa: BLE001
            print(f"train probe failed: {e}", file=sys.stderr)

    def run_probe(args, timeout_s):
        try:
            r = subprocess.run(
                [sys.executable, __file__, *args],
                capture_output=True, text=True, timeout=timeout_s,
            )
            for line in reversed(r.stdout.strip().splitlines()):
                try:
                    return json.loads(line)
                except json.JSONDecodeError:
                    continue
            print(f"probe {args} produced no JSON (rc={r.returncode}): "
                  f"{r.stderr[-300:]}", file=sys.stderr)
        except subprocess.TimeoutExpired:
            print(f"probe {args} timed out ({timeout_s:.0f}s)", file=sys.stderr)
        return {}

    # 12L flagship-width deep-train (host-offloaded moments) subprocess.
    if remaining() > 420:
        got = run_probe(["--deep-train"], min(1500, remaining() - 45))
        if got:
            extra.update(got)
            emit()

    # Full 36L flagship layer-streamed training.  Preferred config first
    # (int8 moments + grad accum); the round-2-proven fp32/gas=1 fallback
    # only if the preferred one failed AND generous budget remains.
    if remaining() > 600:
        got = run_probe(["--stream-train"], min(1800, remaining() - 45))
        if not got and remaining() > 900:
            got = run_probe(["--stream-train", "--gas", "1",
                             "--moments", "float32"],
                            min(1800, remaining() - 45))
        if got:
            extra.update(got)
            emit()

    # Final (possibly identical) line — the one the driver records.
    emit()


if __name__ == "__main__":
    if "--deep-train" in sys.argv:
        mdt = sys.argv[sys.argv.index("--moments") + 1] \
            if "--moments" in sys.argv else "int8"
        deep_train_probe(moment_dtype=mdt)
    elif "--stream-train" in sys.argv:
        gas = int(sys.argv[sys.argv.index("--gas") + 1]) \
            if "--gas" in sys.argv else 2
        mdt = sys.argv[sys.argv.index("--moments") + 1] \
            if "--moments" in sys.argv else "int8"
        stream_train_probe(gas=gas, moment_dtype=mdt)
    else:
        agg = sys.argv[sys.argv.index("--agg") + 1] \
            if "--agg" in sys.argv else "int4a8"
        try:
            main(agg=agg)
        except Exception as e:  # noqa: BLE001
            # Backend outages (e.g. `UNAVAILABLE: TPU backend setup/compile
            # error`, which persisted for hours on 2026-08-17/18) would
            # otherwise produce NO json line at all.  Emit an explicit
            # error record so the run is diagnosable; value 0 + error field
            # = "did not run", not a measurement.
            print(json.dumps({
                "metric": "audio-sec/sec/chip (aggregate decode RTF)",
                "value": 0.0, "unit": "x_realtime", "vs_baseline": 0.0,
                "error": f"{type(e).__name__}: {e}"[:500],
            }), flush=True)
            raise
