"""Probe: continuous batching vs window batching under request churn.

Workload: 16 T2M requests with heterogeneous budgets (2.4-6 s audio),
8 slots.  Window batching decodes ceil(16/8)=2 full batches, each gated
by its slowest member; the rolling server backfills retired slots at
chunk boundaries.  Flagship 36L int8+padded serving params.
"""
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from unimoe_audio_tpu.api import UniMoEAudio
from unimoe_audio_tpu.config import TextMoEConfig, UniMoEAudioConfig
from unimoe_audio_tpu.ops.quant import (
    pad_expert_ffn, quantize_model_params_inplace,
)
from unimoe_audio_tpu.train.data import SimpleTokenizer

cfg = UniMoEAudioConfig(text_config=TextMoEConfig(), vision_config=None)
tok = SimpleTokenizer(vocab_size=10000)
m = UniMoEAudio(None, allow_random=True, config=cfg, tokenizer=tok,
                max_tokens=300, min_tokens=100)
t0 = time.time()
m.params = pad_expert_ffn(quantize_model_params_inplace(m.params))
print(f"quantized in {time.time()-t0:.0f}s", flush=True)

budgets = [(120 + 20 * (i % 10)) / 50.0 for i in range(16)]  # 2.4-6.0 s


def reqs():
    return [m.make_slot_request(
        "t2m", caption=f"instrumental piece number {i}", seed=i,
        max_audio_seconds=budgets[i], min_audio_seconds=2.0, rid=i)
        for i in range(16)]


# --- rolling server -------------------------------------------------------
srv = m.continuous_server(slots=8, t_text=64, horizon=384, chunk_frames=50,
                          do_sample=True)
for r in reqs():
    srv.submit(r)
srv.step()  # compile chunk + prefill programs
warm = time.time()
res = srv.run_until_drained()
roll_s = time.time() - warm
total_audio = sum(r.length for r in res) / 50.0
print(json.dumps({"continuous_wall_s": round(roll_s, 1),
                  "continuous_audio_s": round(total_audio, 1),
                  "continuous_agg_rtf": round(total_audio / roll_s, 2),
                  "note": "post-compile; first chunk excluded"}), flush=True)

# Window-batching reference point, decode-only: two batches of 8, each
# runs to its slowest member's budget.  Ideal window wall-clock =
# sum over batches of (max budget in batch) / per-stream rate; the
# rolling server's wall-clock is bounded by total-work/slots instead.
ideal_window_frames = sum(
    max(int(b * 50) for b in budgets[lo:lo + 8]) for lo in (0, 8))
frames_done = sum(r.length for r in res)
print(json.dumps({"ideal_window_frames": ideal_window_frames,
                  "rolling_wall_s": round(roll_s, 1),
                  "rolling_frames_per_s": round(frames_done / roll_s, 1)},
                 ), flush=True)

# --- wide packed server: 16 slots, capacity-packed decode dispatch +
# int8 KV (the aggregate-throughput serving configuration), 32 requests.
# Guarded: a failure here must not sink the primary dense measurement.
try:
    del srv
    from unimoe_audio_tpu.apps.continuous import SlotServer

    S = 16
    cap = -(-int(2 * S * 0.64) // 16) * 16
    srv2 = SlotServer(m.params, cfg, slots=S, t_text=64, horizon=384,
                      chunk_frames=50, do_sample=True,
                      decode_dispatch_mode="packed", decode_capacity=cap,
                      kv_dtype="int8")
    for i in range(32):
        srv2.submit(m.make_slot_request(
            "t2m", caption=f"instrumental piece number {i}", seed=i,
            max_audio_seconds=budgets[i % 16], min_audio_seconds=2.0,
            rid=100 + i))
    srv2.step()  # compile chunk + prefill programs
    warm = time.time()
    res2 = srv2.run_until_drained()
    wall2 = time.time() - warm
    audio2 = sum(r.length for r in res2) / 50.0
    print(json.dumps({"packed_kv8_slots": S,
                      "packed_kv8_wall_s": round(wall2, 1),
                      "packed_kv8_audio_s": round(audio2, 1),
                      "packed_kv8_agg_rtf": round(audio2 / wall2, 2)}),
          flush=True)
except Exception as e:  # noqa: BLE001
    print(json.dumps({"packed_kv8_error": f"{type(e).__name__}: {e}"[:300]}),
          flush=True)
