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
