"""Concurrent request batching for serving.

BASELINE.json's fifth workload is "concurrent multi-task serving
(interleaved TTS/T2M/VT2M requests)".  A single chip decodes fastest when
requests share one generation batch (bench: 8→26× aggregate RTF as B
grows), so this module coalesces concurrent requests:

  * callers submit (task, payload) and block on a Future;
  * a worker drains the queue every `window_s` and coalesces EVERY task
    type into ONE heterogeneous generation batch via
    UniMoEAudio.generate_mixed — per-request sampling knobs (cfg_scale,
    temperature, eos factor, length budgets) ride the batch as per-sample
    vectors, so TTS/T2M/VT2M requests truly share one decode;
  * the batch pads to a batch-size bucket so compiled programs are reused;
  * results fan back out to the callers.
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from typing import Dict, List, Optional

_BUCKETS = (1, 2, 4, 8, 16, 32, 48)


def _bucket(n: int) -> int:
    for b in _BUCKETS:
        if n <= b:
            return b
    return _BUCKETS[-1]


class RequestBatcher:
    def __init__(self, model, *, window_s: float = 0.1, output_dir: str = "./served",
                 max_batch: int = 48):
        self.model = model
        self.window_s = window_s
        self.output_dir = output_dir
        self.max_batch = max_batch
        self._q: "queue.Queue" = queue.Queue()
        self._stop = threading.Event()
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    # ------------------------------------------------------------------
    def submit(self, task_type: str, payload: Dict) -> Future:
        fut: Future = Future()
        self._q.put((task_type, payload, fut))
        return fut

    def close(self):
        self._stop.set()
        self._worker.join(timeout=5)

    # ------------------------------------------------------------------
    def _drain(self) -> List:
        items = []
        try:
            items.append(self._q.get(timeout=self.window_s))
        except queue.Empty:
            return items
        deadline = time.time() + self.window_s
        while len(items) < self.max_batch and time.time() < deadline:
            try:
                items.append(self._q.get_nowait())
            except queue.Empty:
                time.sleep(0.005)
        return items

    # Payload-key aliases accepted from callers (checkpoint-variant
    # spellings, UniMoE_Audio.py:105-118).
    _TTS_ALIASES = {"transcription": "caption",
                    "prompt_transcription": "prompt_text"}
    _SECONDS_KEYS = ("max_audio_seconds", "min_audio_seconds")

    def _to_request(self, task: str, payload: Dict) -> Dict:
        req = {"task": task}
        for k, v in payload.items():
            if k in ("save_name", "output_dir"):
                continue
            req[self._TTS_ALIASES.get(k, k)] = v
        # Validate per-task required keys HERE so one malformed request
        # fails its own Future instead of raising inside the coalesced
        # generate_mixed call and sinking every co-batched caller.
        if task not in ("text_to_music", "text_to_speech", "video_text_to_music"):
            raise ValueError(f"unknown task {task!r}")
        if not str(req.get("caption", "")).strip():
            raise ValueError("empty caption")
        if task == "text_to_speech":
            if not str(req.get("prompt_text", "")).strip():
                raise ValueError("text_to_speech requires prompt_text/"
                                 "prompt_transcription")
            if req.get("prompt_wav") is None and req.get("prompt_codec") is None:
                raise ValueError("text_to_speech requires prompt_wav or prompt_codec")
            if req.get("prompt_wav") is not None and self.model.dac is None:
                raise ValueError("prompt_wav given but no DAC codec is loaded")
            # Reference TTS clamps 2-10 s (examples/inference_framework.py:166-167).
            req["max_audio_seconds"] = min(float(req.get("max_audio_seconds", 10)), 10)
            req["min_audio_seconds"] = max(float(req.get("min_audio_seconds", 2)), 2)
        if task == "video_text_to_music" and req.get("video") is None:
            raise ValueError("video_text_to_music requires video")
        return req

    def _run(self):
        while not self._stop.is_set():
            items = self._drain()
            if not items:
                continue

            batch = []   # (request_dict, fut)
            for t, p, fut in items:
                try:
                    batch.append((self._to_request(t, p), fut))
                except Exception as e:  # noqa: BLE001
                    fut.set_exception(e)
            if not batch:
                continue

            reqs = [r for r, _ in batch]
            b = _bucket(len(reqs))
            # Pad with a minimal canned T2M request (NOT a copy of an
            # arbitrary caller request: padding with a VT2M request would
            # re-run frame extraction + a vision-tower forward per pad row).
            # The pad's length budget is the smallest real budget so it
            # never raises the batch's decode horizon (max over p_max).
            default_s = self.model.MAX_TOKENS / 50
            pad_s = min(float(r.get("max_audio_seconds", default_s)) for r in reqs)
            pad_req = {"task": "text_to_music", "caption": "music",
                       "max_audio_seconds": pad_s,
                       "min_audio_seconds": min(
                           pad_s,
                           min(float(r.get("min_audio_seconds",
                                           self.model.MIN_TOKENS / 50))
                               for r in reqs))}
            padded = reqs + [pad_req] * (b - len(reqs))
            # Per-request "seed" keys are honored via independent
            # fold_in(PRNGKey(seed), step, channel) chains (generate_jit
            # sample_seeds), so the RANDOM DRAWS don't depend on
            # co-batched requests.  Under serving_mode's capacity-packed
            # dispatch, capacity drops can still couple rows (loop.py
            # caveat) — bit-exact per-request reproducibility holds for
            # the dense-dispatch path.
            try:
                paths = self.model.generate_mixed(
                    padded, output_dir=self.output_dir,
                    save_name=f"batch_{int(time.time() * 1e3)}",
                )
                assert len(paths) >= len(batch), "batch result misaligned"
                for i, (_, fut) in enumerate(batch):
                    if not fut.done():
                        fut.set_result(paths[i])
            except Exception as e:  # noqa: BLE001
                # One bad/failing request must not sink unrelated callers:
                # fall back to running each request individually.
                self._run_individually(batch, e)

    def _run_individually(self, batch, batch_exc):
        """Retry each request alone after a coalesced-batch failure so a
        single poisoned request only fails its own Future.

        Triage: request-shaped errors (ValueError/KeyError/TypeError —
        bad fields, malformed prompts) are worth isolating; anything else
        (backend down, OOM) is systemic, and retrying N times would
        multiply the hang/compile cost by batch size — fail everything
        with the batch exception instead.  If a retry hits a systemic
        error mid-way, the remaining requests fail immediately with it."""
        if not isinstance(batch_exc, (ValueError, KeyError, TypeError,
                                      AssertionError)):
            print(f"[batcher] coalesced batch failed with a systemic error "
                  f"({batch_exc!r}); failing {len(batch)} request(s)")
            for _, fut in batch:
                if not fut.done():
                    fut.set_exception(batch_exc)
            return
        print(f"[batcher] coalesced batch failed ({batch_exc!r}); "
              f"retrying {len(batch)} request(s) individually")
        systemic = None
        for i, (req, fut) in enumerate(batch):
            if fut.done():
                continue
            if systemic is not None:
                fut.set_exception(systemic)
                continue
            try:
                paths = self.model.generate_mixed(
                    [req], output_dir=self.output_dir,
                    save_name=f"retry_{int(time.time() * 1e3)}_{i}",
                )
                fut.set_result(paths[0])
            except Exception as e:  # noqa: BLE001
                fut.set_exception(e)
                if not isinstance(e, (ValueError, KeyError, TypeError,
                                      AssertionError)):
                    systemic = e
