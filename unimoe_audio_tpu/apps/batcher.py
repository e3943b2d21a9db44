"""Concurrent request batching for serving.

BASELINE.json's fifth workload is "concurrent multi-task serving
(interleaved TTS/T2M/VT2M requests)".  A single chip decodes fastest when
requests share one generation batch (bench: 8→26× aggregate RTF as B
grows), so this module coalesces concurrent requests:

  * callers submit (task, payload) and block on a Future;
  * a worker drains the queue every `window_s`, groups compatible requests
    (same task type), pads the group to a batch-size bucket so compiled
    programs are reused, and runs ONE batched generation;
  * results fan back out to the callers.

Round-1 scope: T2M batching (the framework's text_to_music accepts lists
natively); TTS/VT2M requests pass through individually.
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

    def _run(self):
        while not self._stop.is_set():
            items = self._drain()
            if not items:
                continue
            t2m = [(p, f) for t, p, f in items if t == "text_to_music"]
            other = [(t, p, f) for t, p, f in items if t != "text_to_music"]

            # Reject empty captions up front — text_to_music silently filters
            # them, which would misalign batch results across callers.
            valid_t2m = []
            for p, fut in t2m:
                if not str(p.get("caption", "")).strip():
                    fut.set_exception(ValueError("empty caption"))
                else:
                    valid_t2m.append((p, fut))

            # Only requests with IDENTICAL generation params may share a
            # batch; others run as separate groups.
            groups = {}
            for p, fut in valid_t2m:
                key = tuple(sorted((k, v) for k, v in p.items() if k != "caption"))
                groups.setdefault(key, []).append((p, fut))

            for group in groups.values():
                captions = [p["caption"] for p, _ in group]
                b = _bucket(len(captions))
                padded = captions + [captions[-1]] * (b - len(captions))
                try:
                    paths = self.model.text_to_music(
                        padded, output_dir=self.output_dir,
                        save_name=f"batch_{int(time.time() * 1e3)}",
                        **{k: v for k, v in group[0][0].items()
                           if k != "caption"},
                    )
                    assert len(paths) >= len(group), "batch result misaligned"
                    for i, (_, fut) in enumerate(group):
                        if not fut.done():
                            fut.set_result(paths[i])
                except Exception as e:  # noqa: BLE001
                    for _, fut in group:
                        if not fut.done():
                            fut.set_exception(e)

            for t, p, fut in other:
                try:
                    if t == "text_to_speech":
                        out = self.model.text_to_speech(
                            output_dir=self.output_dir, **p)
                    elif t == "video_text_to_music":
                        out = self.model.video_text_to_music(
                            output_dir=self.output_dir, **p)
                    else:
                        raise ValueError(f"unknown task: {t}")
                    fut.set_result(out[0] if isinstance(out, list) and out else out)
                except Exception as e:  # noqa: BLE001
                    fut.set_exception(e)
