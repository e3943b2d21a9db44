"""Profiling & timing utilities.

TPU-native replacement for the reference's DeepSpeed wall-clock timers
(reference: utils/UniMoE_Audio_core.py:440-491 SynchronizedWallClockTimer
around the MoE all-to-alls, gated by wall_clock_breakdown):

  * `trace(logdir)` — context manager around jax.profiler for xprof traces
    (kernel-level breakdown, the reference's missing xprof story).
  * `WallClock` — named phase timers with the same start/stop/elapsed
    surface, correct under async dispatch (synchronizes via host fetch).
  * `timeit_in_jit` — amortized kernel timing that survives the remote
    tunnel's ~30 ms fetch floor (see .claude/skills/verify notes).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(logdir: str = "/tmp/jax-trace", create_perfetto_link: bool = False):
    """Capture an xprof trace of the enclosed block."""
    jax.profiler.start_trace(logdir, create_perfetto_link=create_perfetto_link)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class WallClock:
    """Named wall-clock phase timers (reference timer surface:
    timers(name).start()/.stop()/.elapsed())."""

    def __init__(self):
        self._start: Dict[str, float] = {}
        self._elapsed: Dict[str, float] = {}

    def __call__(self, name: str) -> "WallClock._Phase":
        return WallClock._Phase(self, name)

    class _Phase:
        def __init__(self, clock: "WallClock", name: str):
            self.clock, self.name = clock, name

        def start(self):
            self.clock._start[self.name] = time.time()
            return self

        def stop(self, sync: Optional[jax.Array] = None):
            if sync is not None:
                jax.block_until_ready(sync)
            dt = time.time() - self.clock._start[self.name]
            self.clock._elapsed[self.name] = self.clock._elapsed.get(self.name, 0.0) + dt
            return dt

        def elapsed(self, reset: bool = True) -> float:
            v = self.clock._elapsed.get(self.name, 0.0)
            if reset:
                self.clock._elapsed[self.name] = 0.0
            return v

        def __enter__(self):
            return self.start()

        def __exit__(self, *exc):
            self.stop()


def timeit_in_jit(fn: Callable, *args, iters: int = 8, fetch_floor_s: float = 0.03) -> float:
    """Per-call seconds for fn(*args): iterate inside ONE jit with a data
    dependence, fetch once, subtract the tunnel's fetch floor."""

    @jax.jit
    def run(*a):
        def body(i, acc):
            out = fn(*jax.tree.map(
                lambda x: x + (acc * 1e-9).astype(x.dtype) if jnp.issubdtype(
                    x.dtype, jnp.floating) else x, a))
            leaves = [l for l in jax.tree.leaves(out)
                      if jnp.issubdtype(l.dtype, jnp.floating)]
            return acc + sum(jnp.sum(l.astype(jnp.float32)) for l in leaves) * 1e-9
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    float(run(*args))  # compile
    t0 = time.time()
    float(run(*args))
    return max(0.0, (time.time() - t0 - fetch_floor_s)) / iters


def router_stats(expert_mask, router_top_k, num_dynamic: int) -> Dict[str, object]:
    """Routing observability summary from text_model_forward's
    output_router_stats tensors (the reference returns raw per-layer
    router tuples in every forward, utils/UniMoE_Audio_model.py:421-426)."""
    import numpy as np

    mask = np.asarray(expert_mask)   # [L, S, E]
    topk = np.asarray(router_top_k)  # [L, S]
    dyn = mask[..., :num_dynamic]
    return {
        "mean_top_k": float(topk.mean()),
        "top_k_histogram": {int(k): int(v) for k, v in
                            zip(*np.unique(topk, return_counts=True))},
        "expert_load": dyn.sum(axis=(0, 1)).astype(int).tolist(),
        "expert_load_cv": float(dyn.sum(axis=(0, 1)).std()
                                / max(dyn.sum(axis=(0, 1)).mean(), 1e-9)),
        "per_layer_mean_k": topk.mean(axis=1).tolist(),
    }
