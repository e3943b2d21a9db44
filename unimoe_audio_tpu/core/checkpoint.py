"""Checkpoint save/restore via orbax.

Replaces the reference's three checkpoint formats (SURVEY.md §5: HF
save_pretrained epochs, DeepSpeed per-(layer,expert) shard files, inference
safetensors) with one sharding-aware orbax layout plus import/export
bridges (core/convert.py for HF safetensors, train/resharding.py for
expert resharding).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def _mgr(ckpt_dir: str, max_to_keep: Optional[int] = 3):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        os.path.abspath(ckpt_dir),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
    )


def save_checkpoint(ckpt_dir: str, step: int, state: Any, *,
                    metadata: Optional[Dict] = None, max_to_keep: int = 3) -> None:
    """Save a pytree (TrainState or params) at `step`."""
    import orbax.checkpoint as ocp

    mgr = _mgr(ckpt_dir, max_to_keep)
    mgr.save(step, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()
    if metadata is not None:
        import json

        with open(os.path.join(ckpt_dir, f"meta_{step}.json"), "w") as f:
            json.dump(metadata, f, indent=2, default=str)
    # Prune meta sidecars whose step directories max_to_keep just GC'd —
    # otherwise stale metadata accumulates and can be paired with a
    # deleted step by a reader.
    import re as _re

    live = set(mgr.all_steps())
    for fname in os.listdir(ckpt_dir):
        m = _re.fullmatch(r"meta_(\d+)\.json", fname)
        if m and int(m.group(1)) not in live:
            try:
                os.remove(os.path.join(ckpt_dir, fname))
            except OSError:
                pass


def latest_step(ckpt_dir: str) -> Optional[int]:
    import orbax.checkpoint as ocp

    if not os.path.isdir(ckpt_dir):
        return None
    mgr = _mgr(ckpt_dir)
    return mgr.latest_step()


def restore_checkpoint(ckpt_dir: str, target: Any, step: Optional[int] = None) -> Any:
    """Restore into the structure/shardings of `target` (an abstract or
    concrete pytree).  step=None → latest."""
    import orbax.checkpoint as ocp

    mgr = _mgr(ckpt_dir)
    step = step if step is not None else mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
    return mgr.restore(step, args=ocp.args.StandardRestore(target))
