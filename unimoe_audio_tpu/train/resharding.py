"""Expert-parallel checkpoint tooling.

Port of the reference's EP aggregation utilities (reference:
UniMoEV2-Preview/inference/deepspeed_ep_param_aggregation.py:16-48 and the
single/multi-GPU loaders around it):

  * aggregate_deepspeed_moe_checkpoint — read a DeepSpeed MoE checkpoint dir
    (mp_rank_00_model_states.pt + per-(layer,expert) shard files
    layer_{l}_expert_{e}_mp_rank_00_model_states.pt) into ONE flat state
    dict with global expert ids, ready for core.convert.
  * split_expert_shards / merge_expert_shards — stacked expert tensors ↔
    per-rank pytrees (the reference's source_ep→target_ep resharding);
    on TPU meshes this is bookkeeping-free at runtime (the mesh shards the
    stacked tensor), so these exist for export/import interop.
"""

from __future__ import annotations

import os
import re
from typing import Dict, List

import numpy as np


def aggregate_deepspeed_moe_checkpoint(ckpt_dir: str) -> Dict[str, np.ndarray]:
    """DeepSpeed MoE checkpoint dir → flat state dict with global expert ids.

    Expert shard files hold keys like
    '...deepspeed_moe.experts.deepspeed_experts.{local_e}.<rest>'; the file
    name carries (layer, global_expert).  The merged dict renumbers to the
    global id (reference: deepspeed_ep_param_aggregation.py:24-41).
    """
    import torch

    def to_np(v):
        # Preserve integer/bool dtypes (step counters, masks); only bf16
        # needs the float() detour (numpy lacks torch bf16 interop).
        if not hasattr(v, "numpy"):
            return np.asarray(v)
        if v.dtype.is_floating_point:
            return np.asarray(v.float().numpy())
        return np.asarray(v.numpy())

    base = os.path.join(ckpt_dir, "mp_rank_00_model_states.pt")
    blob = torch.load(base, map_location="cpu", weights_only=False)
    sd = blob.get("module", blob)
    merged = {k: to_np(v) for k, v in sd.items()}

    pat = re.compile(r"layer_(\d+)_expert_(\d+)_mp_rank_00_model_states\.pt")
    for fname in sorted(os.listdir(ckpt_dir)):
        m = pat.match(fname)
        if not m:
            continue
        layer, global_e = int(m.group(1)), int(m.group(2))
        shard = torch.load(os.path.join(ckpt_dir, fname), map_location="cpu",
                           weights_only=False)
        for k, v in shard.items():
            # Reference shard-consistency asserts
            # (deepspeed_ep_param_aggregation.py:35-41): the in-key layer
            # must match the filename and the renamed key must be fresh —
            # otherwise a malformed shard silently overwrites an expert.
            km = re.search(r"\.(\d+)\.deepspeed_moe\.", k)
            if km is not None:
                assert int(km.group(1)) == layer, (
                    f"{fname}: key layer {km.group(1)} != file layer {layer}")
            nk = re.sub(
                r"deepspeed_experts\.(\d+)\.", f"deepspeed_experts.{global_e}.", k
            )
            assert nk not in merged, (
                f"{fname}: duplicate target key {nk} — shard holds more "
                "than one local expert or repeats a global id")
            merged[nk] = to_np(v)
    return merged


def split_expert_shards(params: Dict, ep_size: int) -> List[Dict]:
    """Stacked dynamic experts [L, E, ...] → ep_size pytrees of
    [L, E/ep, ...] (per-rank export, the inverse of what a Mesh does
    automatically)."""
    dyn = params["layers"]["moe"]["dynamic"]
    E = next(iter(dyn.values())).shape[1]
    assert E % ep_size == 0, f"experts {E} not divisible by ep_size {ep_size}"
    per = E // ep_size
    shards = []
    for r in range(ep_size):
        shard = {
            k: np.asarray(v[:, r * per:(r + 1) * per]) for k, v in dyn.items()
        }
        shards.append(shard)
    return shards


def merge_expert_shards(shards: List[Dict]) -> Dict:
    """Inverse of split_expert_shards."""
    return {
        k: np.concatenate([np.asarray(s[k]) for s in shards], axis=1)
        for k in shards[0]
    }
