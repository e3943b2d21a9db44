"""EP checkpoint tooling tests: DS-MoE checkpoint aggregation with synthetic
shard files, expert split/merge round trip."""

import os

import numpy as np
import torch
import pytest

from unimoe_audio_tpu.train.resharding import (
    aggregate_deepspeed_moe_checkpoint,
    merge_expert_shards,
    split_expert_shards,
)


def test_aggregate_ds_checkpoint(tmp_path):
    # Base state: non-expert weights.
    base = {"language_model.norm.weight": torch.randn(8)}
    torch.save({"module": base}, tmp_path / "mp_rank_00_model_states.pt")
    # Expert shards: 2 layers × 4 global experts, local id always 0.
    want = {}
    for l in range(2):
        for e in range(4):
            key = (f"language_model.layers.{l}.mlp.dynamic_real_moe.deepspeed_moe."
                   f"experts.deepspeed_experts.0.gate_proj.weight")
            w = torch.randn(4, 8)
            torch.save({key: w}, tmp_path / f"layer_{l}_expert_{e}_mp_rank_00_model_states.pt")
            gk = key.replace("deepspeed_experts.0.", f"deepspeed_experts.{e}.")
            want[gk] = w.numpy()

    merged = aggregate_deepspeed_moe_checkpoint(str(tmp_path))
    assert "language_model.norm.weight" in merged
    for gk, w in want.items():
        np.testing.assert_allclose(merged[gk], w, rtol=1e-6)


@pytest.mark.parametrize("ep", [1, 2, 4])
def test_split_merge_round_trip(ep):
    rng = np.random.default_rng(0)
    dyn = {
        "gate": rng.normal(size=(2, 4, 8, 16)).astype(np.float32),
        "up": rng.normal(size=(2, 4, 8, 16)).astype(np.float32),
        "down": rng.normal(size=(2, 4, 16, 8)).astype(np.float32),
    }
    params = {"layers": {"moe": {"dynamic": dyn}}}
    shards = split_expert_shards(params, ep)
    assert len(shards) == ep
    assert shards[0]["gate"].shape == (2, 4 // ep, 8, 16)
    back = merge_expert_shards(shards)
    for k in dyn:
        np.testing.assert_array_equal(back[k], dyn[k])
