"""Vision tower tests: index-computation parity with the reference's
window/rope logic (numpy oracles from utils/UniMoE_Audio_utils.py:786-854)
and forward shape/permutation-invariance contracts."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from unimoe_audio_tpu.config import VisionConfig
from unimoe_audio_tpu.models import vision as V


def small_cfg():
    return VisionConfig(
        depth=3, hidden_size=32, intermediate_size=64, num_heads=4,
        patch_size=2, temporal_patch_size=2, spatial_merge_size=2,
        out_hidden_size=48, window_size=8, fullatt_block_indexes=(1,),
    )
    # vit_merger_window_size = 8 // 2 // 2 = 2


def torch_window_index(grid_thw, cfg):
    """Oracle: direct port of get_window_index
    (utils/UniMoE_Audio_utils.py:815-854)."""
    import torch
    import torch.nn.functional as F

    window_index, cu_window_seqlens = [], [0]
    window_index_id = 0
    spatial_merge_unit = cfg.spatial_merge_size ** 2
    vit_ws = cfg.window_size // cfg.spatial_merge_size // cfg.patch_size
    for grid_t, grid_h, grid_w in grid_thw:
        llm_h, llm_w = grid_h // cfg.spatial_merge_size, grid_w // cfg.spatial_merge_size
        index = torch.arange(grid_t * llm_h * llm_w).reshape(grid_t, llm_h, llm_w)
        pad_h = vit_ws - llm_h % vit_ws if llm_h % vit_ws else 0
        pad_w = vit_ws - llm_w % vit_ws if llm_w % vit_ws else 0
        # reference pads with full vit_ws even when already divisible
        pad_h = vit_ws - llm_h % vit_ws
        pad_w = vit_ws - llm_w % vit_ws
        nh = (llm_h + pad_h) // vit_ws
        nw = (llm_w + pad_w) // vit_ws
        idxp = F.pad(index, (0, pad_w, 0, pad_h), "constant", -100)
        idxp = idxp.reshape(grid_t, nh, vit_ws, nw, vit_ws)
        idxp = idxp.permute(0, 1, 3, 2, 4).reshape(grid_t, nh * nw, vit_ws, vit_ws)
        seqlens = (idxp != -100).sum([2, 3]).reshape(-1)
        idxp = idxp.reshape(-1)
        idx_new = idxp[idxp != -100]
        window_index.append(idx_new + window_index_id)
        cu = seqlens.cumsum(0) * spatial_merge_unit + cu_window_seqlens[-1]
        cu_window_seqlens.extend(cu.tolist())
        window_index_id += int(grid_t * llm_h * llm_w)
    return torch.cat(window_index).numpy(), np.asarray(cu_window_seqlens)


def test_window_index_matches_reference():
    cfg = small_cfg()
    for grid in ([[1, 8, 8]], [[2, 4, 8]], [[1, 4, 4], [1, 8, 4]]):
        got_idx, got_wid = V.window_index(np.asarray(grid), cfg)
        want_idx, want_cu = torch_window_index(grid, cfg)
        np.testing.assert_array_equal(got_idx, want_idx)
        # window ids must be constant within each cu_seqlens segment
        cu = np.unique(want_cu) // (cfg.spatial_merge_size ** 2)
        for a, b in zip(cu[:-1], cu[1:]):
            assert len(np.unique(got_wid[a:b])) == 1


def test_rot_pos_ids_matches_reference():
    import torch

    cfg = small_cfg()
    grid = np.asarray([[1, 4, 8]])
    got = V.rot_pos_ids(grid, cfg.spatial_merge_size)

    # Oracle (utils/UniMoE_Audio_utils.py:786-809)
    t, h, w = grid[0]
    m = cfg.spatial_merge_size
    hpos = torch.arange(h).unsqueeze(1).expand(-1, w)
    hpos = hpos.reshape(h // m, m, w // m, m).permute(0, 2, 1, 3).flatten()
    wpos = torch.arange(w).unsqueeze(0).expand(h, -1)
    wpos = wpos.reshape(h // m, m, w // m, m).permute(0, 2, 1, 3).flatten()
    want = torch.stack([hpos, wpos], dim=-1).repeat(t, 1).numpy()
    np.testing.assert_array_equal(got, want)


def test_vision_forward_shapes_and_finite():
    cfg = small_cfg()
    params = V.init_vision_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    grid = np.asarray([[1, 4, 8]])
    S = int(grid.prod())
    patch_dim = cfg.in_channels * cfg.temporal_patch_size * cfg.patch_size ** 2
    x = jax.random.normal(jax.random.PRNGKey(1), (S, patch_dim), dtype=jnp.float32)
    out = V.vision_forward(params, x, grid, cfg)
    assert out.shape == (S // 4, cfg.out_hidden_size)
    assert np.isfinite(np.asarray(out)).all()


def test_vision_forward_order_restored():
    """The output must be in original (unshuffled) merged-patch order:
    feeding two distinct samples must keep their features separate and
    deterministic regardless of windowing."""
    cfg = small_cfg()
    params = V.init_vision_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    patch_dim = cfg.in_channels * cfg.temporal_patch_size * cfg.patch_size ** 2
    gridA = np.asarray([[1, 4, 4]])
    gridB = np.asarray([[1, 8, 4]])
    SA, SB = int(gridA.prod()), int(gridB.prod())
    xA = jax.random.normal(jax.random.PRNGKey(2), (SA, patch_dim))
    xB = jax.random.normal(jax.random.PRNGKey(3), (SB, patch_dim))

    outA = V.vision_forward(params, xA, gridA, cfg)
    outB = V.vision_forward(params, xB, gridB, cfg)
    both = V.vision_forward(
        params, jnp.concatenate([xA, xB]), np.concatenate([gridA, gridB]), cfg
    )
    # Full-attention layers only attend within a sample, so the combined
    # run must reproduce each standalone run.
    np.testing.assert_allclose(np.asarray(both[: SA // 4]), np.asarray(outA),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(both[SA // 4:]), np.asarray(outB),
                               rtol=2e-4, atol=2e-5)
