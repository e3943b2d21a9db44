"""Qwen2.5-VL vision tower, TPU-native.

Port of Qwen2_5_VisionTransformerPretrainedModel (reference:
utils/UniMoE_Audio_utils.py:702-900).  TPU-first departures:

  * The reference hand-rolls Conv3D as depth-sliced conv2d because Ascend
    lacks conv3d (utils/UniMoE_Audio_utils.py:585-699).  Since
    kernel == stride (non-overlapping patches), the patch embed is exactly
    a linear projection of flattened patches — one MXU matmul, no conv at
    all.
  * Windowed attention (window shuffle + cu_seqlens) becomes a
    block-diagonal boolean mask over the shuffled sequence — static-shape
    friendly and XLA-fusable.  Full-attention blocks ({7,15,23,31},
    utils/config.json:160-166) use the per-sample mask instead.

Host-side index computation (rot_pos_emb grids, window shuffle) runs in
numpy per call — shapes are data-dependent and tiny.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import VisionConfig
from .layers import rms_norm


# ---------------------------------------------------------------------------
# Host-side index computation
# ---------------------------------------------------------------------------

def rot_pos_ids(grid_thw: np.ndarray, spatial_merge_size: int) -> np.ndarray:
    """(h, w) position ids per patch in merger order (reference rot_pos_emb,
    utils/UniMoE_Audio_utils.py:786-813).  Returns [S, 2] int32."""
    pos_ids = []
    for t, h, w in np.asarray(grid_thw):
        m = spatial_merge_size
        hpos = np.arange(h)[:, None].repeat(w, axis=1)
        hpos = hpos.reshape(h // m, m, w // m, m).transpose(0, 2, 1, 3).reshape(-1)
        wpos = np.arange(w)[None, :].repeat(h, axis=0)
        wpos = wpos.reshape(h // m, m, w // m, m).transpose(0, 2, 1, 3).reshape(-1)
        pos_ids.append(np.tile(np.stack([hpos, wpos], axis=-1), (t, 1)))
    return np.concatenate(pos_ids, axis=0).astype(np.int32)


def window_index(grid_thw: np.ndarray, cfg: VisionConfig) -> Tuple[np.ndarray, np.ndarray]:
    """Window-shuffle order + per-position window ids (reference
    get_window_index, utils/UniMoE_Audio_utils.py:815-854).

    Returns (index [S_merged], window_id [S_merged]) where S_merged =
    Σ t·(h/m)·(w/m); window_id marks which attention window each MERGED
    position belongs to after the shuffle.
    """
    m = cfg.spatial_merge_size
    vit_ws = cfg.window_size // m // cfg.patch_size
    index_list: List[np.ndarray] = []
    window_ids: List[np.ndarray] = []
    offset = 0
    wid_offset = 0
    for t, h, w in np.asarray(grid_thw):
        gh, gw = h // m, w // m
        idx = np.arange(t * gh * gw).reshape(t, gh, gw)
        pad_h = (-gh) % vit_ws
        pad_w = (-gw) % vit_ws
        nh, nw = (gh + pad_h) // vit_ws, (gw + pad_w) // vit_ws
        padded = np.full((t, gh + pad_h, gw + pad_w), -100, dtype=np.int64)
        padded[:, :gh, :gw] = idx
        padded = padded.reshape(t, nh, vit_ws, nw, vit_ws).transpose(0, 1, 3, 2, 4)
        padded = padded.reshape(t, nh * nw, vit_ws * vit_ws)
        for ti in range(t):
            for wi in range(nh * nw):
                vals = padded[ti, wi]
                vals = vals[vals != -100]
                index_list.append(vals + offset)
                window_ids.append(np.full(len(vals), wid_offset, dtype=np.int64))
                wid_offset += 1
        offset += t * gh * gw
    return (
        np.concatenate(index_list).astype(np.int32),
        np.concatenate(window_ids).astype(np.int32),
    )


def sample_ids(grid_thw: np.ndarray) -> np.ndarray:
    """Per merged-patch sample index (for the full-attention mask)."""
    out = []
    for i, (t, h, w) in enumerate(np.asarray(grid_thw)):
        out.append(np.full(t * h * w, i, dtype=np.int32))
    return np.concatenate(out)


# ---------------------------------------------------------------------------
# Device-side forward
# ---------------------------------------------------------------------------

def _vision_rope(pos_ids: jnp.ndarray, head_dim: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """2-D rotary embedding: half the freq dims take h-pos, half w-pos
    (reference: Qwen2_5_VisionRotaryEmbedding at head_dim//2, theta 1e4)."""
    quarter = head_dim // 4
    inv_freq = 1.0 / (10000.0 ** (jnp.arange(quarter, dtype=jnp.float32) / quarter))
    h_ang = pos_ids[:, 0:1].astype(jnp.float32) * inv_freq[None]  # [S, q]
    w_ang = pos_ids[:, 1:2].astype(jnp.float32) * inv_freq[None]
    ang = jnp.concatenate([h_ang, w_ang], axis=-1)        # [S, head_dim/2]
    emb = jnp.concatenate([ang, ang], axis=-1)            # [S, head_dim]
    return jnp.cos(emb), jnp.sin(emb)


def _rotate_half(x):
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def vision_block(p: Dict, x: jnp.ndarray, cos, sin, attn_mask: jnp.ndarray,
                 cfg: VisionConfig) -> jnp.ndarray:
    """One ViT block: RMSNorm → windowed/full attention → RMSNorm → SwiGLU.
    Projections go through ops.quant.matmul so int8 serving weights
    (QTensor) work transparently."""
    from ..ops.quant import matmul as qmm

    S, D = x.shape
    H = cfg.num_heads
    Dh = D // H

    h = rms_norm(x[None], p["norm1"])[0]
    qkv = qmm(h, p["qkv"]["w"]) + p["qkv"]["b"]  # [S, 3D]
    q, k, v = jnp.split(qkv.reshape(S, 3, H, Dh), 3, axis=1)
    q, k, v = q[:, 0], k[:, 0], v[:, 0]  # [S, H, Dh]
    cos_ = cos[:, None, :].astype(q.dtype)
    sin_ = sin[:, None, :].astype(q.dtype)
    q = q * cos_ + _rotate_half(q) * sin_
    k = k * cos_ + _rotate_half(k) * sin_

    scores = jnp.einsum("shd,thd->hst", q, k).astype(jnp.float32) * (Dh ** -0.5)
    scores = jnp.where(attn_mask[None], scores, jnp.float32(-1e30))
    probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    out = jnp.einsum("hst,thd->shd", probs, v).reshape(S, D)
    x = x + qmm(out, p["proj"]["w"]) + p["proj"]["b"]

    h = rms_norm(x[None], p["norm2"])[0]
    g = qmm(h, p["mlp"]["gate"]["w"]) + p["mlp"]["gate"]["b"]
    u = qmm(h, p["mlp"]["up"]["w"]) + p["mlp"]["up"]["b"]
    x = x + qmm(jax.nn.silu(g) * u, p["mlp"]["down"]["w"]) + p["mlp"]["down"]["b"]
    return x


import functools


def vision_indices(
    grid_thw: np.ndarray, cfg: VisionConfig, pad_merged_to: int = 0
) -> Dict[str, np.ndarray]:
    """Host-side index bundle for `vision_tower_apply` — everything
    data-dependent about a vision batch, as plain arrays so the tower
    itself can run (and differentiate) INSIDE a jitted train step.

    Optionally pads the merged-token count up to `pad_merged_to` (a static
    bucket) so one compiled train step serves many grid shapes: padding
    patches get window/sample id -1 (attend only each other, are attended
    by nobody real, and their output rows are never consumed downstream —
    so they contribute exactly zero gradient).

    Returns: pos [Sp, 2] rope ids (shuffled order), win_ids [Sp],
    sample_ids [Sp], widx [Smp], reverse [Smp], n_merged (real count).
    """
    m = cfg.spatial_merge_size
    m2 = m ** 2
    pos = rot_pos_ids(grid_thw, m)                               # [S, 2]
    widx, wid = window_index(grid_thw, cfg)                      # [S/m2]
    n_merged = len(widx)
    S = n_merged * m2
    pos = pos.reshape(n_merged, m2, 2)[widx].reshape(S, 2)
    wid_patch = np.repeat(wid, m2)
    sid_patch = np.repeat(sample_ids_merged(grid_thw, m)[widx], m2)
    reverse = np.argsort(widx)

    if pad_merged_to and pad_merged_to > n_merged:
        pm = pad_merged_to
        pad_m = pm - n_merged
        pos = np.concatenate([pos, np.zeros((pad_m * m2, 2), pos.dtype)])
        wid_patch = np.concatenate(
            [wid_patch, np.full(pad_m * m2, -1, wid_patch.dtype)])
        sid_patch = np.concatenate(
            [sid_patch, np.full(pad_m * m2, -1, sid_patch.dtype)])
        # Padded merged slots shuffle to themselves and reverse to
        # themselves (identity on the tail).
        widx = np.concatenate([widx, np.arange(n_merged, pm, dtype=widx.dtype)])
        reverse = np.concatenate(
            [reverse, np.arange(n_merged, pm, dtype=reverse.dtype)])
    return {
        "pos": pos.astype(np.int32),
        "win_ids": wid_patch.astype(np.int32),
        "sample_ids": sid_patch.astype(np.int32),
        "widx": widx.astype(np.int32),
        "reverse": reverse.astype(np.int32),
        "n_merged": n_merged,
    }


def vision_tower_apply(
    params: Dict,
    patches: jnp.ndarray,        # [Sp, patch_dim], Sp = merged·m²(padded ok)
    pos: jnp.ndarray,            # [Sp, 2]
    win_ids: jnp.ndarray,        # [Sp]
    sample_ids: jnp.ndarray,     # [Sp]
    widx: jnp.ndarray,           # [Smp]
    reverse: jnp.ndarray,        # [Smp]
    cfg: VisionConfig,
) -> jnp.ndarray:
    """Pure jittable tower: patch embed → window shuffle → blocks →
    merger → unshuffle.  All shapes static; index/mask arrays come from
    `vision_indices`.  Differentiable w.r.t. params — the reference
    trains the ViT by default (train_unimoev2_qwen2vl.py:310-314)."""
    m2 = cfg.spatial_merge_size ** 2
    S = patches.shape[0]
    cos, sin = _vision_rope(pos, cfg.head_dim)
    win_mask = win_ids[:, None] == win_ids[None, :]
    full_mask = sample_ids[:, None] == sample_ids[None, :]

    from ..ops.quant import QTensor
    from ..ops.quant import matmul as qmm

    pe = params["patch_embed"]
    in_dtype = pe.q.dtype if isinstance(pe, QTensor) else pe.dtype
    x = qmm(patches.astype(jnp.bfloat16 if in_dtype == jnp.int8 else in_dtype), pe)
    x = x.reshape(S // m2, m2, -1)[widx].reshape(S, -1)

    for i, blk in enumerate(params["blocks"]):
        mask = full_mask if i in cfg.fullatt_block_indexes else win_mask
        x = vision_block(blk, x, cos, sin, mask, cfg)

    # Merger: RMSNorm → concat m2 patches → MLP (reference
    # Qwen2_5_VLPatchMerger).
    from ..ops.quant import matmul as _qmm

    h = rms_norm(x[None], params["merger"]["ln_q"])[0]
    h = h.reshape(S // m2, -1)
    h = _qmm(h, params["merger"]["fc1"]["w"]) + params["merger"]["fc1"]["b"]
    h = jax.nn.gelu(h, approximate=False)
    h = _qmm(h, params["merger"]["fc2"]["w"]) + params["merger"]["fc2"]["b"]
    return h[reverse]


@functools.partial(jax.jit, static_argnames=("cfg",))
def _tower_core(params, patches, pos, win_ids, sample_ids, widx, reverse, cfg):
    return vision_tower_apply(
        params, patches, pos, win_ids, sample_ids, widx, reverse, cfg
    )


def vision_forward(
    params: Dict,
    pixel_patches: jnp.ndarray,   # [S, in_ch·tps·ps·ps] flattened patches
    grid_thw: np.ndarray,         # [n, 3] host array
    cfg: VisionConfig,
) -> jnp.ndarray:
    """Full tower: patch embed → window shuffle → blocks → merger → unshuffle.

    Returns [S/merge², out_hidden] features in the ORIGINAL patch order
    (reference forward, utils/UniMoE_Audio_utils.py:856-900).  Index
    computation is host-side (data-dependent); the tower itself is one
    jitted program per patch-count shape.  For the in-jit training path
    use vision_indices + vision_tower_apply directly.
    """
    idx = vision_indices(np.asarray(grid_thw), cfg)
    return _tower_core(
        params, pixel_patches, jnp.asarray(idx["pos"]),
        jnp.asarray(idx["win_ids"]), jnp.asarray(idx["sample_ids"]),
        jnp.asarray(idx["widx"]), jnp.asarray(idx["reverse"]), cfg,
    )


def sample_ids_merged(grid_thw: np.ndarray, m: int) -> np.ndarray:
    out = []
    for i, (t, h, w) in enumerate(np.asarray(grid_thw)):
        out.append(np.full(t * (h // m) * (w // m), i, dtype=np.int32))
    return np.concatenate(out)


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def init_vision_params(rng: jax.Array, cfg: VisionConfig, dtype=jnp.bfloat16) -> Dict:
    D, F = cfg.hidden_size, cfg.intermediate_size
    patch_dim = cfg.in_channels * cfg.temporal_patch_size * cfg.patch_size ** 2
    m2 = cfg.spatial_merge_size ** 2
    keys = iter(jax.random.split(rng, 16 + 8 * cfg.depth))

    def lin(din, dout):
        return {
            "w": (jax.random.normal(next(keys), (din, dout)) * din ** -0.5).astype(dtype),
            "b": jnp.zeros((dout,), dtype=dtype),
        }

    blocks = []
    for _ in range(cfg.depth):
        blocks.append({
            "norm1": jnp.ones((D,), dtype=dtype),
            "norm2": jnp.ones((D,), dtype=dtype),
            "qkv": lin(D, 3 * D),
            "proj": lin(D, D),
            "mlp": {"gate": lin(D, F), "up": lin(D, F), "down": lin(F, D)},
        })
    return {
        "patch_embed": (jax.random.normal(next(keys), (patch_dim, D)) * patch_dim ** -0.5).astype(dtype),
        "blocks": blocks,
        "merger": {
            "ln_q": jnp.ones((D,), dtype=dtype),
            "fc1": lin(D * m2, D * m2),
            "fc2": lin(D * m2, cfg.out_hidden_size),
        },
    }
