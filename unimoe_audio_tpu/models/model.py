"""UniMoE-Audio model: MoE decoder stack + codec embeddings/heads.

TPU-native port of UniAudioRVQQwen2_5VLMoEForConditionalGeneration
(reference: utils/UniMoE_Audio_model.py:296-871).  Pure functions over a
param pytree with LAYER-STACKED weights: every per-layer tensor carries a
leading [L] axis and the stack runs as one `lax.scan`, so 36 layers compile
as one loop body (fast compiles, natural pipeline sharding later).

Param layout:
  {
    "embed_tokens": [V, D],
    "layers": {
        "input_layernorm":          [L, D],
        "post_attention_layernorm": [L, D],
        "attn": {"q_proj": {"w": [L, D, H·Dh], "b": [L, H·Dh]}, ...},
        "moe":  {"gate": [L, D, E], "dynamic": {...[L, Er, ...]},
                  "fixed": {...[L, nF, ...]}},
    },
    "norm": [D],
    "lm_head": [D, V],
    "codec_embed": [C, Vc, D],
    "codec_head": [D, C·Vc],
  }
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import TextMoEConfig, UniMoEAudioConfig
from ..moe.block import dcmoe_block, init_dcmoe_params
from .layers import (
    KVCache,
    attention,
    compute_mrope,
    init_attention_params,
    quantize_kv,
    rms_norm,
)


class TextModelOutput(NamedTuple):
    last_hidden_state: jnp.ndarray            # [B, T, D]
    kv_cache: Optional[KVCache]
    aux_loss: jnp.ndarray                     # [L] per-layer aux losses
    router_top_k: Optional[jnp.ndarray]       # [L, S]
    router_logits: Optional[jnp.ndarray]      # [L, S, E] (only when requested)
    expert_mask: Optional[jnp.ndarray]        # [L, S, E] (only when requested)
    moe_inputs: Optional[jnp.ndarray] = None  # [L, B, T, D] (calibration capture)


def text_model_forward(
    params: Dict,
    inputs_embeds: jnp.ndarray,          # [B, T, D]
    position_ids: jnp.ndarray,           # [3, B, T]
    cfg: TextMoEConfig,
    *,
    kv_cache: Optional[KVCache] = None,
    cache_position: Optional[jnp.ndarray] = None,
    kv_valid_mask: Optional[jnp.ndarray] = None,
    padding_token_mask: Optional[jnp.ndarray] = None,
    aux_balance_weight: Optional[jnp.ndarray] = None,
    training: bool = False,
    rng: Optional[jax.Array] = None,
    dispatch_mode: str = "dense",
    capacity: Optional[int] = None,
    output_router_stats: bool = False,
    output_moe_inputs: bool = False,
    remat: bool = False,
    use_flash: Optional[bool] = None,
    hidden_sharding=None,
    decode_emit: Optional[bool] = None,  # None = auto (cache and T == 1)
    prefix_kv: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,  # [L, n, KV, Dh] each
    ring: Optional[Tuple] = None,        # (Mesh, axis): sequence-parallel attention
) -> TextModelOutput:
    """36-layer decoder stack as one lax.scan over stacked layer params.

    Port of Qwen2_5_VLMoETextModel.forward
    (reference: utils/UniMoE_Audio_model.py:319-457): per layer pre-norm
    attention + pre-norm DCMoE FFN with residuals; final RMSNorm.
    """
    B, T, Dm = inputs_embeds.shape
    cos, sin = compute_mrope(position_ids, cfg.head_dim, cfg.rope_theta, cfg.mrope_section)
    if hidden_sharding is not None:
        # Anchor the embedding output: the codec-embedding gather's VJP is
        # a scatter-add whose sharding otherwise disagrees with the
        # batch-sharded forward gather (involuntary full remat).
        inputs_embeds = jax.lax.with_sharding_constraint(
            inputs_embeds, hidden_sharding)
        # Pin the rope tables to the hidden constraint's batch axes (D
        # replicated): as scan-hoisted loop invariants their sharding is
        # otherwise inferred separately for forward and transpose uses,
        # which costs GSPMD an involuntary full rematerialization per use.
        from jax.sharding import NamedSharding, PartitionSpec

        batch_axis = hidden_sharding.spec[0]
        cs = NamedSharding(hidden_sharding.mesh,
                           PartitionSpec(batch_axis, None, None))
        cos = jax.lax.with_sharding_constraint(cos, cs)
        sin = jax.lax.with_sharding_constraint(sin, cs)

    # Derive the depth from the actual layer stack — callers may pass a
    # sliced stack (speculative draft prefix, pipeline stages).
    L = params["layers"]["input_layernorm"].shape[0]
    layer_rngs = (
        jax.random.split(rng, L) if rng is not None else jnp.zeros((L, 2), dtype=jnp.uint32)
    )
    use_cache = kv_cache is not None

    # Per-layer sliding-window flags (reference layer_types mapping,
    # utils/UniMoE_Audio_model.py:370-383); flash doesn't window, so it is
    # disabled for models that use sliding layers.
    if cfg.has_sliding_layers:
        sliding_flags = jnp.asarray(
            [t == "sliding_attention" for t in cfg.layer_types], dtype=bool
        )[:L]
        use_flash = False
    else:
        sliding_flags = jnp.zeros((L,), dtype=bool)

    # Decode fast path: with a cache and a single query position, the scan
    # must not thread the full cache through ys (that stacks a complete
    # cache copy every step — ~650 MB/step of dead HBM write at flagship
    # shapes).  Each layer instead attends over the stale cache plus an
    # explicit self-term and emits only its fresh [B, 1, KV, Dh] k/v; one
    # batched dynamic_update_slice below commits all layers at once.
    if decode_emit is None:
        decode_emit = True
    decode_emit = bool(
        decode_emit and use_cache and T == 1 and cache_position is not None
        and kv_valid_mask is not None
    )
    if decode_emit:
        emit_valid = kv_valid_mask * (
            jnp.arange(kv_cache.k.shape[1])[None, :] != cache_position
        ).astype(kv_valid_mask.dtype)

    quantized_cache = use_cache and kv_cache.quantized

    def layer_fn(h, xs):
        lp, layer_rng, is_sliding, cache_k, cache_v, cache_ks, cache_vs, pre_k, pre_v = xs
        if hidden_sharding is not None:
            # Anchor the block INPUT as well as the output (below): the
            # constraint transposes onto the cotangent, keeping forward
            # and backward hidden/residual shardings identical so GSPMD
            # never bridges them with a full rematerialization.
            h = jax.lax.with_sharding_constraint(h, hidden_sharding)
        residual = h
        hn = rms_norm(h, lp["input_layernorm"], cfg.rms_norm_eps)
        attn_out, new_cache = attention(
            lp["attn"], hn, cos, sin, cfg,
            cache_kv=(cache_k, cache_v) if use_cache else None,
            cache_scales=(cache_ks, cache_vs) if quantized_cache else None,
            cache_position=cache_position,
            kv_valid_mask=emit_valid if decode_emit else kv_valid_mask,
            use_flash=use_flash,
            is_sliding=is_sliding if cfg.has_sliding_layers else None,
            decode_emit=decode_emit,
            prefix_kv=(pre_k, pre_v) if prefix_kv is not None else None,
            ring=ring,
        )
        if hidden_sharding is not None:
            attn_out = jax.lax.with_sharding_constraint(attn_out, hidden_sharding)
        h = residual + attn_out
        residual = h
        hn = rms_norm(h, lp["post_attention_layernorm"], cfg.rms_norm_eps)
        moe_out = dcmoe_block(
            lp["moe"], hn, cfg,
            padding_token_mask=padding_token_mask,
            aux_balance_weight=aux_balance_weight,
            training=training,
            rng=layer_rng if training else None,
            dispatch_mode=dispatch_mode,
            capacity=capacity,
        )
        h = residual + moe_out.hidden_states
        if hidden_sharding is not None:
            # Activation sequence sharding (Megatron-SP style, beyond the
            # reference): constrain [B, T, D] between blocks so elementwise
            # regions shard over the given axes; GSPMD inserts the
            # gather/scatter collectives around attention.
            h = jax.lax.with_sharding_constraint(h, hidden_sharding)
        ys = {
            "aux_loss": moe_out.aux_loss,
            "top_k": moe_out.router_top_k,
        }
        if output_router_stats:
            ys["router_logits"] = moe_out.router_logits
            ys["expert_mask"] = moe_out.expert_mask
        if output_moe_inputs:
            # The DCMoE block input (post-attention-layernorm output) —
            # the calibration statistic for GPTQ expert quantization
            # (ops/gptq.py); fp32 so the Hessian accumulates accurately.
            ys["moe_input"] = hn.astype(jnp.float32)
        if use_cache:
            if decode_emit:
                ys["new_k"], ys["new_v"] = new_cache
            elif quantized_cache:
                (ys["cache_k"], ys["cache_v"],
                 ys["cache_ks"], ys["cache_vs"]) = new_cache
            else:
                ys["cache_k"], ys["cache_v"] = new_cache
        return h, ys

    if remat:
        layer_fn = jax.checkpoint(layer_fn)

    xs = (
        params["layers"],
        layer_rngs,
        sliding_flags,
        kv_cache.k if use_cache else jnp.zeros((L, 0)),
        kv_cache.v if use_cache else jnp.zeros((L, 0)),
        kv_cache.k_scale if quantized_cache else jnp.zeros((L, 0)),
        kv_cache.v_scale if quantized_cache else jnp.zeros((L, 0)),
        prefix_kv[0] if prefix_kv is not None else jnp.zeros((L, 0)),
        prefix_kv[1] if prefix_kv is not None else jnp.zeros((L, 0)),
    )
    h, ys = jax.lax.scan(layer_fn, inputs_embeds, xs)
    h = rms_norm(h, params["norm"], cfg.rms_norm_eps)

    if use_cache and decode_emit:
        zero = jnp.int32(0)
        # ys["new_k"]: [L, B, 1, KV, Dh] → time-major [L, 1, B, KV, Dh].
        start = (zero, cache_position.astype(jnp.int32), zero, zero, zero)
        if quantized_cache:
            qk, sk = quantize_kv(ys["new_k"])   # [L, B, 1, KV(, Dh)]
            qv, sv = quantize_kv(ys["new_v"])
            new_cache = KVCache(
                k=jax.lax.dynamic_update_slice(
                    kv_cache.k, jnp.swapaxes(qk, 1, 2), start),
                v=jax.lax.dynamic_update_slice(
                    kv_cache.v, jnp.swapaxes(qv, 1, 2), start),
                k_scale=jax.lax.dynamic_update_slice(
                    kv_cache.k_scale, jnp.swapaxes(sk, 1, 2), start[:-1]),
                v_scale=jax.lax.dynamic_update_slice(
                    kv_cache.v_scale, jnp.swapaxes(sv, 1, 2), start[:-1]),
            )
        else:
            new_cache = KVCache(
                k=jax.lax.dynamic_update_slice(
                    kv_cache.k,
                    jnp.swapaxes(ys["new_k"], 1, 2).astype(kv_cache.k.dtype), start),
                v=jax.lax.dynamic_update_slice(
                    kv_cache.v,
                    jnp.swapaxes(ys["new_v"], 1, 2).astype(kv_cache.v.dtype), start),
            )
    elif use_cache and quantized_cache:
        new_cache = KVCache(k=ys["cache_k"], v=ys["cache_v"],
                            k_scale=ys["cache_ks"], v_scale=ys["cache_vs"])
    elif use_cache:
        new_cache = KVCache(k=ys["cache_k"], v=ys["cache_v"])
    else:
        new_cache = None
    return TextModelOutput(
        last_hidden_state=h,
        kv_cache=new_cache,
        aux_loss=ys["aux_loss"],
        router_top_k=ys["top_k"],
        router_logits=ys.get("router_logits"),
        expert_mask=ys.get("expert_mask"),
        moe_inputs=ys.get("moe_input"),
    )


def codec_embedding(params: Dict, codec_input_ids: jnp.ndarray) -> jnp.ndarray:
    """Sum of per-channel codec embeddings (reference:
    utils/UniMoE_Audio_model.py:655-661).  codec_input_ids: [..., C]."""
    tables = params["codec_embed"]  # [C, Vc, D]
    C = tables.shape[0]
    toks = jnp.moveaxis(codec_input_ids, -1, 0)  # [C, ...]
    embs = jax.vmap(lambda tbl, t: tbl[t])(tables, toks)  # [C, ..., D]
    return jnp.sum(embs, axis=0)


def calculate_input_embedding(
    params: Dict,
    input_ids: jnp.ndarray,                       # [B, T]
    codec_input_ids: Optional[jnp.ndarray],       # [B, T, C] aligned, or None
    placeholder_id: int,
) -> jnp.ndarray:
    """Text embeddings with codec embeddings scattered at placeholder slots.

    Port of calculate_input_embedding (reference:
    utils/UniMoE_Audio_model.py:663-670).  Unlike the reference's ordered
    masked_scatter over a flat [N, C] codec tensor, the codec ids here are
    ALIGNED [B, T, C] (pad positions arbitrary); hosts lay them out with
    `align_codec_ids` below.
    """
    emb = params["embed_tokens"][input_ids]
    if codec_input_ids is not None:
        cemb = codec_embedding(params, codec_input_ids).astype(emb.dtype)
        mask = (input_ids == placeholder_id)[..., None]
        emb = jnp.where(mask, cemb, emb)
    return emb


def align_codec_ids(input_ids, flat_codec_ids, placeholder_id):
    """Host-side helper: expand the reference's flat [N, C] codec tensor into
    an aligned [B, T, C] tensor (row j of the flat tensor goes to the j-th
    placeholder position in reading order, matching masked_scatter)."""
    import numpy as np

    input_ids = np.asarray(input_ids)
    flat = np.asarray(flat_codec_ids)
    B, T = input_ids.shape
    C = flat.shape[-1]
    out = np.zeros((B, T, C), dtype=flat.dtype)
    pos = np.argwhere(input_ids == placeholder_id)
    assert len(pos) == flat.shape[0], (
        f"placeholder count {len(pos)} != codec rows {flat.shape[0]}"
    )
    for j, (b, t) in enumerate(pos):
        out[b, t] = flat[j]
    return out


def get_rope_index(
    input_ids: "np.ndarray",
    cfg: UniMoEAudioConfig,
    *,
    image_grid_thw: "np.ndarray" = None,
    video_grid_thw: "np.ndarray" = None,
    second_per_grid_ts=None,
    attention_mask: "np.ndarray" = None,
):
    """mRoPE position ids for text+vision sequences — host-side numpy.

    Port of get_rope_index (reference: utils/UniMoE_Audio_model.py:513-638):
    text tokens advance all 3 axes together; each vision span advances
    (t, h, w) over its grid, with video time scaled by
    second_per_grid_t · tokens_per_second.  Returns
    (position_ids [3, B, T], rope_deltas [B, 1]).
    """
    import numpy as np

    input_ids = np.asarray(input_ids)
    B, T = input_ids.shape
    if image_grid_thw is None and video_grid_thw is None:
        if attention_mask is not None:
            mask = np.asarray(attention_mask)
            pos = np.cumsum(mask, axis=-1) - 1
            pos = np.where(mask == 0, 1, pos)
            position_ids = np.broadcast_to(pos[None], (3, B, T)).copy()
            deltas = (position_ids.max(axis=0).max(axis=-1, keepdims=True) + 1 - T)
            return position_ids, deltas
        pos = np.broadcast_to(np.arange(T)[None], (B, T))
        return np.broadcast_to(pos[None], (3, B, T)).copy(), np.zeros((B, 1), np.int64)

    sms = cfg.vision_config.spatial_merge_size
    tps = cfg.vision_config.tokens_per_second
    if attention_mask is None:
        attention_mask = np.ones_like(input_ids)
    attention_mask = np.asarray(attention_mask)
    position_ids = np.ones((3, B, T), dtype=np.int64)
    deltas = []
    img_i = vid_i = 0
    for b in range(B):
        ids = input_ids[b][attention_mask[b] == 1]
        toks = ids.tolist()
        vis_starts = np.where(ids == cfg.vision_start_token_id)[0]
        vis_starts = vis_starts[vis_starts + 1 < len(ids)]  # drop dangling span
        vis_kinds = ids[vis_starts + 1] if len(vis_starts) else np.array([])
        n_images = int((vis_kinds == cfg.image_token_id).sum())
        n_videos = int((vis_kinds == cfg.video_token_id).sum())
        parts = []
        st = 0
        remain_i, remain_v = n_images, n_videos
        for _ in range(n_images + n_videos):
            ed_img = toks.index(cfg.image_token_id, st) if (
                cfg.image_token_id in toks[st:] and remain_i > 0) else len(toks) + 1
            ed_vid = toks.index(cfg.video_token_id, st) if (
                cfg.video_token_id in toks[st:] and remain_v > 0) else len(toks) + 1
            if ed_img < ed_vid:
                t, h, w = np.asarray(image_grid_thw)[img_i]
                spgt = 0
                img_i += 1
                remain_i -= 1
                ed = ed_img
            else:
                t, h, w = np.asarray(video_grid_thw)[vid_i]
                if second_per_grid_ts is not None:
                    spgt = second_per_grid_ts[vid_i]
                else:
                    spgt = 1.0
                vid_i += 1
                remain_v -= 1
                ed = ed_vid
            gt, gh, gw = int(t), int(h) // sms, int(w) // sms
            text_len = ed - st
            st_idx = parts[-1].max() + 1 if parts else 0
            parts.append(np.broadcast_to(np.arange(text_len)[None], (3, text_len)) + st_idx)
            t_idx = (np.arange(gt)[:, None] * spgt * tps).astype(np.int64)
            t_idx = np.broadcast_to(t_idx, (gt, gh * gw)).reshape(-1)
            h_idx = np.broadcast_to(np.arange(gh)[None, :, None], (gt, gh, gw)).reshape(-1)
            w_idx = np.broadcast_to(np.arange(gw)[None, None, :], (gt, gh, gw)).reshape(-1)
            parts.append(np.stack([t_idx, h_idx, w_idx]) + text_len + st_idx)
            st = ed + gt * gh * gw
        if st < len(toks):
            st_idx = parts[-1].max() + 1 if parts else 0
            text_len = len(toks) - st
            parts.append(np.broadcast_to(np.arange(text_len)[None], (3, text_len)) + st_idx)
        llm_pos = np.concatenate(parts, axis=1)
        position_ids[:, b, attention_mask[b] == 1] = llm_pos
        deltas.append(llm_pos.max() + 1 - len(input_ids[b]))
    return position_ids, np.asarray(deltas)[:, None]


def codec_logits_from_hidden(params: Dict, hidden: jnp.ndarray, cfg: UniMoEAudioConfig) -> jnp.ndarray:
    """[B, T, D] → [B, T, C, Vc] codec logits (fp32), reference:
    utils/UniMoE_Audio_model.py:818-819."""
    from ..ops.quant import matmul as qmm

    flat = qmm(hidden, params["codec_head"]).astype(jnp.float32)
    B, T = hidden.shape[:2]
    return flat.reshape(B, T, cfg.codec_channels, cfg.codec_embed_size)


class ModelOutput(NamedTuple):
    loss: Optional[jnp.ndarray]
    codec_loss: Optional[jnp.ndarray]
    aux_loss: jnp.ndarray
    logits: Optional[jnp.ndarray]
    codec_logits: jnp.ndarray
    kv_cache: Optional[KVCache]
    router_top_k: Optional[jnp.ndarray]


def model_forward(
    params: Dict,
    cfg: UniMoEAudioConfig,
    input_ids: jnp.ndarray,
    *,
    codec_input_ids: Optional[jnp.ndarray] = None,   # [B, T, C] aligned
    attention_mask: Optional[jnp.ndarray] = None,    # [B, T]
    position_ids: Optional[jnp.ndarray] = None,      # [3, B, T]
    inputs_embeds: Optional[jnp.ndarray] = None,
    codec_labels: Optional[jnp.ndarray] = None,      # [B, T, C], -100 = ignore
    labels: Optional[jnp.ndarray] = None,            # [B, T] text labels, -100 = ignore
    aux_balance_weight: Optional[jnp.ndarray] = None,
    aux_loss_weight: float = 0.0,
    pixel_values: Optional[jnp.ndarray] = None,       # [S_patches, patch_dim]
    image_grid_thw=None,                              # host numpy [n, 3]
    pixel_values_videos: Optional[jnp.ndarray] = None,
    video_grid_thw=None,
    training: bool = False,
    rng: Optional[jax.Array] = None,
    dispatch_mode: str = "dense",
    capacity: Optional[int] = None,
    compute_lm_logits: bool = False,
    remat: bool = False,
    prefix_kv: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,  # [L, n, KV, Dh]
    ring: Optional[Tuple] = None,        # (Mesh, axis): ring-attention SP
    hidden_sharding=None,                # per-block [B, T, D] constraint
) -> ModelOutput:
    """Full-model forward (no cache — training / eval path).

    Port of UniAudioRVQQwen2_5VLMoEForConditionalGeneration.forward
    (reference: utils/UniMoE_Audio_model.py:672-871): input embedding with
    codec scatter, decoder stack, lm + codec heads, per-channel shifted CE
    over codec labels + weighted mean aux loss.
    """
    tc = cfg.text_config
    B, T = input_ids.shape
    if attention_mask is None:
        attention_mask = jnp.ones((B, T), dtype=jnp.int32)
    if inputs_embeds is None:
        inputs_embeds = calculate_input_embedding(
            params, input_ids, codec_input_ids, cfg.codec_placeholder_value
        )
    # Vision feature fusion for the training/eval path (reference:
    # utils/UniMoE_Audio_model.py:708-751 masked_scatter of image/video
    # embeds at their token slots).  grid_thw tensors are host-side.
    for pv, grid, tok_id in (
        (pixel_values, image_grid_thw, cfg.image_token_id),
        (pixel_values_videos, video_grid_thw, cfg.video_token_id),
    ):
        if pv is not None:
            from .vision import vision_forward

            feats = vision_forward(params["vision"], pv, grid, cfg.vision_config)
            vmask = input_ids == tok_id
            # Order-preserving scatter: the j-th vision token row takes
            # feats[j] (flattened batch reading order).
            slot_order = jnp.cumsum(vmask.reshape(-1)) - 1
            gathered = feats[jnp.clip(slot_order, 0, feats.shape[0] - 1)]
            gathered = gathered.reshape(B, T, -1).astype(inputs_embeds.dtype)
            inputs_embeds = jnp.where(vmask[..., None], gathered, inputs_embeds)
    if position_ids is None:
        pos = jnp.cumsum(attention_mask, axis=-1) - 1
        pos = jnp.where(attention_mask == 0, 1, pos)
        position_ids = jnp.broadcast_to(pos[None], (3, B, T))
    if prefix_kv is not None:
        # Learned prefix KV occupy past positions [0, n) (HF PEFT
        # past_key_values semantics): real tokens shift by n — applied to
        # EXPLICIT (mRoPE/vision) position ids too, so training matches
        # the generation path's geometry (generate_jit shifts both).
        position_ids = position_ids + prefix_kv[0].shape[1]

    abw = None
    if aux_balance_weight is not None:
        abw = attention_mask * aux_balance_weight

    out = text_model_forward(
        params, inputs_embeds, position_ids, tc,
        kv_valid_mask=attention_mask,
        padding_token_mask=attention_mask,
        aux_balance_weight=abw,
        training=training,
        rng=rng,
        dispatch_mode=dispatch_mode,
        capacity=capacity,
        remat=remat,
        prefix_kv=prefix_kv,
        ring=ring,
        hidden_sharding=hidden_sharding,
    )
    hidden = out.last_hidden_state

    logits = None
    if compute_lm_logits or labels is not None:
        from ..ops.quant import matmul as qmm

        logits = qmm(hidden, params["lm_head"]).astype(jnp.float32)
    codec_logits = codec_logits_from_hidden(params, hidden, cfg)

    loss = None
    codec_loss = None
    mean_aux = jnp.mean(out.aux_loss)
    if labels is not None:
        # Next-token CE on text labels (the V2 training twin's objective,
        # reference: UniMoEV2-Preview/training/Models/UniMoEV2.py:1151-1163).
        shift_logits = logits[:, :-1]
        shift_labels = labels[:, 1:]
        valid = shift_labels != -100
        safe = jnp.where(valid, shift_labels, 0)
        logp = jax.nn.log_softmax(shift_logits, axis=-1)
        nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
        lm_loss = jnp.sum(jnp.where(valid, nll, 0.0)) / jnp.maximum(jnp.sum(valid), 1)
        loss = lm_loss + aux_loss_weight * mean_aux
    if codec_labels is not None:
        # Per-channel shifted CE; empty channels (all -100) contribute 0
        # (reference skips them, utils/UniMoE_Audio_model.py:830-845 —
        # mathematically identical to a 0 contribution).
        shift_logits = codec_logits[:, :-1]                    # [B, T-1, C, Vc]
        shift_labels = codec_labels[:, 1:]                     # [B, T-1, C]
        valid = shift_labels != -100
        safe_labels = jnp.where(valid, shift_labels, 0)
        logp = jax.nn.log_softmax(shift_logits, axis=-1)
        nll = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
        nll = jnp.where(valid, nll, 0.0)
        per_channel = jnp.sum(nll, axis=(0, 1)) / jnp.maximum(jnp.sum(valid, axis=(0, 1)), 1)
        codec_loss = jnp.sum(per_channel)
        loss = (loss if loss is not None else aux_loss_weight * mean_aux) + codec_loss

    return ModelOutput(
        loss=loss,
        codec_loss=codec_loss,
        aux_loss=mean_aux,
        logits=logits,
        codec_logits=codec_logits,
        kv_cache=None,
        router_top_k=out.router_top_k,
    )


# ---------------------------------------------------------------------------
# Parameter init
# ---------------------------------------------------------------------------

def init_model_params(rng: jax.Array, cfg: UniMoEAudioConfig, dtype=jnp.bfloat16,
                      with_vision: bool = False) -> Dict:
    """Random-init the full param pytree (layer-stacked).  The vision tower
    is included when with_vision and cfg.vision_config is set."""
    tc = cfg.text_config
    L, Dm, V = tc.num_hidden_layers, tc.hidden_size, tc.vocab_size
    C, Vc = cfg.codec_channels, cfg.codec_embed_size
    std = tc.initializer_range
    keys = jax.random.split(rng, 8)

    def stack_init(key, fn):
        return jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[fn(k) for k in jax.random.split(key, L)],
        )

    layers = {
        "input_layernorm": jnp.ones((L, Dm), dtype=dtype),
        "post_attention_layernorm": jnp.ones((L, Dm), dtype=dtype),
        "attn": stack_init(keys[0], lambda k: init_attention_params(k, tc, dtype)),
        "moe": stack_init(keys[1], lambda k: init_dcmoe_params(k, tc, dtype)),
    }
    params = {
        "embed_tokens": (jax.random.normal(keys[2], (V, Dm)) * std).astype(dtype),
        "layers": layers,
        "norm": jnp.ones((Dm,), dtype=dtype),
        "lm_head": (jax.random.normal(keys[3], (Dm, V)) * Dm ** -0.5).astype(dtype),
        "codec_embed": (jax.random.normal(keys[4], (C, Vc, Dm)) * std).astype(dtype),
        "codec_head": (jax.random.normal(keys[5], (Dm, C * Vc)) * Dm ** -0.5).astype(dtype),
    }
    if with_vision and cfg.vision_config is not None:
        from .vision import init_vision_params

        params["vision"] = init_vision_params(keys[6], cfg.vision_config, dtype)
    return params
