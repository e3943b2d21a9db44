"""Autoregressive codec-frame generation: one jit, `lax.while_loop` decode.

TPU-native re-architecture of the reference's Python-driven decode loop
(reference: utils/UniMoE_Audio_model.py:918-1231).  The reference runs ~50
Python iterations/sec of audio, each dispatching a full 36-layer forward —
dominated by host overhead.  Here prefill + the entire decode loop compile
into ONE XLA program with a preallocated KV cache, the delay-pattern EOS
countdown as loop-carry state, and CFG pairs batched as interleaved rows
[neg, cond] × B (reference: repeat_interleave(2),
utils/UniMoE_Audio_model.py:945).
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import UniMoEAudioConfig
from ..models.layers import KVCache
from ..models.model import (
    calculate_input_embedding,
    codec_embedding,
    codec_logits_from_hidden,
    text_model_forward,
)
from .sampler import sample_next_token

NEG_INF = jnp.float32(-jnp.inf)


class GenerateResult(NamedTuple):
    codes: jnp.ndarray      # [B, max_tokens, C] delayed-domain codes per sample,
                            # sliced to start at each sample's prefill step
    lengths: jnp.ndarray    # [B] audio frame counts (pre-delay-revert)
    steps: jnp.ndarray      # scalar: decode steps actually executed
    guidance_loss: jnp.ndarray  # mean teacher-forced CE ("golden loss",
                                # utils/UniMoE_Audio_model.py:1031-1048);
                                # 0 when no guidance labels were given


class _LoopState(NamedTuple):
    dec_step: jnp.ndarray
    buf: jnp.ndarray
    cache: KVCache
    eos_detected: jnp.ndarray
    eos_countdown: jnp.ndarray
    finished_step: jnp.ndarray
    rng: jax.Array
    guidance_loss: jnp.ndarray
    guidance_count: jnp.ndarray


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "max_tokens", "cfg_filter_top_k", "do_sample", "dispatch_mode",
        "debug_guidance_step", "return_state", "cache_len",
        "decode_dispatch_mode", "decode_capacity", "prefill_capacity",
        "decode_emit", "kv_dtype",
    ),
)
def generate_jit(
    params: Dict,
    cfg: UniMoEAudioConfig,
    input_ids: jnp.ndarray,          # [2B, T_text] CFG-interleaved [neg, cond]
    attention_mask: jnp.ndarray,     # [2B, T_text]
    codec_input_ids: Optional[jnp.ndarray],  # [2B, T_text, C] aligned, or None
    prefill_buf: jnp.ndarray,        # [B, buf_len, C] delayed prefill, -1 = open
    prefill_steps: jnp.ndarray,      # [B]
    rng: jax.Array,
    visual_embeds: Optional[jnp.ndarray] = None,   # [2B, T_text, D]
    visual_mask: Optional[jnp.ndarray] = None,     # [2B, T_text] 1 = vision slot
    prefill_position_ids: Optional[jnp.ndarray] = None,  # [3, 2B, T_text] mRoPE
    guidance_labels: Optional[jnp.ndarray] = None,  # [B, buf_len, C] delayed labels
    resume_state: Optional[_LoopState] = None,  # continue a chunked decode
    stop_at: Optional[jnp.ndarray] = None,      # pause the loop at this step
    *,
    # Continuous batching (apps/continuous.py) hooks — both default to the
    # single-batch semantics:
    # decode_start[B]: first VALID decode cache slot per sample.  A row
    # admitted into a running batch at global frame a has cache slots
    # [T_text, T_text+a) unwritten; keys below its decode_start are masked.
    decode_start: Optional[jnp.ndarray] = None,
    # start_step overrides min(prefill_steps) - 1 as the global decode
    # origin.  A rolling batch replaces retired rows with new requests
    # whose prefill_steps differ; the origin must stay pinned so existing
    # rows' cache positions (n_pre + T_text + rel) remain continuous.
    start_step: Optional[jnp.ndarray] = None,
    # seed_step_offset[B]: subtracted from the step before the per-request
    # sample_seeds fold — an admitted row's sampling chain stays identical
    # to the same request decoded standalone (its steps are row-relative,
    # not global).
    seed_step_offset: Optional[jnp.ndarray] = None,
    rope_deltas: Optional[jnp.ndarray] = None,  # [2B] or [2B, 1] mRoPE deltas
    cache_len: Optional[int] = None,  # static KV buffer length override
    return_state: bool = False,
    debug_guidance_step: int = 0,
    max_tokens: int,
    min_tokens: jnp.ndarray,         # scalar or [B] int32
    cfg_scale: jnp.ndarray,          # scalar or [B] f32
    temperature: jnp.ndarray,        # scalar or [B] f32
    top_p: jnp.ndarray,              # scalar or [B] f32
    cfg_filter_top_k: int,
    eos_prob_mul_factor: jnp.ndarray,  # scalar or [B] f32
    max_tokens_vec: Optional[jnp.ndarray] = None,  # [B] per-sample budget
    # Per-sample sampling seeds [B]: each stream draws from its own
    # fold_in(PRNGKey(seed), step, channel) chain, so a request's sampled
    # output is reproducible regardless of which other requests share the
    # batch (dense dispatch; packed capacity drops can still couple rows).
    sample_seeds: Optional[jnp.ndarray] = None,
    do_sample: bool = True,
    dispatch_mode: str = "dense",
    decode_dispatch_mode: Optional[str] = None,  # None = dispatch_mode
    decode_capacity: Optional[int] = None,       # static, for 'packed' decode
    prefill_capacity: Optional[int] = None,      # static, for 'packed' prefill
    prefix_kv: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,  # [L, n, KV, Dh]
    # None = the emit-only KV fast path (production default).  False = the
    # general cache-attention arithmetic — bit-identical to multi-frame
    # chunk forwards, which is what speculative decoding verifies against
    # (the two paths agree mathematically but round bf16 differently).
    decode_emit: Optional[bool] = None,
    # "int8": store the KV cache int8 with per-(position, head) scales
    # (models/layers.KVCache) — halves the per-step KV stream, which at
    # long generations (max_tokens≈1000, the 20 s case) rivals the int8
    # weight stream.  Default keeps the activation dtype (bf16).
    kv_dtype: Optional[str] = None,
) -> GenerateResult:
    tc = cfg.text_config
    B2, T_text = input_ids.shape
    B = B2 // 2
    C = cfg.codec_channels
    Vc = cfg.codec_embed_size
    eos, pad = cfg.codec_eos_value, cfg.codec_pad_value
    delay = jnp.asarray(cfg.codec_delay_pattern, dtype=jnp.int32)
    max_delay = cfg.max_delay
    # Prefix tuning (train/peft.py): learned per-layer KV occupy cache
    # slots [0, n_pre); everything else shifts right by n_pre.
    n_pre = 0 if prefix_kv is None else prefix_kv[0].shape[1]
    # Each decode step streams the whole KV buffer (static shapes), so the
    # buffer should be right-sized: generate_chunked grows it in chunks via
    # cache_len instead of preallocating for max_tokens up front.
    T_total = cache_len if cache_len is not None else n_pre + T_text + max_tokens + 2
    if resume_state is not None:
        assert resume_state.cache.k.shape[1] == T_total, (
            "resume cache length must match cache_len; pad it before resuming"
        )
    buf_len = prefill_buf.shape[1]

    # Heterogeneous batches (mixed TTS/T2M/VT2M serving): every sampling
    # knob broadcasts from a scalar to per-sample [B] so requests with
    # different CFG scales / temperatures / length budgets share one batch.
    def per_sample(x, dtype):
        return jnp.broadcast_to(jnp.asarray(x, dtype).reshape(-1), (B,))

    min_tokens = per_sample(min_tokens, jnp.int32)
    cfg_scale = per_sample(cfg_scale, jnp.float32)
    temperature = per_sample(temperature, jnp.float32)
    top_p = per_sample(top_p, jnp.float32)
    eos_prob_mul_factor = per_sample(eos_prob_mul_factor, jnp.float32)
    mt_vec = (
        per_sample(max_tokens_vec, jnp.int32) if max_tokens_vec is not None
        else jnp.full((B,), max_tokens, jnp.int32)
    )
    seed_keys = (
        jax.vmap(jax.random.PRNGKey)(per_sample(sample_seeds, jnp.int32))
        if sample_seeds is not None else None
    )  # [B, 2]

    # ---------------- prefill (skipped when resuming a chunked decode) ----
    if resume_state is None:
        inputs_embeds = calculate_input_embedding(
            params, input_ids, codec_input_ids, cfg.codec_placeholder_value
        )
        if visual_embeds is not None:
            # Vision features scatter into their placeholder slots (reference:
            # utils/UniMoE_Audio_model.py:730-751 masked_scatter).
            inputs_embeds = jnp.where(
                visual_mask[..., None] > 0, visual_embeds.astype(inputs_embeds.dtype),
                inputs_embeds,
            )
        if prefill_position_ids is not None:
            position_ids = prefill_position_ids
        else:
            pos = jnp.cumsum(attention_mask, axis=-1) - 1
            pos = jnp.where(attention_mask == 0, 1, pos)
            position_ids = jnp.broadcast_to(pos[None], (3, B2, T_text))

        cache = KVCache.create(
            tc.num_hidden_layers, B2, T_total, tc.num_key_value_heads, tc.head_dim,
            dtype=jnp.int8 if kv_dtype == "int8" else inputs_embeds.dtype,
        )
        if n_pre:
            # Learned prefix KV into cache slots [0, n_pre) — the
            # preallocated-cache twin of HF PEFT's past_key_values
            # injection (post-RoPE, positionless); text shifts right.
            pk, pv = prefix_kv  # [L, n, KV, Dh] → cache slice [L, n, B2, KV, Dh]
            shape = (tc.num_hidden_layers, n_pre, B2) + pk.shape[2:]
            if cache.quantized:
                from ..models.layers import quantize_kv

                qk, sk = quantize_kv(jnp.broadcast_to(pk[:, :, None], shape))
                qv, sv = quantize_kv(jnp.broadcast_to(pv[:, :, None], shape))
                cache = KVCache(
                    k=cache.k.at[:, :n_pre].set(qk),
                    v=cache.v.at[:, :n_pre].set(qv),
                    k_scale=cache.k_scale.at[:, :n_pre].set(sk),
                    v_scale=cache.v_scale.at[:, :n_pre].set(sv),
                )
            else:
                pk_t = jnp.broadcast_to(pk[:, :, None].astype(cache.k.dtype), shape)
                pv_t = jnp.broadcast_to(pv[:, :, None].astype(cache.v.dtype), shape)
                cache = KVCache(
                    k=cache.k.at[:, :n_pre].set(pk_t),
                    v=cache.v.at[:, :n_pre].set(pv_t),
                )
            position_ids = position_ids + n_pre
        kv_valid = jnp.concatenate(
            [jnp.ones((B2, n_pre), jnp.int32),
             attention_mask.astype(jnp.int32),
             jnp.zeros((B2, T_total - n_pre - T_text), jnp.int32)], axis=-1
        )
        prefill_flash = (
            T_text >= 128 and n_pre == 0
            and jax.default_backend() in ("tpu", "axon")
            and not tc.has_sliding_layers
        )
        out = text_model_forward(
            params, inputs_embeds, position_ids, tc,
            kv_cache=cache,
            cache_position=jnp.int32(n_pre),
            kv_valid_mask=kv_valid,
            padding_token_mask=attention_mask,
            dispatch_mode=dispatch_mode,
            capacity=prefill_capacity,
            # cache_position==0 prefill: the fresh window holds every
            # attendable key, so the flash path is safe here (with a
            # prefix the window misses slots [0, n_pre) — flash off).
            use_flash=True if prefill_flash else None,
        )
        cache = out.kv_cache

    step_pos_base = decode_position_base(
        jnp.sum(attention_mask, axis=-1), T_text, rope_deltas
    ) + n_pre  # [2B]; prefix slots shift every real position right
    start_step = (jnp.min(prefill_steps) - 1 if start_step is None
                  else jnp.asarray(start_step, jnp.int32))
    dstart_2B = (
        None if decode_start is None
        else jnp.repeat(jnp.asarray(decode_start, jnp.int32), 2)[:, None]
    )  # [2B, 1] CFG-interleaved
    stop_step = max_tokens if stop_at is None else jnp.minimum(stop_at, max_tokens)

    # ---------------- decode loop ----------------
    def cond_fn(s: _LoopState):
        return jnp.logical_and(
            s.dec_step < stop_step, jnp.logical_not(jnp.all(s.eos_countdown == 0))
        )

    def body_fn(s: _LoopState):
        dec_step = s.dec_step
        current_step = dec_step + 1
        rel = dec_step - start_step          # 0, 1, 2, ... frames decoded
        cache_pos = n_pre + T_text + rel

        tokens = jax.lax.dynamic_slice(
            s.buf, (0, dec_step, 0), (B, 1, C)
        )  # [B, 1, C]
        tokens_2B = jnp.repeat(tokens, 2, axis=0)  # CFG pairing
        emb = codec_embedding(params, tokens_2B)  # [2B, 1, D]

        step_pos = (step_pos_base + rel)[None, :, None]  # [1, 2B, 1]
        position_ids = jnp.broadcast_to(step_pos, (3, B2, 1))

        key_idx = jnp.arange(T_total)[None, :]
        text_valid = jnp.pad(
            attention_mask, ((0, 0), (n_pre, T_total - n_pre - T_text)),
            constant_values=1,
        )[:, :T_total]  # prefix slots (left pad) are always attendable
        decode_ok = (key_idx <= cache_pos)
        if dstart_2B is not None:
            decode_ok &= key_idx >= dstart_2B
        kv_valid = jnp.where(
            key_idx < n_pre + T_text,
            text_valid,
            decode_ok.astype(jnp.int32),
        )

        step_out = text_model_forward(
            params, emb, position_ids, tc,
            kv_cache=s.cache,
            cache_position=cache_pos,
            kv_valid_mask=kv_valid,
            dispatch_mode=decode_dispatch_mode or dispatch_mode,
            capacity=decode_capacity,
            decode_emit=decode_emit,
        )
        hidden = step_out.last_hidden_state  # [2B, 1, D]
        logits = codec_logits_from_hidden(params, hidden, cfg)[:, 0]  # [2B, C, Vc]

        # CFG combine: rows interleave [neg, cond]
        # (reference: utils/UniMoE_Audio_model.py:991-999).
        pair = logits.reshape(B, 2, C, Vc)
        uncond, cond = pair[:, 0], pair[:, 1]
        scale_b = cfg_scale[:, None, None]
        logits_B = jnp.where(scale_b != 0, cond + scale_b * (cond - uncond), cond)

        # EOS gating (reference: utils/UniMoE_Audio_model.py:1001-1017).
        enable_eos = (dec_step >= min_tokens)[:, None, None]  # [B,1,1]
        col = jnp.arange(Vc)[None, None, :]
        ch = jnp.arange(C)[None, :, None]
        kill = (col > eos) | ((ch > 0) & (col >= eos)) | (
            (~enable_eos) & (col >= eos)
        )
        logits_B = jnp.where(kill, NEG_INF, logits_B)
        eos_slot = (ch == 0) & (col == eos)
        logits_B = jnp.where(
            eos_slot, logits_B * eos_prob_mul_factor[:, None, None], logits_B
        )

        rng, sample_key = jax.random.split(s.rng)
        if seed_keys is not None:
            # Per-(stream, step, channel) keys: composition-independent.
            fold_step = (
                jnp.broadcast_to(current_step, (B,))
                if seed_step_offset is None
                else current_step - jnp.asarray(seed_step_offset, jnp.int32)
            )
            step_keys = jax.vmap(jax.random.fold_in)(seed_keys, fold_step)
            sample_key = jax.vmap(
                lambda k: jax.vmap(lambda c: jax.random.fold_in(k, c))(
                    jnp.arange(C))
            )(step_keys).reshape(B * C, 2)
        flat = logits_B.reshape(B * C, Vc)
        if do_sample:
            pred = sample_next_token(
                sample_key, flat,
                temperature=jnp.repeat(temperature, C),
                top_p=jnp.repeat(top_p, C),
                top_k=cfg_filter_top_k,
                audio_eos_value=eos,
            )
        else:
            pred = jnp.argmax(flat, axis=-1)
        pred = pred.reshape(B, C).astype(jnp.int32)

        # Teacher-forced "golden loss" + guided decoding (reference:
        # utils/UniMoE_Audio_model.py:1019-1048, 1170-1171): per-channel CE
        # of this step's logits vs labels at current_step, channel 0 3×.
        g_loss, g_count = s.guidance_loss, s.guidance_count
        if guidance_labels is not None:
            lab = jax.lax.dynamic_slice(
                guidance_labels, (0, current_step, 0), (B, 1, C)
            )[:, 0]  # [B, C]
            # Channel 0 may carry EOS as a target; other channels may not
            # (reference: utils/UniMoE_Audio_model.py:1022-1026).
            ch_ids = jnp.arange(C)[None, :]
            valid = (lab >= 0) & jnp.where(ch_ids == 0, lab <= eos, lab < eos)
            safe = jnp.clip(lab, 0, Vc - 1)
            logp = jax.nn.log_softmax(logits_B, axis=-1)
            nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
            ch_w = jnp.where(jnp.arange(C) == 0, 3.0, 1.0)[None, :]
            nll = jnp.where(valid, nll * ch_w, 0.0)
            g_loss = g_loss + jnp.sum(nll)
            g_count = g_count + jnp.sum(valid)
            if debug_guidance_step != 0:
                force = (dec_step < debug_guidance_step) | (debug_guidance_step == -1)
                pred = jnp.where(force & (lab >= 0), lab, pred)

        # --- delay-pattern EOS countdown state machine
        # (reference: utils/UniMoE_Audio_model.py:1173-1197) ---
        active = s.eos_countdown != 0
        is_eos_tok = (~s.eos_detected) & (pred[:, 0] == eos)
        is_max_len = current_step >= (mt_vec - max_delay)  # per-sample budget
        trigger = active & (is_eos_tok | is_max_len)
        eos_detected = s.eos_detected | trigger
        start_cd = trigger & (s.eos_countdown < 0)
        eos_countdown = jnp.where(start_cd, max_delay, s.eos_countdown)
        finished_step = jnp.where(start_cd, current_step, s.finished_step)

        padding_phase = eos_countdown > 0
        step_after = (max_delay - eos_countdown)[:, None]  # [B, 1]
        eos_write = padding_phase[:, None] & (step_after == delay[None, :])
        pad_write = padding_phase[:, None] & (step_after > delay[None, :])
        pred = jnp.where(eos_write, eos, jnp.where(pad_write, pad, pred))
        eos_countdown = jnp.where(padding_phase, eos_countdown - 1, eos_countdown)

        # Mask-merge into the buffer: prompt/BOS slots (>= 0) win
        # (reference DecoderOutput.update_one apply_mask,
        # utils/UniMoE_Audio_utils.py:290-298).
        cur = jax.lax.dynamic_slice(s.buf, (0, current_step, 0), (B, 1, C))[:, 0]
        merged = jnp.where(cur == -1, pred, cur)
        buf = jax.lax.dynamic_update_slice(
            s.buf, merged[:, None, :], (0, current_step, 0)
        )

        return _LoopState(
            dec_step=dec_step + 1,
            buf=buf,
            cache=step_out.kv_cache,
            eos_detected=eos_detected,
            eos_countdown=eos_countdown,
            finished_step=finished_step,
            rng=rng,
            guidance_loss=g_loss,
            guidance_count=g_count,
        )

    if resume_state is not None:
        init = resume_state
    else:
        init = _LoopState(
            dec_step=start_step,
            buf=prefill_buf,
            cache=cache,
            eos_detected=jnp.zeros((B,), dtype=bool),
            eos_countdown=jnp.full((B,), -1, dtype=jnp.int32),
            finished_step=jnp.full((B,), -1, dtype=jnp.int32),
            rng=rng,
            guidance_loss=jnp.float32(0),
            guidance_count=jnp.int32(0),
        )
    final = jax.lax.while_loop(cond_fn, body_fn, init)

    # ---------------- length accounting + repack ----------------
    # (reference: utils/UniMoE_Audio_model.py:1205-1228)
    final_step = final.dec_step + 1
    finished = jnp.where(
        final.finished_step == -1, final_step - max_delay, final.finished_step
    )
    lengths = jnp.clip(finished - prefill_steps, 0, max_tokens)

    def slice_one(buf_b, start):
        return jax.lax.dynamic_slice(buf_b, (start, 0), (max_tokens, C))

    codes = jax.vmap(slice_one)(final.buf, prefill_steps)
    # Positions beyond each sample's generated span are PAD.
    span = (lengths + max_delay)[:, None]
    idx = jnp.arange(max_tokens)[None, :]
    codes = jnp.where((idx < span)[..., None], codes, pad)
    # Any never-written sentinel (-1) also becomes PAD.
    codes = jnp.where(codes == -1, pad, codes)

    result = GenerateResult(
        codes=codes, lengths=lengths, steps=final.dec_step - start_step,
        guidance_loss=final.guidance_loss / jnp.maximum(final.guidance_count, 1),
    )
    if return_state:
        return result, final
    return result


def generate_chunked(
    params: Dict,
    cfg: UniMoEAudioConfig,
    input_ids: jnp.ndarray,
    attention_mask: jnp.ndarray,
    codec_input_ids: Optional[jnp.ndarray],
    prefill_buf: jnp.ndarray,
    prefill_steps,
    rng: jax.Array,
    visual_embeds: Optional[jnp.ndarray] = None,
    visual_mask: Optional[jnp.ndarray] = None,
    prefill_position_ids: Optional[jnp.ndarray] = None,
    guidance_labels: Optional[jnp.ndarray] = None,
    *,
    chunk_frames: int = 256,
    **kwargs,
) -> GenerateResult:
    """generate_jit with a KV buffer that GROWS across decode chunks.

    Every decode step streams the full static KV buffer, so preallocating
    for max_tokens makes early steps read mostly-dead cache (and in-step
    dynamic windows force XLA copies — see models/layers.py).  Instead the
    decode runs in `chunk_frames`-step chunks via the resumable loop state;
    each chunk's executable has a right-sized buffer, padded up between
    chunks (one O(cache) copy per chunk, amortized over chunk_frames
    steps).  Executables are keyed by the bucketed cache length, so long
    generations reuse a handful of compiles.  Semantically identical to a
    single generate_jit call.
    """

    T_text = input_ids.shape[1]
    max_tokens = kwargs.pop("max_tokens")
    return_state = kwargs.pop("return_state", False)
    steps_np = np.asarray(prefill_steps)
    start = int(steps_np.min()) - 1
    prefill_steps = jnp.asarray(steps_np, jnp.int32)

    pkv = kwargs.get("prefix_kv")
    n_pre = 0 if pkv is None else pkv[0].shape[1]

    def bucket(n_frames: int) -> int:
        return -(-(n_pre + T_text + n_frames + 2) // chunk_frames) * chunk_frames

    state = None
    res = None
    stop = start + chunk_frames
    while True:
        frames_bound = min(stop - start, max_tokens)
        cache_len = bucket(frames_bound)
        if state is not None and state.cache.k.shape[1] < cache_len:
            pad = cache_len - state.cache.k.shape[1]
            pad5 = ((0, 0), (0, pad), (0, 0), (0, 0), (0, 0))
            state = state._replace(cache=KVCache(
                k=jnp.pad(state.cache.k, pad5),
                v=jnp.pad(state.cache.v, pad5),
                k_scale=(jnp.pad(state.cache.k_scale, pad5[:-1])
                         if state.cache.quantized else None),
                v_scale=(jnp.pad(state.cache.v_scale, pad5[:-1])
                         if state.cache.quantized else None),
            ))
        res, state = generate_jit(
            params, cfg, input_ids, attention_mask, codec_input_ids,
            prefill_buf, prefill_steps, rng,
            visual_embeds, visual_mask, prefill_position_ids,
            guidance_labels, state, jnp.int32(min(stop, max_tokens)),
            max_tokens=max_tokens, cache_len=cache_len, return_state=True,
            **kwargs,
        )
        # One round trip for both loop-control reads (tunnel fetches cost
        # ~30 ms each on the axon TPU).
        dec_step, cd = jax.device_get((state.dec_step, state.eos_countdown))
        done = bool((cd == 0).all()) or int(dec_step) >= max_tokens
        if done:
            return (res, state) if return_state else res
        stop += chunk_frames


def decode_position_base(
    text_lens: jnp.ndarray,
    T_text: int,
    rope_deltas: Optional[jnp.ndarray],
) -> jnp.ndarray:
    """Per-sample mRoPE position of decode step rel=0.

    After a vision prefill the reference continues decode positions as
    cache_position + rope_deltas (reference: utils/UniMoE_Audio_model.py:769-791)
    = max(llm_pos) + 1 + rel, because vision grid positions advance less than
    their token count.  get_rope_index returns delta = max(llm_pos) + 1 - T_text,
    so the continuation base is T_text + delta.  Without deltas (text-only /
    TTS) that equals the attended text length, the round-1 formula.
    """
    if rope_deltas is None:
        return text_lens
    return jnp.int32(T_text) + rope_deltas.reshape(-1).astype(jnp.int32)


def pad_buffer(prefill: jnp.ndarray, max_tokens: int) -> jnp.ndarray:
    """Extend the delayed prefill buffer so that every sample's window
    [prefill_step, prefill_step + max_tokens) plus the write head
    (≤ max_tokens) fits without dynamic_slice clamping."""
    B, P, C = prefill.shape
    buf_len = P + max_tokens
    fill = jnp.full((B, buf_len - P, C), -1, dtype=prefill.dtype)
    return jnp.concatenate([prefill, fill], axis=1)
