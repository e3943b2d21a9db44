"""Self-speculative decoding for single-stream latency.

Single-stream AR decode is weight-streaming-bound (~6.6 GB int8/step —
one frame per full-model forward caps RTF near 2×).  Speculative decoding
amortizes the stream: a cheap DRAFT (the first `draft_layers` of the SAME
model + final norm + codec head — no extra weights, no training) proposes
`spec_len` frames autoregressively, then ONE full-model forward over the
whole chunk verifies them.  Greedy acceptance keeps the output
BIT-IDENTICAL to the baseline greedy decode computed with the same
attention arithmetic — generate_jit(decode_emit=False), tested — so
sample quality is exactly equal by construction.  (The production
emit-only decode path rounds bf16 in a different op order; outputs can
differ from either by occasional argmax tie flips — the standard
speculative-decoding caveat about backend reduction order.)  Throughput
scales with the draft agreement rate α as E[frames/cycle] = n_acc + 1.

Anchor: the reference's 50 Hz AR loop (utils/UniMoE_Audio_model.py:918-1068)
and PAPERS.md's speculative/multi-token retrieval.  Scope: B = 1 stream
(2 CFG rows), greedy (do_sample=False semantics); the sampling variant
would need the standard rejection-sampling correction.

Cache discipline: draft steps write layers [0, draft_layers) at their
positions; the verify forward overwrites ALL layers at those positions
with KV derived from the same embeddings, so accepted-prefix cache
entries are exactly the baseline's.  Rejected positions hold stale KV but
sit beyond the validity mask until the next cycle overwrites them.
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import UniMoEAudioConfig
from ..models.layers import KVCache
from ..models.model import (
    calculate_input_embedding,
    codec_embedding,
    codec_logits_from_hidden,
    text_model_forward,
)

NEG_INF = jnp.float32(-jnp.inf)


class SpecResult(NamedTuple):
    codes: jnp.ndarray       # [1, max_tokens, C] delayed-domain codes
    lengths: jnp.ndarray     # [1]
    frames: jnp.ndarray      # scalar: frames decoded
    cycles: jnp.ndarray      # scalar: verify cycles executed
    accept_rate: jnp.ndarray # mean accepted drafts per cycle / (spec_len-1)


def _greedy_frame(cfg, logits_2C, dec_step, min_tokens, cfg_scale,
                  eos_prob_mul_factor):
    """CFG combine + EOS gating + greedy argmax for ONE frame position.
    logits_2C: [2, C, Vc] (CFG pair).  Port of the per-step logic in
    generate/loop.py (reference: utils/UniMoE_Audio_model.py:991-1017)."""
    C, Vc = cfg.codec_channels, cfg.codec_embed_size
    eos = cfg.codec_eos_value
    uncond, cond = logits_2C[0], logits_2C[1]
    lb = jnp.where(cfg_scale != 0, cond + cfg_scale * (cond - uncond), cond)
    enable_eos = dec_step >= min_tokens
    col = jnp.arange(Vc)[None, :]
    ch = jnp.arange(C)[:, None]
    kill = (col > eos) | ((ch > 0) & (col >= eos)) | ((~enable_eos) & (col >= eos))
    lb = jnp.where(kill, NEG_INF, lb)
    eos_slot = (ch == 0) & (col == eos)
    lb = jnp.where(eos_slot, lb * eos_prob_mul_factor, lb)
    return jnp.argmax(lb, axis=-1).astype(jnp.int32)  # [C]


class _State(NamedTuple):
    dec_step: jnp.ndarray
    buf: jnp.ndarray
    cache: KVCache
    eos_detected: jnp.ndarray
    eos_countdown: jnp.ndarray
    finished_step: jnp.ndarray
    cycles: jnp.ndarray
    accepted_total: jnp.ndarray


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "max_tokens", "spec_len", "draft_layers",
                     "dispatch_mode", "decode_capacity"),
)
def speculative_generate_jit(
    params: Dict,
    cfg: UniMoEAudioConfig,
    input_ids: jnp.ndarray,          # [2, T_text] CFG pair
    attention_mask: jnp.ndarray,     # [2, T_text]
    codec_input_ids: Optional[jnp.ndarray],
    prefill_buf: jnp.ndarray,        # [1, buf_len, C]
    prefill_steps: jnp.ndarray,      # [1]
    *,
    max_tokens: int,
    min_tokens: jnp.ndarray,
    cfg_scale: jnp.ndarray,
    eos_prob_mul_factor: jnp.ndarray,
    spec_len: int = 4,
    draft_layers: int = 8,
    dispatch_mode: str = "dense",
    decode_capacity: Optional[int] = None,
) -> SpecResult:
    """Greedy speculative decode, bit-identical to
    generate_jit(do_sample=False, decode_emit=False) — tested in
    tests/test_speculative.py."""
    tc = cfg.text_config
    B2, T_text = input_ids.shape
    assert B2 == 2, "speculative decode targets the single-stream mode"
    C = cfg.codec_channels
    eos, pad = cfg.codec_eos_value, cfg.codec_pad_value
    delay = jnp.asarray(cfg.codec_delay_pattern, dtype=jnp.int32)
    max_delay = cfg.max_delay
    d = spec_len
    T_total = T_text + max_tokens + d + 2

    # ---------------- prefill (full model) ----------------
    inputs_embeds = calculate_input_embedding(
        params, input_ids, codec_input_ids, cfg.codec_placeholder_value
    )
    pos = jnp.cumsum(attention_mask, axis=-1) - 1
    pos = jnp.where(attention_mask == 0, 1, pos)
    position_ids = jnp.broadcast_to(pos[None], (3, 2, T_text))
    cache = KVCache.create(
        tc.num_hidden_layers, 2, T_total, tc.num_key_value_heads, tc.head_dim,
        dtype=inputs_embeds.dtype,
    )
    kv_valid0 = jnp.concatenate(
        [attention_mask.astype(jnp.int32),
         jnp.zeros((2, T_total - T_text), jnp.int32)], axis=-1)
    out = text_model_forward(
        params, inputs_embeds, position_ids, tc,
        kv_cache=cache, cache_position=jnp.int32(0), kv_valid_mask=kv_valid0,
        padding_token_mask=attention_mask, dispatch_mode=dispatch_mode,
    )
    cache = out.kv_cache
    text_lens = jnp.sum(attention_mask, axis=-1)  # [2]

    start_step = prefill_steps[0] - 1
    draft_params = {
        **params,
        "layers": jax.tree.map(lambda x: x[:draft_layers], params["layers"]),
    }

    def frame_positions(rel):
        """mRoPE positions for decode offsets rel [d] → [3, 2, d]."""
        p = text_lens[None, :, None] + rel[None, None, :]
        return jnp.broadcast_to(p, (3, 2, rel.shape[0]))

    def kv_valid_for(cache_pos_last):
        key_idx = jnp.arange(T_total)[None, :]
        text_valid = jnp.pad(attention_mask, ((0, 0), (0, T_total - T_text)))
        return jnp.where(
            key_idx < T_text, text_valid,
            (key_idx <= cache_pos_last).astype(jnp.int32))

    # ---------------- speculative loop ----------------
    def cond_fn(s: _State):
        return jnp.logical_and(
            s.dec_step < max_tokens, jnp.logical_not(jnp.all(s.eos_countdown == 0)))

    def body_fn(s: _State):
        t = s.dec_step                       # frame t is decided
        rel0 = t - start_step                # decode offset of frame t

        # --- draft phase: propose frames t+1 .. t+d-1 (first chunk slot
        # embeds the DECIDED frame t; drafts fill slots 1..d-1) ---
        def draft_step(i, carry):
            chunk, cache_k, cache_v = carry
            tok = jax.lax.dynamic_slice(chunk, (0, i, 0), (1, 1, C))  # [1,1,C]
            emb = codec_embedding(params, jnp.repeat(tok, 2, axis=0))
            rel = rel0 + i
            dpos = frame_positions(rel[None])
            dout = text_model_forward(
                draft_params, emb, dpos, tc,
                kv_cache=KVCache(k=cache_k, v=cache_v),
                cache_position=T_text + rel,
                kv_valid_mask=kv_valid_for(T_text + rel),
                dispatch_mode=dispatch_mode, capacity=decode_capacity,
            )
            logits = codec_logits_from_hidden(params, dout.last_hidden_state, cfg)
            frame = _greedy_frame(
                cfg, logits[:, 0], t + i, min_tokens, cfg_scale,
                eos_prob_mul_factor)
            # Mask-merge with the buffer: pre-written (delayed-BOS /
            # prompt) slots win, exactly like the baseline loop's
            # DecoderOutput merge — the merged frame is what gets embedded.
            cur = jax.lax.dynamic_slice(s.buf, (0, t + i + 1, 0), (1, 1, C))[0, 0]
            frame = jnp.where(cur == -1, frame, cur)
            chunk = jax.lax.dynamic_update_slice(chunk, frame[None, None], (0, i + 1, 0))
            return chunk, dout.kv_cache.k, dout.kv_cache.v

        frame_t = jax.lax.dynamic_slice(s.buf, (0, t, 0), (1, 1, C))  # [1,1,C]
        chunk0 = jnp.concatenate(
            [frame_t, jnp.zeros((1, d - 1, C), jnp.int32)], axis=1)   # [1,d,C]
        # Draft cache = the first draft_layers rows only (scan xs length
        # must match the sliced layer stack); discarded afterwards — the
        # verify forward recomputes every layer's KV from the same
        # embeddings before attending, so draft writes are never read.
        chunk, _, _ = jax.lax.fori_loop(
            0, d - 1, draft_step,
            (chunk0, s.cache.k[:draft_layers], s.cache.v[:draft_layers]))

        # --- verify phase: one full forward over the d-frame chunk ---
        emb = codec_embedding(params, jnp.repeat(chunk, 2, axis=0))    # [2,d,D]
        rels = rel0 + jnp.arange(d)
        vpos = frame_positions(rels)
        vout = text_model_forward(
            params, emb, vpos, tc,
            kv_cache=s.cache, cache_position=T_text + rel0,
            kv_valid_mask=kv_valid_for(T_text + rel0 + d - 1),
            dispatch_mode=dispatch_mode, capacity=decode_capacity,
        )
        logits = codec_logits_from_hidden(params, vout.last_hidden_state, cfg)
        # [2, d, C, Vc] → greedy target per chunk position
        targets_raw = jax.vmap(
            lambda i: _greedy_frame(cfg, logits[:, i], t + i, min_tokens,
                                    cfg_scale, eos_prob_mul_factor)
        )(jnp.arange(d))                                              # [d, C]
        # Same mask-merge as the draft: the MERGED values are what the
        # chunk embeds and what acceptance compares; the RAW values drive
        # EOS detection and countdown overrides in commit() — exactly the
        # baseline loop's order (raw EOS check → countdown override →
        # buffer mask-merge, generate/loop.py).
        bufrows = jax.lax.dynamic_slice(s.buf, (0, t + 1, 0), (1, d, C))[0]
        targets = jnp.where(bufrows == -1, targets_raw, bufrows)

        # Acceptance: longest prefix where proposal == target (frame t+i+1
        # proposed at chunk slot i+1 vs target[i]).
        agree = jnp.all(chunk[0, 1:] == targets[:-1], axis=-1)        # [d-1]
        n_acc = jnp.argmin(jnp.concatenate(
            [agree.astype(jnp.int32), jnp.zeros((1,), jnp.int32)]))   # in [0, d-1]

        # --- commit decided frames t+1 .. t+n_acc+1 (targets[0..n_acc])
        # through the per-frame delay-pattern EOS machinery; a frame that
        # starts/continues the countdown truncates further commits (its
        # overridden value invalidates later chunk logits) ---
        def commit(i, cs):
            (buf, eos_det, eos_cd, fin, dec, committed, blocked) = cs
            step_no = t + i + 1
            take = (i <= n_acc) & jnp.logical_not(blocked) & (
                step_no < buf.shape[1])
            pred = targets_raw[i]  # RAW: EOS detection precedes any merge
            active = eos_cd != 0
            is_eos_tok = jnp.logical_not(eos_det) & (pred[0] == eos)
            is_max_len = step_no >= (max_tokens - max_delay)
            trigger = active & (is_eos_tok | is_max_len) & take
            eos_det2 = eos_det | trigger
            start_cd = trigger & (eos_cd < 0)
            eos_cd2 = jnp.where(start_cd, max_delay, eos_cd)
            fin2 = jnp.where(start_cd, step_no, fin)
            padding = (eos_cd2 > 0) & take
            step_after = max_delay - eos_cd2
            eos_write = padding & (step_after == delay)
            pad_write = padding & (step_after > delay)
            pred2 = jnp.where(eos_write, eos, jnp.where(pad_write, pad, pred))
            cur = jax.lax.dynamic_slice(buf, (0, step_no, 0), (1, 1, C))[0, 0]
            merged = jnp.where(cur == -1, pred2, cur)
            # Block once the committed value departs from what the chunk
            # embedded (targets[i], the pre-countdown merged value) —
            # later chunk logits assumed that embedding.
            modified = jnp.any(merged != targets[i]) | padding
            buf2 = jax.lax.dynamic_update_slice(
                buf, jnp.where(take, merged, cur)[None, None], (0, step_no, 0))
            eos_cd3 = jnp.where(padding, eos_cd2 - 1, eos_cd2)
            return (
                buf2,
                jnp.where(take, eos_det2, eos_det),
                jnp.where(take, eos_cd3, eos_cd),
                jnp.where(take, fin2, fin),
                jnp.where(take, step_no, dec),
                committed + take.astype(jnp.int32),
                blocked | (take & modified),
            )

        buf, eos_det, eos_cd, fin, dec, committed, _ = jax.lax.fori_loop(
            0, d, commit,
            (s.buf, s.eos_detected[0], s.eos_countdown[0], s.finished_step[0],
             t, jnp.int32(0), jnp.bool_(False)),
        )

        return _State(
            dec_step=dec,
            buf=buf,
            cache=vout.kv_cache,
            eos_detected=eos_det[None],
            eos_countdown=eos_cd[None],
            finished_step=fin[None],
            cycles=s.cycles + 1,
            accepted_total=s.accepted_total + n_acc,
        )

    init = _State(
        dec_step=start_step,
        buf=prefill_buf,
        cache=cache,
        eos_detected=jnp.zeros((1,), bool),
        eos_countdown=jnp.full((1,), -1, jnp.int32),
        finished_step=jnp.full((1,), -1, jnp.int32),
        cycles=jnp.int32(0),
        accepted_total=jnp.int32(0),
    )
    final = jax.lax.while_loop(cond_fn, body_fn, init)

    final_step = final.dec_step + 1
    finished = jnp.where(
        final.finished_step == -1, final_step - max_delay, final.finished_step)
    lengths = jnp.clip(finished - prefill_steps, 0, max_tokens)
    codes = jax.lax.dynamic_slice(
        final.buf, (0, prefill_steps[0], 0), (1, max_tokens, C))
    span = (lengths + max_delay)[:, None]
    idx = jnp.arange(max_tokens)[None, :]
    codes = jnp.where((idx < span)[..., None], codes, pad)
    codes = jnp.where(codes == -1, pad, codes)
    return SpecResult(
        codes=codes, lengths=lengths, frames=final.dec_step - start_step,
        cycles=final.cycles,
        accept_rate=final.accepted_total.astype(jnp.float32)
        / jnp.maximum(final.cycles * (d - 1), 1),
    )
