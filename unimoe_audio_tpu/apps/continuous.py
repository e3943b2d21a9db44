"""Continuous (rolling) batching for the decode loop — slot-based request
admission, retirement, and cache compaction at chunk boundaries.

The window batcher (apps/batcher.py) decodes each batch to completion, so
a finished stream's slot idles until the whole batch drains, and arrivals
wait for the next window.  This server keeps ONE live decode state with a
fixed number of request slots and, every `chunk_frames` decode steps:

  * RETIRES finished rows (delay-pattern countdown hit 0) and returns
    their codes,
  * ADMITS queued requests into free slots by splicing a standalone
    prefill (text KV, delayed prompt buffer, per-sample knobs) into the
    live state, and
  * COMPACTS the KV cache when the decode region nears its horizon by
    dropping the dead prefix no active row can attend (uniform roll —
    slots below min(decode_start) belong only to retired rows).

This is the TPU-native answer to vLLM-style continuous batching on top of
a STATIC-shape jitted loop: the batch tensor never changes shape; requests
move through it.  It builds on three loop hooks (generate/loop.py):
`decode_start` (masks an admitted row's unwritten cache gap), `start_step`
(pins the global step origin as rows churn), and `seed_step_offset` (keeps
per-request sampling chains row-relative).

The reference has no analog (its generate loop is one batch to completion,
utils/UniMoE_Audio_model.py:1070-1231); capability class (d) beyond-parity
serving, like ring attention and speculative decoding.

Parity contract: GREEDY decode through the server is equality-tested
against standalone decoding — including mid-flight admission, audio-prompt
requests, and post-compaction.  Sampled decode draws from the IDENTICAL
per-request key chain, but an admitted row's KV lives at shifted cache
slots, so attention reductions group differently: logits match standalone
only to float reduction-order noise and a borderline sample can
occasionally flip (the same backend-reduction caveat documented for the
speculative decoder's emit path).  Under capacity-packed dispatch the
usual row-coupling caveat applies (generate/loop.py sample_seeds note).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..config import UniMoEAudioConfig
from ..generate.loop import _LoopState, generate_jit
from ..models.layers import KVCache


@dataclasses.dataclass
class SlotRequest:
    """One tensor-level request (the task/API layer builds these the same
    way api._generate_core builds its CFG-pair batches)."""

    input_ids: np.ndarray        # [2, T_req] CFG pair [neg, cond]
    attention_mask: np.ndarray   # [2, T_req]
    prefill: np.ndarray          # [P, C] delayed prompt buffer (-1 = open)
    prefill_steps: int
    max_tokens: int
    min_tokens: int = 0
    cfg_scale: float = 10.0
    temperature: float = 1.0
    top_p: float = 1.0
    eos_prob_mul_factor: float = 0.6
    seed: int = 0
    rid: Optional[object] = None  # caller's request id
    # Voice-clone prompts: flat [N, C] codec rows scattered into the text's
    # N placeholder positions at prefill (api.text_to_speech's contract).
    codec_flat: Optional[np.ndarray] = None
    # VT2M: vision features + mRoPE, api.video_text_to_music's contract.
    visual_embeds: Optional[np.ndarray] = None        # [2, T_req, D]
    visual_mask: Optional[np.ndarray] = None          # [2, T_req]
    prefill_position_ids: Optional[np.ndarray] = None  # [3, 2, T_req]
    rope_deltas: Optional[np.ndarray] = None          # [2]


@dataclasses.dataclass
class SlotResult:
    rid: object
    codes: np.ndarray   # [max_tokens, C] delayed-domain codes (PAD-masked),
                        # same contract as GenerateResult.codes rows
    length: int
    wait_s: float = 0.0   # submit → admission (queueing delay)
    serve_s: float = 0.0  # admission → retirement (decode residency)


class SlotServer:
    """Fixed-slot continuous-batching decode server.

    All shapes are static: `slots` requests × `t_text` text tokens × a
    `horizon`-frame decode region.  `horizon` must cover the longest
    request budget plus admission slack; compaction reclaims space as
    requests retire, so the server runs indefinitely.
    """

    def __init__(self, params: Dict, cfg: UniMoEAudioConfig, *,
                 slots: int = 4, t_text: int = 32, horizon: int = 512,
                 chunk_frames: int = 64, do_sample: bool = True,
                 dispatch_mode: str = "dense",
                 decode_dispatch_mode: Optional[str] = None,
                 decode_capacity: Optional[int] = None,
                 prefill_capacity: Optional[int] = None,
                 kv_dtype: Optional[str] = None):
        """kv_dtype="int8" stores the rolling KV cache int8 with
        per-position scales (models/layers.KVCache) — the server's cache
        is long-lived and sized for the full horizon, so the decode
        stream saving is largest here."""
        self.params, self.cfg = params, cfg
        self.kv_dtype = kv_dtype
        self.S, self.T = slots, t_text
        self.C = cfg.codec_channels
        self.H_frames = horizon
        self.chunk = chunk_frames
        self.buf_len = horizon + 2
        self.cache_len = t_text + horizon + 2
        self.do_sample = do_sample
        self.dispatch = dict(
            dispatch_mode=dispatch_mode,
            decode_dispatch_mode=decode_dispatch_mode,
            decode_capacity=decode_capacity,
            prefill_capacity=prefill_capacity,
        )
        S, T, C = slots, t_text, cfg.codec_channels
        tc = cfg.text_config

        # Parked rows: one attendable text token (all-invalid keys would
        # NaN the softmax), buffer fully claimed (pad) so writes never
        # surface, countdown 0 so they don't extend the loop.
        self.input_ids = np.zeros((2 * S, T), np.int32)
        self.attention_mask = np.zeros((2 * S, T), np.int32)
        self.attention_mask[:, 0] = 1
        self.ps = np.zeros((S,), np.int32)            # per-row prefill_steps
        self.min_vec = np.zeros((S,), np.int32)
        self.mt_vec = np.full((S,), 1, np.int32)
        self.cfg_vec = np.zeros((S,), np.float32)
        self.temp_vec = np.ones((S,), np.float32)
        self.topp_vec = np.ones((S,), np.float32)
        self.eosf_vec = np.ones((S,), np.float32)
        self.seeds = np.zeros((S,), np.int32)
        self.d_start = np.full((S,), T, np.int32)     # first valid decode slot
        self.seed_off = np.zeros((S,), np.int32)
        # Per-row mRoPE decode base, as a delta vs T: text rows use
        # attended_len - T; vision rows use get_rope_index's delta.  The
        # loop's base is T + (base_delta - admission offset).
        self.base_delta = np.zeros((2 * S,), np.int32) + 1 - T
        self.active = np.zeros((S,), bool)
        self.rids: List[object] = [None] * S
        self.req_max = np.zeros((S,), np.int32)

        self.state = _LoopState(
            dec_step=jnp.int32(0),
            buf=jnp.full((S, self.buf_len, C), cfg.codec_pad_value, jnp.int32),
            cache=KVCache.create(tc.num_hidden_layers, 2 * S, self.cache_len,
                                 tc.num_key_value_heads, tc.head_dim,
                                 dtype=(jnp.int8 if kv_dtype == "int8"
                                        else params["embed_tokens"].dtype)),
            eos_detected=jnp.zeros((S,), bool),
            eos_countdown=jnp.zeros((S,), jnp.int32),
            finished_step=jnp.full((S,), -1, jnp.int32),
            rng=jax.random.PRNGKey(0),
            guidance_loss=jnp.float32(0),
            guidance_count=jnp.int32(0),
        )
        self.queue: List[SlotRequest] = []
        self.results: List[SlotResult] = []
        self.compactions = 0
        self._submit_t: Dict[int, float] = {}
        self._admit_t = np.zeros((S,), np.float64)
        self._wait_s = np.zeros((S,), np.float64)
        self._splice_jit = None
        self._compact_jit = None
        # Host mirrors of the loop-control state, refreshed in ONE
        # device_get per chunk (device->host fetches cost ~30 ms each over
        # the axon tunnel; separate int()/np.asarray() pulls in
        # step/_admit/_retire were 4-5 round trips per chunk).  Kept exact:
        # _splice and _compact apply the same updates host-side.
        self._dec_h = 0
        self._cd_h = np.zeros((S,), np.int32)
        self._fin_h = np.full((S,), -1, np.int32)

    # -- request intake ---------------------------------------------------
    def submit(self, req: SlotRequest) -> None:
        need = req.prefill.shape[0] + req.max_tokens + self.cfg.max_delay + 2
        if need > self.buf_len:
            raise ValueError(
                f"request needs {need} frames; horizon is {self.H_frames}")
        if req.max_tokens < req.prefill_steps + self.cfg.max_delay + 1:
            # Degenerate budget: max_tokens counts ABSOLUTE decode steps
            # (prompt included, reference semantics), so a budget inside
            # prompt + max_delay can't fit even the EOS staircase — the
            # one case where standalone truncates mid-staircase and the
            # rolling server (which completes it) would differ bitwise.
            raise ValueError(
                f"max_tokens={req.max_tokens} < prefill_steps "
                f"({req.prefill_steps}) + max_delay ({self.cfg.max_delay}) "
                f"+ 1; raise the budget")
        if req.input_ids.shape[1] > self.T:
            raise ValueError(
                f"request text {req.input_ids.shape[1]} > t_text {self.T}")
        self._submit_t[id(req)] = time.time()
        self.queue.append(req)

    def cancel(self, rid) -> bool:
        """Drop a request by rid: from the queue if still waiting, or by
        freeing its live slot (the row stops extending the loop and its
        writes never surface).  Returns True if something was cancelled."""
        for i, q in enumerate(self.queue):
            if q.rid == rid:
                self._submit_t.pop(id(q), None)
                del self.queue[i]
                return True
        for slot in range(self.S):
            if self.active[slot] and self.rids[slot] == rid:
                self.active[slot] = False
                self.rids[slot] = None
                self.state = self.state._replace(
                    buf=self.state.buf.at[slot].set(self.cfg.codec_pad_value),
                    eos_countdown=self.state.eos_countdown.at[slot].set(0),
                    eos_detected=self.state.eos_detected.at[slot].set(True),
                )
                self._cd_h[slot] = 0
                return True
        return False

    # -- admission --------------------------------------------------------
    def _prefill_request(self, req: SlotRequest):
        """Standalone single-request prefill: returns its text KV cache
        [L, cache_len, 2, KV, Dh] (decode region zeros — masked by
        decode_start until written)."""
        T, C = self.T, self.C
        ids = np.zeros((2, T), np.int32)
        mask = np.zeros((2, T), np.int32)
        t_req = req.input_ids.shape[1]
        ids[:, :t_req] = req.input_ids
        mask[:, :t_req] = req.attention_mask
        aligned = None
        if req.codec_flat is not None:
            from ..models.model import align_codec_ids

            flat = np.tile(np.asarray(req.codec_flat), (2, 1))  # both CFG rows
            aligned = jnp.asarray(align_codec_ids(
                ids, flat, self.cfg.codec_placeholder_value))
        ve = vm = ppos = None
        if req.visual_embeds is not None:
            D = req.visual_embeds.shape[-1]
            ve = np.zeros((2, T, D), np.float32)
            ve[:, :t_req] = req.visual_embeds
            vm = np.zeros((2, T), np.int32)
            vm[:, :t_req] = req.visual_mask
            ve, vm = jnp.asarray(ve), jnp.asarray(vm)
        if req.prefill_position_ids is not None:
            ppos = np.zeros((3, 2, T), np.int32)
            ppos[:, :, :t_req] = req.prefill_position_ids
            ppos = jnp.asarray(ppos)
        buf1 = np.full((1, self.buf_len, C), -1, np.int32)
        buf1[0, : req.prefill.shape[0]] = req.prefill
        _, st = generate_jit(
            self.params, self.cfg, jnp.asarray(ids), jnp.asarray(mask),
            aligned,
            jnp.asarray(buf1), jnp.asarray([req.prefill_steps], jnp.int32),
            jax.random.PRNGKey(0), ve, vm, ppos, stop_at=jnp.int32(0),
            cache_len=self.cache_len, return_state=True,
            max_tokens=1, min_tokens=jnp.int32(0),
            cfg_scale=jnp.float32(req.cfg_scale),
            temperature=jnp.float32(1.0), top_p=jnp.float32(1.0),
            cfg_filter_top_k=45, eos_prob_mul_factor=jnp.float32(1.0),
            do_sample=False, dispatch_mode=self.dispatch["dispatch_mode"],
            prefill_capacity=self.dispatch["prefill_capacity"],
            kv_dtype=self.kv_dtype,
        )
        return st.cache, np.asarray(mask), ids

    def _splice(self, slot: int, cache2: KVCache, buf_row: np.ndarray):
        if self._splice_jit is None:
            def f(state, cache2, row, slot_i):
                def put(dst, src):
                    # batch dim is axis 2 of both the 5-D k/v and the
                    # 4-D scale buffers
                    start = (0, 0, 2 * slot_i, 0, 0)[: dst.ndim]
                    return jax.lax.dynamic_update_slice(
                        dst, src.astype(dst.dtype), start)

                cache = jax.tree.map(put, state.cache, cache2)
                buf = jax.lax.dynamic_update_slice(
                    state.buf, row[None], (slot_i, 0, 0))
                one = jax.nn.one_hot(slot_i, self.S, dtype=jnp.bool_)
                return state._replace(
                    cache=cache, buf=buf,
                    eos_detected=jnp.where(one, False, state.eos_detected),
                    eos_countdown=jnp.where(one, -1, state.eos_countdown),
                    finished_step=jnp.where(one, -1, state.finished_step),
                )

            self._splice_jit = jax.jit(f, donate_argnums=(0,))
        self.state = self._splice_jit(
            self.state, cache2, jnp.asarray(buf_row), jnp.int32(slot))
        self._cd_h[slot] = -1
        self._fin_h[slot] = -1

    def _admit(self) -> None:
        d0 = self._dec_h
        for slot in range(self.S):
            if self.active[slot] or not self.queue:
                continue
            req = self.queue.pop(0)
            P = req.prefill.shape[0]
            if d0 + req.max_tokens + P + self.cfg.max_delay + 2 \
                    > self.buf_len:
                # Not enough live horizon left this cycle — wait for
                # compaction to free space.
                self.queue.insert(0, req)
                break
            cache2, mask, ids = self._prefill_request(req)
            # Standalone, the loop's first read is buf[ps - 1] (the last
            # prefill frame; start_step = ps - 1).  The live batch's next
            # read is buf[d0], so the row's content shifts by
            # Δ = d0 + 1 - ps: buf'[t] = buf[t - Δ].  Frames below ps - 1
            # are never read in either regime; the delayed tail beyond ps
            # (later channels' prompt content) rides along and wins merges
            # exactly as standalone.
            delta = d0 + 1 - req.prefill_steps
            row = np.full((self.buf_len, self.C), -1, np.int32)
            row[:d0] = self.cfg.codec_pad_value   # never read again
            src0 = req.prefill_steps - 1
            n_copy = min(P - src0, self.buf_len - d0)
            row[d0 : d0 + n_copy] = req.prefill[src0 : src0 + n_copy]
            self._splice(slot, cache2, row)
            self.input_ids[2 * slot : 2 * slot + 2] = ids
            self.attention_mask[2 * slot : 2 * slot + 2] = mask
            # mRoPE decode base as a delta vs T: vision rows carry
            # get_rope_index's delta, text rows attended_len - T.
            self.base_delta[2 * slot : 2 * slot + 2] = (
                np.asarray(req.rope_deltas).reshape(-1)
                if req.rope_deltas is not None
                else mask.sum(-1) - self.T)
            self.ps[slot] = d0 + 1                        # = ps + Δ
            self.min_vec[slot] = req.min_tokens + delta
            self.mt_vec[slot] = req.max_tokens + delta
            self.cfg_vec[slot] = req.cfg_scale
            self.temp_vec[slot] = req.temperature
            self.topp_vec[slot] = req.top_p
            self.eosf_vec[slot] = req.eos_prob_mul_factor
            self.seeds[slot] = req.seed
            self.d_start[slot] = self.T + d0
            self.seed_off[slot] = delta
            self.req_max[slot] = req.max_tokens
            self.active[slot] = True
            self.rids[slot] = req.rid
            now = time.time()
            self._admit_t[slot] = now
            self._wait_s[slot] = now - self._submit_t.pop(id(req), now)

    # -- retirement -------------------------------------------------------
    def _retire(self) -> None:
        cd, fin = self._cd_h, self._fin_h
        buf = None
        for slot in range(self.S):
            if not self.active[slot] or cd[slot] != 0:
                continue
            if buf is None:
                buf = np.asarray(self.state.buf)
            ps = int(self.ps[slot])
            mt = int(self.req_max[slot])
            length = int(np.clip(fin[slot] - ps, 0, mt))
            codes = np.full((mt, self.C), self.cfg.codec_pad_value, np.int32)
            span = min(length + self.cfg.max_delay, mt)
            window = buf[slot, ps : ps + span]
            codes[:span] = np.where(window == -1, self.cfg.codec_pad_value,
                                    window)
            self.results.append(SlotResult(
                rid=self.rids[slot], codes=codes, length=length,
                wait_s=round(float(self._wait_s[slot]), 3),
                serve_s=round(time.time() - float(self._admit_t[slot]), 3)))
            self.active[slot] = False
            self.rids[slot] = None
            # Claim the slot's buffer (writes never surface until the next
            # admission overwrites the row).
            self.state = self.state._replace(
                buf=self.state.buf.at[slot].set(self.cfg.codec_pad_value))

    # -- compaction -------------------------------------------------------
    def _compact(self) -> None:
        """Drop the dead decode prefix [T, T + m): slots below every active
        row's decode_start hold only retired rows' KV."""
        if not self.active.any():
            m = self._dec_h
        else:
            m = int(self.d_start[self.active].min()) - self.T
        if m <= 0:
            return
        if self._compact_jit is None:
            T = self.T

            def f(state, m_):
                def roll_time(x):
                    head = x[:, :T]
                    body = jnp.roll(x[:, T:], -m_, axis=1)
                    idx = jnp.arange(x.shape[1] - T)
                    keep = (idx < x.shape[1] - T - m_).reshape(
                        (1, -1) + (1,) * (x.ndim - 2))
                    body = jnp.where(keep, body, 0)
                    return jnp.concatenate([head, body], axis=1)

                buf = jnp.roll(state.buf, -m_, axis=1)
                idx = jnp.arange(state.buf.shape[1])
                buf = jnp.where(
                    (idx < state.buf.shape[1] - m_)[None, :, None], buf, -1)
                return state._replace(
                    dec_step=state.dec_step - m_,
                    buf=buf,
                    # k/v AND (when int8) the scale buffers roll together
                    cache=jax.tree.map(roll_time, state.cache),
                    # finished_step is an absolute step index: rows caught
                    # mid-EOS-staircase must shift with the origin.
                    finished_step=jnp.where(
                        state.finished_step >= 0,
                        state.finished_step - m_, state.finished_step),
                )

            self._compact_jit = jax.jit(f, donate_argnums=(0,))
        self.state = self._compact_jit(self.state, jnp.int32(m))
        self.compactions += 1
        # Every step-indexed quantity is row-relative to the global origin,
        # which just moved left by m.  (Inactive rows' metadata goes stale
        # here by design — it is fully rewritten at the next admission.)
        for v in (self.ps, self.min_vec, self.mt_vec, self.seed_off):
            v -= m
        self.d_start = np.maximum(self.d_start - m, self.T)
        # Host mirrors shift exactly as the jit did.
        self._dec_h -= m
        self._fin_h = np.where(self._fin_h >= 0, self._fin_h - m,
                               self._fin_h).astype(np.int32)

    # -- the chunk loop ---------------------------------------------------
    def step(self) -> List[SlotResult]:
        """Run one chunk: compact if needed, admit, decode `chunk_frames`
        steps, retire.  Returns results completed this chunk."""
        if self._dec_h + self.chunk + 2 >= self.H_frames \
                or (self.queue and not self.active.all()):
            self._compact()
        self._admit()
        n_before = len(self.results)
        if self.active.any():
            # Loop decode base = T + rd; subtracting each row's admission
            # offset (d_start - T) keeps positions row-relative.
            rd = (self.base_delta - (self.d_start.repeat(2) - self.T)
                  ).astype(np.int32)
            stop = jnp.int32(self._dec_h + self.chunk)
            _, st = generate_jit(
                self.params, self.cfg,
                jnp.asarray(self.input_ids), jnp.asarray(self.attention_mask),
                None, self.state.buf, jnp.asarray(self.ps),
                jax.random.PRNGKey(0),
                resume_state=self.state, stop_at=stop,
                start_step=jnp.int32(0),
                decode_start=jnp.asarray(self.d_start),
                seed_step_offset=jnp.asarray(self.seed_off),
                rope_deltas=jnp.asarray(rd),
                cache_len=self.cache_len, return_state=True,
                max_tokens=self.H_frames,
                min_tokens=jnp.asarray(self.min_vec),
                cfg_scale=jnp.asarray(self.cfg_vec),
                temperature=jnp.asarray(self.temp_vec),
                top_p=jnp.asarray(self.topp_vec),
                cfg_filter_top_k=45,
                eos_prob_mul_factor=jnp.asarray(self.eosf_vec),
                max_tokens_vec=jnp.asarray(self.mt_vec),
                sample_seeds=jnp.asarray(self.seeds),
                do_sample=self.do_sample,
                **{k: v for k, v in self.dispatch.items() if v is not None},
            )
            self.state = st
            # ONE round trip refreshes every loop-control mirror.
            dec, cd, fin = jax.device_get(
                (st.dec_step, st.eos_countdown, st.finished_step))
            self._dec_h = int(dec)
            # np.array: device_get may return read-only buffer views and
            # the mirrors are mutated by _splice/cancel.
            self._cd_h = np.array(cd, dtype=np.int32)
            self._fin_h = np.array(fin, dtype=np.int32)
            self._retire()
        return self.results[n_before:]

    def run_until_drained(self, max_chunks: int = 10_000) -> List[SlotResult]:
        """Drive step() until the queue and all slots are empty."""
        for _ in range(max_chunks):
            if not self.queue and not self.active.any():
                break
            self.step()
        out, self.results = self.results, []
        return out
