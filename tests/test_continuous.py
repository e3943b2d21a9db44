"""Continuous-batching server tests (apps/continuous.py): a request
GREEDY-decoded through the rolling slot server is IDENTICAL to the same
request decoded standalone — including admission into a mid-flight batch,
audio-prompt requests, and decode-region compaction.  (Sampled decode uses
the identical per-request key chain but logits carry reduction-order noise
at shifted cache slots — see the module docstring — so bitwise tests run
greedy.)"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from unimoe_audio_tpu.apps.continuous import SlotRequest, SlotServer
from unimoe_audio_tpu.codec import delay as dl
from unimoe_audio_tpu.config import tiny_test_config
from unimoe_audio_tpu.generate.loop import generate_jit, pad_buffer
from unimoe_audio_tpu.models.model import init_model_params

T_TEXT = 8


def _cfg():
    return tiny_test_config(num_hidden_layers=2)


def _params(cfg):
    return init_model_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)


def _request(cfg, seed, *, max_tokens=10, min_tokens=2, text_len=None,
             prompt_frames=0):
    rng = np.random.default_rng(seed)
    tl = text_len or T_TEXT - (seed % 3)
    ids = np.zeros((2, T_TEXT), np.int32)
    mask = np.zeros((2, T_TEXT), np.int32)
    ids[:, :tl] = rng.integers(1, cfg.text_config.vocab_size - 1,
                               size=(2, tl))
    mask[:, :tl] = 1
    prompt = (rng.integers(0, cfg.codec_eos_value,
                           size=(prompt_frames, cfg.codec_channels))
              .astype(np.int32) if prompt_frames else None)
    prefill, steps = dl.prepare_audio_prompt(
        [prompt], num_channels=cfg.codec_channels,
        bos_value=cfg.codec_bos_value,
        delay_pattern=cfg.codec_delay_pattern)
    return SlotRequest(
        input_ids=ids, attention_mask=mask,
        prefill=np.asarray(prefill[0]), prefill_steps=int(steps[0]),
        max_tokens=max_tokens, min_tokens=min_tokens,
        cfg_scale=3.0, temperature=1.0, top_p=1.0,
        eos_prob_mul_factor=0.6, seed=seed, rid=f"req{seed}",
    )


def _standalone(params, cfg, req, do_sample=False):
    buf = pad_buffer(jnp.asarray(req.prefill[None]), req.max_tokens)
    res = generate_jit(
        params, cfg, jnp.asarray(req.input_ids),
        jnp.asarray(req.attention_mask), None, buf,
        jnp.asarray([req.prefill_steps], jnp.int32), jax.random.PRNGKey(0),
        max_tokens=req.max_tokens, min_tokens=jnp.int32(req.min_tokens),
        cfg_scale=jnp.float32(req.cfg_scale),
        temperature=jnp.float32(req.temperature),
        top_p=jnp.float32(req.top_p), cfg_filter_top_k=45,
        eos_prob_mul_factor=jnp.float32(req.eos_prob_mul_factor),
        sample_seeds=jnp.asarray([req.seed], jnp.int32), do_sample=do_sample,
    )
    return np.asarray(res.codes[0]), int(res.lengths[0])


def _check(results, oracle):
    assert set(r.rid for r in results) == set(oracle)
    for r in results:
        codes, length = oracle[r.rid]
        assert r.length == length, (r.rid, r.length, length)
        np.testing.assert_array_equal(r.codes, codes, err_msg=str(r.rid))


def test_single_request_matches_standalone():
    cfg = _cfg()
    params = _params(cfg)
    req = _request(cfg, seed=7)
    srv = SlotServer(params, cfg, slots=2, t_text=T_TEXT, horizon=64,
                     chunk_frames=8, do_sample=False)
    srv.submit(req)
    results = srv.run_until_drained()
    _check(results, {req.rid: _standalone(params, cfg, req)})


def test_midflight_admission_matches_standalone():
    """B admitted while A is mid-decode: both equal their standalone runs
    (decode_start masks B's cache gap; seed_step_offset keeps B's sampling
    chain row-relative; rope_deltas keep B's positions row-relative)."""
    cfg = _cfg()
    params = _params(cfg)
    a = _request(cfg, seed=1, max_tokens=14)
    b = _request(cfg, seed=2, max_tokens=9, text_len=5)
    srv = SlotServer(params, cfg, slots=2, t_text=T_TEXT, horizon=96,
                     chunk_frames=5, do_sample=False)
    srv.submit(a)
    srv.step()                      # A decodes 5 frames alone
    assert srv.active[0] and not srv.active[1]
    srv.submit(b)                   # admitted at a nonzero global step
    results = srv.run_until_drained()
    _check(results, {r.rid: _standalone(params, cfg, r) for r in (a, b)})


def test_audio_prompt_request_matches_standalone():
    """Voice-clone-style request (delayed prompt frames) through the slot
    server: the shifted buffer tail merges exactly as standalone."""
    cfg = _cfg()
    params = _params(cfg)
    a = _request(cfg, seed=3, max_tokens=8)
    p = _request(cfg, seed=4, max_tokens=16, prompt_frames=6)
    srv = SlotServer(params, cfg, slots=2, t_text=T_TEXT, horizon=96,
                     chunk_frames=4, do_sample=False)
    srv.submit(a)
    srv.step()
    srv.submit(p)
    results = srv.run_until_drained()
    _check(results, {r.rid: _standalone(params, cfg, r) for r in (a, p)})


def test_compaction_reclaims_horizon_and_preserves_results():
    """A stream of requests larger than the horizon: compaction must kick
    in (the global step would otherwise run off the cache) and every
    result still equals its standalone run."""
    cfg = _cfg()
    params = _params(cfg)
    reqs = [_request(cfg, seed=10 + i, max_tokens=10) for i in range(5)]
    srv = SlotServer(params, cfg, slots=2, t_text=T_TEXT, horizon=48,
                     chunk_frames=6, do_sample=False)
    for r in reqs:
        srv.submit(r)
    results = srv.run_until_drained()
    assert len(results) == len(reqs)
    _check(results, {r.rid: _standalone(params, cfg, r) for r in reqs})
    assert srv.compactions >= 1, "horizon never compacted — test too small"


def test_sampled_deterministic_matches_standalone_and_is_load_invariant():
    """Per-request determinism under DENSE (dropless) dispatch, SAMPLED
    decode: a request's codes equal its standalone sampled run AND are
    invariant to which co-residents share the server.  (Exact on the CPU
    backend — sequential reductions; on TPU the same property holds up to
    reduction-order noise at shifted cache slots, which dense dispatch
    cannot remove — see module docstring.)"""
    cfg = _cfg()
    params = _params(cfg)
    target = _request(cfg, seed=42, max_tokens=9)

    def serve_with(co_seed):
        srv = SlotServer(params, cfg, slots=2, t_text=T_TEXT, horizon=64,
                         chunk_frames=4, do_sample=True)
        srv.submit(_request(cfg, seed=co_seed, max_tokens=11))
        srv.step()  # co-resident decodes a chunk before target admits
        srv.submit(target)
        res = {r.rid: (r.codes, r.length) for r in srv.run_until_drained()}
        return res[target.rid]

    a_codes, a_len = serve_with(91)
    b_codes, b_len = serve_with(92)
    assert a_len == b_len
    np.testing.assert_array_equal(a_codes, b_codes)

    s_codes, s_len = _standalone(params, cfg, target, do_sample=True)
    assert a_len == s_len
    np.testing.assert_array_equal(a_codes, s_codes)


def test_continuous_server_deterministic_flag_forces_dense():
    """api.continuous_server(deterministic=True) never configures packed
    dispatch, even at serving-mode widths; deterministic=False at wide
    slots in serving mode does."""
    import sys
    sys.path.insert(0, "/root/repo/tests")
    from tests.test_api import StubTokenizer
    from unimoe_audio_tpu.api import UniMoEAudio

    cfg = _cfg()
    m = UniMoEAudio(None, tokenizer=StubTokenizer(cfg), allow_random=True,
                    config=cfg, max_tokens=8, min_tokens=2)
    m.serving_mode = "int8"  # width policy only — params stay raw here
    wide = m.continuous_server(slots=32, t_text=T_TEXT, horizon=64,
                               chunk_frames=4)
    det = m.continuous_server(slots=32, t_text=T_TEXT, horizon=64,
                              chunk_frames=4, deterministic=True)
    assert wide.dispatch["decode_dispatch_mode"] == "packed_a8"
    assert wide.dispatch["decode_capacity"] >= 16
    assert det.dispatch["decode_dispatch_mode"] is None
    assert det.dispatch["decode_capacity"] is None
    # a8_compute=False opts back into bf16 expert compute.
    m.a8_compute = False
    wide_bf = m.continuous_server(slots=32, t_text=T_TEXT, horizon=64,
                                  chunk_frames=4)
    assert wide_bf.dispatch["decode_dispatch_mode"] == "packed"


def test_sampled_mode_completes_with_valid_structure():
    """Sampled decode through the server: requests complete, lengths are in
    bounds, and codes are valid codec ids (bitwise parity is a greedy-only
    contract — see module docstring)."""
    cfg = _cfg()
    params = _params(cfg)
    reqs = [_request(cfg, seed=20 + i, max_tokens=8) for i in range(3)]
    srv = SlotServer(params, cfg, slots=2, t_text=T_TEXT, horizon=64,
                     chunk_frames=4, do_sample=True)
    for r in reqs:
        srv.submit(r)
    results = srv.run_until_drained()
    assert len(results) == 3
    for r in results:
        assert 0 <= r.length <= 8
        # Delayed-domain codes: content + EOS/PAD/BOS specials.
        assert ((r.codes >= 0) & (r.codes <= cfg.codec_bos_value)).all()


def test_api_surface_continuous_t2m_and_tts(tmp_path):
    """UniMoEAudio.continuous_server / make_slot_request /
    decode_slot_results: T2M and voice-clone TTS requests ride the rolling
    server end-to-end (prompt templates, codec placeholder scatter into
    the spliced prefill, delay-revert assembly)."""
    from test_api import StubTokenizer
    from unimoe_audio_tpu.api import UniMoEAudio

    cfg = _cfg()
    m = UniMoEAudio(None, allow_random=True, config=cfg,
                    tokenizer=StubTokenizer(cfg), max_tokens=12, min_tokens=2)
    srv = m.continuous_server(slots=2, t_text=96, horizon=96,
                              chunk_frames=6, do_sample=True)
    rng = np.random.default_rng(0)
    prompt_codec = rng.integers(0, cfg.codec_eos_value,
                                size=(3, cfg.codec_channels))
    srv.submit(m.make_slot_request(
        "t2m", caption="a slow piano piece", seed=1,
        max_audio_seconds=0.24, rid="music"))
    srv.submit(m.make_slot_request(
        "tts", caption="hello world", prompt_text="ref transcript",
        prompt_codec=prompt_codec, seed=2, max_audio_seconds=0.4,
        rid="speech"))
    results = srv.run_until_drained()
    assert {r.rid for r in results} == {"music", "speech"}
    paths = m.decode_slot_results(results, output_dir=str(tmp_path))
    assert len(paths) == 2
    import os

    assert all(os.path.exists(p) for p in paths)


def test_vt2m_request_matches_standalone(tmp_path):
    """A video request admitted mid-flight: vision features splice into the
    prefill, mRoPE deltas stay row-relative (base_delta), and greedy output
    equals the same request decoded standalone."""
    from test_vt2m import VisionStubTokenizer
    from unimoe_audio_tpu.api import UniMoEAudio

    cfg = tiny_test_config(num_hidden_layers=2, with_vision=True)
    m = UniMoEAudio(None, allow_random=True, config=cfg,
                    tokenizer=VisionStubTokenizer(cfg),
                    max_tokens=10, min_tokens=2)
    m.params = jax.tree.map(
        lambda x: x.astype(jnp.float32)
        if hasattr(x, "astype") and x.dtype == jnp.bfloat16 else x, m.params)
    rng = np.random.default_rng(0)
    video = rng.uniform(0, 255, size=(2, 3, 56, 56)).astype(np.float32)
    vreq = m.make_slot_request("vt2m", caption="drums", video=video,
                               seed=5, max_audio_seconds=0.2, rid="vid")
    treq = m.make_slot_request("t2m", caption="calm tune", seed=6,
                               max_audio_seconds=0.2, rid="txt")
    t_text = max(vreq.input_ids.shape[1], treq.input_ids.shape[1])
    srv = SlotServer(m.params, cfg, slots=2, t_text=t_text, horizon=64,
                     chunk_frames=3, do_sample=False)
    srv.submit(treq)
    srv.step()                       # text request decodes alone first
    srv.submit(vreq)                 # video request admits mid-flight
    results = srv.run_until_drained()

    def standalone(req):
        # Pad text to the server's t_text so attention reductions group
        # identically (bitwise contract needs identical shapes).
        t_req = req.input_ids.shape[1]
        ids = np.zeros((2, t_text), np.int32)
        mask = np.zeros((2, t_text), np.int32)
        ids[:, :t_req] = req.input_ids
        mask[:, :t_req] = req.attention_mask
        buf = pad_buffer(jnp.asarray(req.prefill[None]), req.max_tokens)
        kw = {}
        if req.visual_embeds is not None:
            D = req.visual_embeds.shape[-1]
            ve = np.zeros((2, t_text, D), np.float32)
            ve[:, :t_req] = req.visual_embeds
            vm = np.zeros((2, t_text), np.int32)
            vm[:, :t_req] = req.visual_mask
            ppos = np.zeros((3, 2, t_text), np.int32)
            ppos[:, :, :t_req] = req.prefill_position_ids
            kw = dict(
                visual_embeds=jnp.asarray(ve), visual_mask=jnp.asarray(vm),
                prefill_position_ids=jnp.asarray(ppos),
                rope_deltas=jnp.asarray(req.rope_deltas, jnp.int32),
            )
        res = generate_jit(
            m.params, cfg, jnp.asarray(ids), jnp.asarray(mask), None, buf,
            jnp.asarray([req.prefill_steps], jnp.int32),
            jax.random.PRNGKey(0), max_tokens=req.max_tokens,
            min_tokens=jnp.int32(req.min_tokens),
            cfg_scale=jnp.float32(req.cfg_scale),
            temperature=jnp.float32(1.0), top_p=jnp.float32(1.0),
            cfg_filter_top_k=45,
            eos_prob_mul_factor=jnp.float32(req.eos_prob_mul_factor),
            do_sample=False, **kw)
        return np.asarray(res.codes[0]), int(res.lengths[0])

    _check(results, {r.rid: standalone(r) for r in (treq, vreq)})


def test_packed_dispatch_server_completes():
    """SlotServer under capacity-packed decode dispatch (the serving-mode
    MoE path): requests complete with in-bounds lengths.  Packed capacity
    couples rows, so this is a structural smoke, not a parity test."""
    cfg = _cfg()
    params = _params(cfg)
    srv = SlotServer(params, cfg, slots=2, t_text=T_TEXT, horizon=64,
                     chunk_frames=6, do_sample=False,
                     decode_dispatch_mode="packed", decode_capacity=16)
    reqs = [_request(cfg, seed=30 + i, max_tokens=8) for i in range(3)]
    for r in reqs:
        srv.submit(r)
    results = srv.run_until_drained()
    assert len(results) == 3
    assert all(0 <= r.length <= 8 for r in results)


def test_cancel_queued_and_live_requests():
    """cancel(): a queued request is dropped before admission; a live
    request frees its slot mid-flight (later arrivals reuse it) and the
    survivors still match standalone."""
    cfg = _cfg()
    params = _params(cfg)
    a = _request(cfg, seed=40, max_tokens=14)
    b = _request(cfg, seed=41, max_tokens=10)
    c = _request(cfg, seed=42, max_tokens=10)
    srv = SlotServer(params, cfg, slots=2, t_text=T_TEXT, horizon=96,
                     chunk_frames=4, do_sample=False)
    srv.submit(a)
    srv.submit(b)
    srv.submit(c)
    assert srv.cancel("req41")          # still queued
    assert not srv.cancel("nonexistent")
    srv.step()                          # a + c admitted
    assert set(filter(None, srv.rids)) == {"req40", "req42"}
    assert srv.cancel("req40")          # live cancellation
    results = srv.run_until_drained()
    assert {r.rid for r in results} == {"req42"}
    _check(results, {c.rid: _standalone(params, cfg, c)})
    for r in results:
        assert r.wait_s >= 0 and r.serve_s > 0


def test_submit_rejects_oversized_request():
    cfg = _cfg()
    params = _params(cfg)
    srv = SlotServer(params, cfg, slots=1, t_text=T_TEXT, horizon=32,
                     chunk_frames=4)
    with pytest.raises(ValueError, match="horizon"):
        srv.submit(_request(cfg, seed=5, max_tokens=64))


def test_mesh_sharded_continuous_server_matches_standalone():
    """Continuous batching on an ep*tp GSPMD mesh: the slot server's
    jitted step runs with mesh-sharded (int8 QTensor) params — splice,
    compaction, and donation all compose with NamedSharding leaves — and
    greedy results match standalone decoding with the SAME sharded
    params (identical reduction grouping, so parity is exact on CPU)."""
    from unimoe_audio_tpu.ops.quant import quantize_model_params_inplace
    from unimoe_audio_tpu.parallel.mesh import make_mesh, shard_params

    cfg = _cfg()
    params = quantize_model_params_inplace(_params(cfg))
    mesh = make_mesh(1, 2, 2)      # (data, expert, model)
    params = shard_params(params, mesh, cfg)
    a = _request(cfg, seed=11, max_tokens=14)
    b = _request(cfg, seed=12, max_tokens=9, text_len=5)
    srv = SlotServer(params, cfg, slots=2, t_text=T_TEXT, horizon=64,
                     chunk_frames=5, do_sample=False)
    srv.submit(a)
    srv.step()                      # a decodes alone
    srv.submit(b)                   # admitted mid-flight
    results = srv.run_until_drained()
    _check(results, {r.rid: _standalone(params, cfg, r) for r in (a, b)})


def test_fuzz_schedule_matches_standalone():
    """Seeded fuzz: heterogeneous requests (budgets, text lengths, audio
    prompts) submitted at random chunk boundaries with a mid-flight
    cancellation, through a small-horizon server that must compact
    repeatedly — every completed request equals its standalone decode.
    Exercises the corner interactions fixed scenarios miss (admission at
    the horizon boundary, retire+admit in one chunk, compaction during
    an EOS staircase)."""
    cfg = _cfg()
    params = _params(cfg)
    rng = np.random.default_rng(2024)
    reqs = [_request(cfg, seed=100 + i,
                     max_tokens=int(rng.integers(8, 18)),
                     text_len=int(rng.integers(3, T_TEXT)),
                     prompt_frames=int(rng.integers(0, 2)) * 3)
            for i in range(9)]
    srv = SlotServer(params, cfg, slots=3, t_text=T_TEXT, horizon=56,
                     chunk_frames=4, do_sample=False)
    pending = list(reqs)
    cancelled = None
    for it in range(400):
        if not pending and not srv.queue and not srv.active.any():
            break
        # Random burst submission at chunk boundaries.
        for _ in range(int(rng.integers(0, 3))):
            if pending:
                srv.submit(pending.pop(0))
        if it == 5 and cancelled is None:
            # Cancel whatever is live in slot 1 (if anything).
            if srv.active[1]:
                cancelled = srv.rids[1]
                assert srv.cancel(cancelled)
        srv.step()
    results, srv.results = srv.results, []
    assert srv.compactions >= 2
    done_rids = {r.rid for r in results}
    want_rids = {r.rid for r in reqs} - ({cancelled} if cancelled else set())
    assert done_rids == want_rids
    oracle = {r.rid: _standalone(params, cfg, r)
              for r in reqs if r.rid in done_rids}
    _check(results, oracle)
