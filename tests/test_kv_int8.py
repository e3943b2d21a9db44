"""int8 KV cache (models/layers.KVCache with per-position scales).

Beyond-reference serving optimization: at long generations the bf16 KV
stream rivals the int8 weight stream; int8 storage halves it.  Tests
cover the quantizer bound, cache-path numerics vs the bf16 cache, the
chunked-growth scale plumbing, and the end-to-end API flag.
"""

import numpy as np
import jax
import jax.numpy as jnp

from unimoe_audio_tpu.codec import delay as dl
from unimoe_audio_tpu.config import tiny_test_config
from unimoe_audio_tpu.generate.loop import (
    generate_chunked, generate_jit, pad_buffer,
)
from unimoe_audio_tpu.models.layers import KVCache, quantize_kv
from unimoe_audio_tpu.models.model import init_model_params


def test_quantize_kv_bound():
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 5, 2, 64), jnp.float32)
    q, s = quantize_kv(x)
    assert q.dtype == jnp.int8 and s.shape == (3, 5, 2)
    deq = q.astype(jnp.float32) * s[..., None]
    err = np.asarray(jnp.abs(deq - x))
    bound = np.asarray(s)[..., None] / 2 + 1e-6
    assert (err <= bound).all()


def test_kvcache_create_int8():
    c = KVCache.create(2, 4, 16, 2, 8, dtype=jnp.int8)
    assert c.quantized
    assert c.k.dtype == jnp.int8 and c.k.shape == (2, 16, 4, 2, 8)
    assert c.k_scale.shape == (2, 16, 4, 2) and c.k_scale.dtype == jnp.float32
    b = KVCache.create(2, 4, 16, 2, 8)
    assert not b.quantized and b.k_scale is None


def _gen_inputs(cfg, B=2, T_text=8, max_tokens=12):
    rng = np.random.default_rng(0)
    ids = rng.integers(5, 60, (2 * B, T_text)).astype(np.int32)
    attn = np.ones((2 * B, T_text), np.int32)
    prefill, steps = dl.prepare_audio_prompt(
        [None] * B, num_channels=cfg.codec_channels,
        bos_value=cfg.codec_bos_value, delay_pattern=cfg.codec_delay_pattern)
    buf = pad_buffer(prefill, max_tokens)
    kw = dict(max_tokens=max_tokens, min_tokens=jnp.int32(4),
              cfg_scale=jnp.float32(2.0), temperature=jnp.float32(1.0),
              top_p=jnp.float32(1.0), cfg_filter_top_k=10,
              eos_prob_mul_factor=jnp.float32(1.0), do_sample=False)
    return (jnp.asarray(ids), jnp.asarray(attn), buf,
            jnp.asarray(steps, jnp.int32)), kw


def test_int8_kv_generation_close_to_bf16():
    """Greedy decode with the int8 cache: same output structure, and the
    frame stream stays mostly identical to the full-precision cache on a
    tiny model (int8 KV error is ~0.4% RMS per vector; occasional argmax
    near-tie flips are expected on random weights)."""
    cfg = tiny_test_config(num_hidden_layers=2)
    params = init_model_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    (ids, attn, buf, steps), kw = _gen_inputs(cfg)

    base = generate_jit(params, cfg, ids, attn, None, buf, steps,
                        jax.random.PRNGKey(1), **kw)
    q = generate_jit(params, cfg, ids, attn, None, buf, steps,
                     jax.random.PRNGKey(1), kv_dtype="int8", **kw)
    assert q.codes.shape == base.codes.shape
    assert int(q.steps) == int(base.steps)
    agree = float(np.mean(np.asarray(q.codes) == np.asarray(base.codes)))
    assert agree > 0.7, agree


def test_int8_kv_chunked_matches_single_shot():
    """generate_chunked with the int8 cache (scale buffers pad between
    chunks) must equal the single-executable int8 decode exactly."""
    cfg = tiny_test_config(num_hidden_layers=2)
    params = init_model_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    (ids, attn, buf, steps), kw = _gen_inputs(cfg, max_tokens=20)

    single = generate_jit(params, cfg, ids, attn, None, buf, steps,
                          jax.random.PRNGKey(1), kv_dtype="int8", **kw)
    chunked = generate_chunked(params, cfg, ids, attn, None, buf, steps,
                               jax.random.PRNGKey(1), chunk_frames=8,
                               kv_dtype="int8", **kw)
    np.testing.assert_array_equal(np.asarray(single.codes),
                                  np.asarray(chunked.codes))
    np.testing.assert_array_equal(np.asarray(single.lengths),
                                  np.asarray(chunked.lengths))


def test_int8_kv_prefix_tuning_path():
    """Learned prefix KV quantizes into cache slots [0, n_pre) and decode
    still runs (the PEFT serving path under the int8 cache)."""
    cfg = tiny_test_config(num_hidden_layers=2)
    tc = cfg.text_config
    params = init_model_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    (ids, attn, buf, steps), kw = _gen_inputs(cfg)
    n = 4
    pk = jax.random.normal(
        jax.random.PRNGKey(5),
        (tc.num_hidden_layers, n, tc.num_key_value_heads, tc.head_dim),
        jnp.float32)
    res = generate_jit(params, cfg, ids, attn, None, buf, steps,
                       jax.random.PRNGKey(1), prefix_kv=(pk, pk * 0.5),
                       kv_dtype="int8", **kw)
    assert np.isfinite(np.asarray(res.lengths)).all()
    assert int(res.steps) > 0


def test_int8_kv_api_end_to_end(tmp_path):
    import sys
    sys.path.insert(0, "/root/repo/tests")
    from tests.test_api import StubTokenizer
    from unimoe_audio_tpu.api import UniMoEAudio

    cfg = tiny_test_config()
    m = UniMoEAudio(None, tokenizer=StubTokenizer(cfg), allow_random=True,
                    config=cfg, max_tokens=16, min_tokens=4,
                    kv_cache_dtype="int8")
    paths = m.text_to_music("int8 cache tune", output_dir=str(tmp_path),
                            seed=0, do_sample=False)
    assert len(paths) == 1
    from unimoe_audio_tpu.codec import audio_io
    a, _ = audio_io.read_wav(paths[0])
    assert np.isfinite(a).all()


def test_int8_kv_slot_server_matches_standalone_int8():
    """The continuous-batching server with kv_dtype="int8": greedy parity
    vs the same requests decoded standalone with the int8 cache —
    mid-flight admission (splice writes q+scales) and compaction (scale
    buffers roll with k/v) included."""
    from unimoe_audio_tpu.apps.continuous import SlotServer
    import sys
    sys.path.insert(0, "/root/repo/tests")
    from tests.test_continuous import _request, _standalone

    cfg = tiny_test_config(num_hidden_layers=2)
    params = init_model_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    a = _request(cfg, seed=1, max_tokens=14)
    b = _request(cfg, seed=2, max_tokens=9, text_len=5)
    extra = [_request(cfg, seed=10 + i, max_tokens=10) for i in range(3)]
    srv = SlotServer(params, cfg, slots=2, t_text=8, horizon=48,
                     chunk_frames=5, do_sample=False, kv_dtype="int8")
    assert srv.state.cache.quantized
    srv.submit(a)
    srv.step()
    srv.submit(b)
    for r in extra:
        srv.submit(r)   # stream larger than the horizon → compaction
    results = srv.run_until_drained()
    assert srv.compactions >= 1  # the scale buffers rolled with k/v

    def oracle(req):
        buf = pad_buffer(jnp.asarray(req.prefill[None]), req.max_tokens)
        res = generate_jit(
            params, cfg, jnp.asarray(req.input_ids),
            jnp.asarray(req.attention_mask), None, buf,
            jnp.asarray([req.prefill_steps], jnp.int32),
            jax.random.PRNGKey(0), kv_dtype="int8",
            max_tokens=req.max_tokens, min_tokens=jnp.int32(req.min_tokens),
            cfg_scale=jnp.float32(req.cfg_scale),
            temperature=jnp.float32(req.temperature),
            top_p=jnp.float32(req.top_p), cfg_filter_top_k=45,
            eos_prob_mul_factor=jnp.float32(req.eos_prob_mul_factor),
            sample_seeds=jnp.asarray([req.seed], jnp.int32), do_sample=False,
        )
        return np.asarray(res.codes[0]), int(res.lengths[0])

    want = {r.rid: oracle(r) for r in [a, b] + extra}
    assert set(r.rid for r in results) == set(want)
    for r in results:
        codes, length = want[r.rid]
        assert r.length == length, (r.rid, r.length, length)
        np.testing.assert_array_equal(r.codes, codes, err_msg=str(r.rid))
