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
