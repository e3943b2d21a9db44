"""Model-stack tests: forward shapes, KV-cache decode == full recompute,
mRoPE degeneracy, loss path (reference model:
utils/UniMoE_Audio_model.py:296-871)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from unimoe_audio_tpu.config import tiny_test_config
from unimoe_audio_tpu.models import model as M
from unimoe_audio_tpu.models.layers import KVCache, compute_mrope


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_test_config()
    params = M.init_model_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    return cfg, params


def test_mrope_text_only_equals_1d_rope(setup):
    cfg, _ = setup
    tc = cfg.text_config
    pos1d = jnp.arange(10)[None]  # [1, 10]
    pos3d = jnp.broadcast_to(pos1d[None], (3, 1, 10))
    cos, sin = compute_mrope(pos3d, tc.head_dim, tc.rope_theta, tc.mrope_section)
    # All-equal rows ⇒ the sectioned pick must equal plain RoPE angles.
    half = tc.head_dim // 2
    inv_freq = 1.0 / (tc.rope_theta ** (np.arange(half) / half))
    ang = np.asarray(pos1d)[0][:, None] * inv_freq
    want = np.concatenate([ang, ang], axis=-1)
    np.testing.assert_allclose(np.asarray(cos)[0], np.cos(want), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sin)[0], np.sin(want), rtol=1e-5, atol=1e-6)


def test_forward_shapes_and_finite(setup):
    cfg, params = setup
    B, T = 2, 10
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, T), 0, cfg.text_config.vocab_size)
    out = M.model_forward(params, cfg, ids, compute_lm_logits=True)
    assert out.logits.shape == (B, T, cfg.text_config.vocab_size)
    assert out.codec_logits.shape == (B, T, cfg.codec_channels, cfg.codec_embed_size)
    assert np.isfinite(np.asarray(out.codec_logits)).all()
    assert out.router_top_k.shape == (cfg.text_config.num_hidden_layers, B * T)


def test_codec_placeholder_scatter(setup):
    cfg, params = setup
    B, T, C = 1, 6, cfg.codec_channels
    ids = jnp.full((B, T), 5, dtype=jnp.int32).at[0, 2].set(cfg.codec_placeholder_value)
    codec = jnp.ones((B, T, C), dtype=jnp.int32)
    emb = M.calculate_input_embedding(params, ids, codec, cfg.codec_placeholder_value)
    want_codec = M.codec_embedding(params, jnp.ones((C,), dtype=jnp.int32))
    np.testing.assert_allclose(np.asarray(emb[0, 2]), np.asarray(want_codec), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(emb[0, 1]), np.asarray(params["embed_tokens"][5]), rtol=1e-5
    )


def test_align_codec_ids():
    cfg = tiny_test_config()
    ids = np.array([[1, cfg.codec_placeholder_value, 2, cfg.codec_placeholder_value]])
    flat = np.array([[1, 2, 3, 4], [5, 6, 7, 8]])
    aligned = M.align_codec_ids(ids, flat, cfg.codec_placeholder_value)
    np.testing.assert_array_equal(aligned[0, 1], flat[0])
    np.testing.assert_array_equal(aligned[0, 3], flat[1])
    assert (aligned[0, 0] == 0).all()


def test_kv_cache_decode_matches_full_forward(setup):
    """Incremental decode through the cache must equal the no-cache full
    forward on the same sequence (the reference's use_cache=False fallback,
    utils/UniMoE_Audio_model.py:964-979)."""
    cfg, params = setup
    tc = cfg.text_config
    B, T = 2, 8
    rng = jax.random.PRNGKey(3)
    embeds = jax.random.normal(rng, (B, T, tc.hidden_size), dtype=jnp.float32) * 0.1
    pos = jnp.broadcast_to(jnp.arange(T)[None, None], (3, B, T))

    full = M.text_model_forward(params, embeds, pos, tc)

    T_max = T + 2
    cache = KVCache.create(tc.num_hidden_layers, B, T_max, tc.num_key_value_heads,
                           tc.head_dim, dtype=jnp.float32)
    # Prefill first 5, then decode 3 single steps.
    kv_valid = jnp.zeros((B, T_max), jnp.int32).at[:, :5].set(1)
    out = M.text_model_forward(
        params, embeds[:, :5], pos[:, :, :5], tc,
        kv_cache=cache, cache_position=jnp.int32(0), kv_valid_mask=kv_valid,
    )
    cache = out.kv_cache
    hiddens = [out.last_hidden_state]
    for t in range(5, T):
        kv_valid = jnp.zeros((B, T_max), jnp.int32).at[:, : t + 1].set(1)
        out = M.text_model_forward(
            params, embeds[:, t : t + 1], pos[:, :, t : t + 1], tc,
            kv_cache=cache, cache_position=jnp.int32(t), kv_valid_mask=kv_valid,
        )
        cache = out.kv_cache
        hiddens.append(out.last_hidden_state)
    inc = jnp.concatenate(hiddens, axis=1)
    np.testing.assert_allclose(
        np.asarray(full.last_hidden_state), np.asarray(inc), rtol=2e-4, atol=2e-4
    )


def test_codec_loss_path(setup):
    cfg, params = setup
    B, T, C = 2, 8, cfg.codec_channels
    ids = jnp.full((B, T), cfg.codec_placeholder_value, dtype=jnp.int32)
    codec = jax.random.randint(jax.random.PRNGKey(5), (B, T, C), 0, cfg.codec_eos_value)
    labels = codec.at[:, :2].set(-100)
    out = M.model_forward(
        params, cfg, ids, codec_input_ids=codec, codec_labels=labels,
        aux_loss_weight=0.025,
    )
    assert np.isfinite(float(out.loss))
    assert float(out.codec_loss) > 0
    # Channels all -100 contribute zero: set channel 2 labels to -100.
    labels2 = labels.at[:, :, 2].set(-100)
    out2 = M.model_forward(
        params, cfg, ids, codec_input_ids=codec, codec_labels=labels2,
        aux_loss_weight=0.025,
    )
    assert float(out2.codec_loss) < float(out.codec_loss)


def test_sliding_window_layers():
    """layer_types sliding_attention restricts attention to the window
    (reference mask mapping, utils/UniMoE_Audio_model.py:370-383)."""
    import dataclasses

    # One layer: with >1 windowed layers, information flows past the window
    # through intermediate positions, so truncation equivalence only holds
    # for a single layer.
    cfg = tiny_test_config(num_hidden_layers=1)
    tc = dataclasses.replace(
        cfg.text_config, use_sliding_window=True, sliding_window=3,
        layer_types=("sliding_attention",),
    )
    params = M.init_model_params(
        jax.random.PRNGKey(0), dataclasses.replace(cfg, text_config=tc),
        dtype=jnp.float32,
    )
    T = 10
    emb = jax.random.normal(jax.random.PRNGKey(1), (1, T, tc.hidden_size)) * 0.1
    pos = jnp.broadcast_to(jnp.arange(T)[None, None], (3, 1, T))
    out_win = M.text_model_forward(params, emb, pos, tc)

    # Full attention over only the last 3 positions must equal the windowed
    # result at the last position... instead verify: truncating the inputs
    # to the window reproduces the final hidden state exactly.
    emb_tail = emb[:, T - 3:]
    pos_tail = pos[:, :, T - 3:]
    out_tail = M.text_model_forward(params, emb_tail, pos_tail, tc)
    np.testing.assert_allclose(
        np.asarray(out_win.last_hidden_state[:, -1]),
        np.asarray(out_tail.last_hidden_state[:, -1]),
        rtol=2e-4, atol=2e-5,
    )
    # And differs from the non-windowed model.
    tc_full = dataclasses.replace(tc, use_sliding_window=False, layer_types=None)
    out_full = M.text_model_forward(params, emb, pos, tc_full)
    assert not np.allclose(
        np.asarray(out_win.last_hidden_state[:, -1]),
        np.asarray(out_full.last_hidden_state[:, -1]), atol=1e-4,
    )
