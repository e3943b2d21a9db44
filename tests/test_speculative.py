"""Speculative decoding: bit-exact greedy equivalence with the baseline
loop (quality equality by construction), acceptance-path coverage."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from unimoe_audio_tpu.codec import delay as dl
from unimoe_audio_tpu.config import tiny_test_config
from unimoe_audio_tpu.generate.loop import generate_jit, pad_buffer
from unimoe_audio_tpu.generate.speculative import speculative_generate_jit
from unimoe_audio_tpu.models.model import init_model_params


def _setup(max_tokens=40, min_tokens=4):
    cfg = tiny_test_config()
    params = init_model_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    ids = jnp.asarray(
        np.random.default_rng(0).integers(1, 50, size=(2, 8)), jnp.int32)
    attn = jnp.ones((2, 8), jnp.int32)
    prefill, steps = dl.prepare_audio_prompt(
        [None], num_channels=cfg.codec_channels,
        bos_value=cfg.codec_bos_value, delay_pattern=cfg.codec_delay_pattern)
    buf = pad_buffer(prefill, max_tokens)
    return cfg, params, ids, attn, buf, jnp.asarray(steps, jnp.int32)


def _baseline(cfg, params, ids, attn, buf, steps, max_tokens, min_tokens):
    # decode_emit=False: the general cache-attention arithmetic, which the
    # speculative verify's multi-frame chunks are bit-identical to (the
    # emit fast path rounds bf16 in a different op order).
    return generate_jit(
        params, cfg, ids, attn, None, buf, steps, jax.random.PRNGKey(1),
        max_tokens=max_tokens, min_tokens=jnp.int32(min_tokens),
        cfg_scale=jnp.float32(3.0), temperature=jnp.float32(1.0),
        top_p=jnp.float32(1.0), cfg_filter_top_k=10,
        eos_prob_mul_factor=jnp.float32(0.8), do_sample=False,
        decode_emit=False,
    )


@pytest.mark.parametrize("draft_layers,spec_len", [
    (None, 4),   # draft == full model: every draft accepted
    (1, 4),      # weak draft: rejection/rollback path dominates
    (2, 3),
])
def test_speculative_matches_baseline_greedy(draft_layers, spec_len):
    max_tokens, min_tokens = 40, 4
    cfg, params, ids, attn, buf, steps = _setup(max_tokens, min_tokens)
    dl_layers = draft_layers or cfg.text_config.num_hidden_layers

    base = _baseline(cfg, params, ids, attn, buf, steps, max_tokens, min_tokens)
    spec = speculative_generate_jit(
        params, cfg, ids, attn, None, buf, steps,
        max_tokens=max_tokens, min_tokens=jnp.int32(min_tokens),
        cfg_scale=jnp.float32(3.0), eos_prob_mul_factor=jnp.float32(0.8),
        spec_len=spec_len, draft_layers=dl_layers,
    )
    np.testing.assert_array_equal(np.asarray(spec.codes), np.asarray(base.codes))
    np.testing.assert_array_equal(np.asarray(spec.lengths), np.asarray(base.lengths))
    rate = float(spec.accept_rate)
    if draft_layers is None:
        # A perfect draft must be fully accepted (the acceptance machinery
        # is exercised, not bypassed).
        assert rate > 0.99, rate
    assert float(spec.cycles) >= 1


def test_speculative_fewer_cycles_with_good_draft():
    """A perfect draft advances spec_len frames per full forward."""
    max_tokens, min_tokens = 40, 40  # no EOS: pure throughput measurement
    cfg, params, ids, attn, buf, steps = _setup(max_tokens, min_tokens)
    L = cfg.text_config.num_hidden_layers
    spec = speculative_generate_jit(
        params, cfg, ids, attn, None, buf, steps,
        max_tokens=max_tokens, min_tokens=jnp.int32(min_tokens),
        cfg_scale=jnp.float32(3.0), eos_prob_mul_factor=jnp.float32(1.0),
        spec_len=4, draft_layers=L,
    )
    frames = int(spec.frames)
    cycles = int(spec.cycles)
    assert frames / cycles > 2.5, (frames, cycles)  # ~4 frames per full fwd


def test_api_speculative_t2m_matches_greedy(tmp_path):
    """UniMoEAudio.text_to_music_speculative == text_to_music greedy."""
    import sys
    sys.path.insert(0, "/root/repo/tests")
    from test_api import StubTokenizer
    from unimoe_audio_tpu.api import UniMoEAudio
    from unimoe_audio_tpu.codec import audio_io

    cfg = tiny_test_config()
    m = UniMoEAudio(None, allow_random=True, config=cfg,
                    tokenizer=StubTokenizer(cfg), max_tokens=16, min_tokens=4)
    spec = m.text_to_music_speculative(
        "melody", output_dir=str(tmp_path / "s"), spec_len=3, draft_layers=2)
    base = m.text_to_music("melody", output_dir=str(tmp_path / "b"),
                           do_sample=False, seed=0, decode_emit=False)
    a, _ = audio_io.read_wav(spec[0])
    b, _ = audio_io.read_wav(base[0])
    n = min(a.shape[-1], b.shape[-1])
    np.testing.assert_allclose(a[..., :n], b[..., :n], atol=1e-6)
