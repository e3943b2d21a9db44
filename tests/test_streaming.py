"""Streaming generation tests: chunked decode equals single-shot decode,
incremental frames concatenate to the full output."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from unimoe_audio_tpu.codec import delay as dl
from unimoe_audio_tpu.config import tiny_test_config
from unimoe_audio_tpu.generate.loop import generate_jit, pad_buffer
from unimoe_audio_tpu.generate.streaming import generate_stream
from unimoe_audio_tpu.models import model as M


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_test_config()
    params = M.init_model_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    return cfg, params


def test_stream_matches_single_shot(setup):
    cfg, params = setup
    B, T_text, max_tokens = 1, 7, 24
    rng_np = np.random.default_rng(0)
    ids = jnp.asarray(rng_np.integers(0, 200, size=(2 * B, T_text)))
    attn = jnp.ones((2 * B, T_text), dtype=jnp.int32)
    key = jax.random.PRNGKey(3)
    common = dict(
        max_tokens=max_tokens, min_tokens=5, cfg_scale=1.0, temperature=1.0,
        top_p=0.9, cfg_filter_top_k=8, eos_prob_mul_factor=1.0, do_sample=True,
    )

    chunks = list(generate_stream(
        params, cfg, ids, attn, None, key, chunk_frames=7, **common,
    ))
    assert chunks[-1]["done"]
    streamed = np.concatenate([c["frames"] for c in chunks], axis=1)

    # Single-shot with the same rng.
    prefill, steps = dl.prepare_audio_prompt(
        [None] * B, num_channels=cfg.codec_channels,
        bos_value=cfg.codec_bos_value, delay_pattern=cfg.codec_delay_pattern,
    )
    res = generate_jit(
        params, cfg, ids, attn, None, pad_buffer(prefill, max_tokens),
        jnp.asarray(steps, jnp.int32), key,
        max_tokens=max_tokens, min_tokens=jnp.int32(5),
        cfg_scale=jnp.float32(1.0), temperature=jnp.float32(1.0),
        top_p=jnp.float32(0.9), cfg_filter_top_k=8,
        eos_prob_mul_factor=jnp.float32(1.0), do_sample=True,
    )
    full = np.asarray(dl.revert_audio_delay(
        res.codes, pad_value=cfg.codec_pad_value,
        delay_pattern=cfg.codec_delay_pattern,
    ))
    n = streamed.shape[1]
    np.testing.assert_array_equal(streamed, full[:, :n])
    # Streaming covers everything the single shot produced (pre-revert tail
    # of max_delay is PAD in both).
    assert n >= int(res.steps) - cfg.max_delay


def test_stream_audio_chunks(setup):
    cfg, params = setup
    from unimoe_audio_tpu.codec.dac import tiny_dac_config
    from unimoe_audio_tpu.codec.dac_wrapper import Dac
    import dataclasses

    dac_cfg = dataclasses.replace(tiny_dac_config(), n_codebooks=cfg.codec_channels)
    dac = Dac(allow_random=True, config=dac_cfg)
    B, T_text = 1, 7
    ids = jnp.asarray(np.random.default_rng(1).integers(0, 200, size=(2 * B, T_text)))
    attn = jnp.ones((2 * B, T_text), dtype=jnp.int32)
    got_audio = 0
    for chunk in generate_stream(
        params, cfg, ids, attn, None, jax.random.PRNGKey(5),
        max_tokens=16, min_tokens=4, chunk_frames=6, dac=dac,
        cfg_scale=0.0, temperature=1.0, top_p=1.0, cfg_filter_top_k=8,
        eos_prob_mul_factor=1.0,
    ):
        if "audio" in chunk and chunk["frames"].shape[1]:
            assert chunk["audio"].shape[-1] == chunk["frames"].shape[1] * dac_cfg.hop_length
            got_audio += chunk["audio"].shape[-1]
    assert got_audio > 0
