"""LoRA adapter tests: zero-init identity, adapter-only training, merge."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from unimoe_audio_tpu.config import tiny_test_config
from unimoe_audio_tpu.models.model import init_model_params, model_forward
from unimoe_audio_tpu.train.lora import add_lora, merge_lora
from unimoe_audio_tpu.train.step import init_train_state, make_optimizer, train_step


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_test_config()
    params = init_model_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    return cfg, params


def test_lora_zero_init_is_identity(setup):
    cfg, params = setup
    lparams = add_lora(params, jax.random.PRNGKey(1), rank=4)
    assert "lora_a" in lparams["layers"]["attn"]["q_proj"]
    ids = jnp.ones((1, 6), dtype=jnp.int32)
    base = model_forward(params, cfg, ids)
    with_lora = model_forward(lparams, cfg, ids)
    np.testing.assert_allclose(
        np.asarray(base.codec_logits), np.asarray(with_lora.codec_logits),
        rtol=1e-6,
    )


def test_lora_only_training_and_merge(setup):
    cfg, params = setup
    lparams = add_lora(params, jax.random.PRNGKey(1), rank=4)
    opt = make_optimizer(learning_rate=5e-2, total_steps=4, warmup_steps=0,
                         trainable_pattern=r"lora_")
    state = init_train_state(lparams, opt)
    rng = np.random.default_rng(0)
    codec = rng.integers(0, cfg.codec_eos_value,
                         size=(2, 8, cfg.codec_channels)).astype(np.int32)
    batch = {
        "input_ids": jnp.full((2, 8), cfg.codec_placeholder_value, jnp.int32),
        "codec_input_ids": jnp.asarray(codec),
        "attention_mask": jnp.ones((2, 8), jnp.int32),
        "codec_labels": jnp.asarray(codec),
    }
    for i in range(2):
        state, metrics = train_step(state, batch, jax.random.PRNGKey(i),
                                    cfg=cfg, optimizer=opt, remat=False)
    new = state.params
    # Adapters moved; base weights did not.
    b_moved = float(jnp.abs(
        new["layers"]["attn"]["q_proj"]["lora_b"]
        - lparams["layers"]["attn"]["q_proj"]["lora_b"]).max())
    w_moved = float(jnp.abs(
        new["layers"]["attn"]["q_proj"]["w"]
        - lparams["layers"]["attn"]["q_proj"]["w"]).max())
    assert b_moved > 0 and w_moved == 0

    # Merge: merged plain weights reproduce adapter outputs.
    ids = jnp.ones((1, 6), dtype=jnp.int32)
    out_adapter = model_forward(new, cfg, ids)
    merged = merge_lora(new)
    assert "lora_a" not in merged["layers"]["attn"]["q_proj"]
    out_merged = model_forward(merged, cfg, ids)
    np.testing.assert_allclose(
        np.asarray(out_adapter.codec_logits), np.asarray(out_merged.codec_logits),
        rtol=1e-4, atol=1e-5,
    )
