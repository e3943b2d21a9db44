"""Blockwise 8-bit Adam-moment quantization (train/qmoment.py) and the
StreamTrainer moment_dtype='int8' storage path: error bounds, zero
exactness, training parity with fp32 moments, checkpoint round trip."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from unimoe_audio_tpu.config import tiny_test_config
from unimoe_audio_tpu.models.model import init_model_params
from unimoe_audio_tpu.train.qmoment import (
    BLOCK, dequantize_blockwise, padded_len, quantize_blockwise,
)
from unimoe_audio_tpu.train.stream import StreamTrainer


def _logu(rng, n, lo=1e-9, hi=1.0):
    return np.exp(rng.uniform(np.log(lo), np.log(hi), n)).astype(np.float32)


def test_unsigned_round_trip_error_bound():
    rng = np.random.default_rng(0)
    x = _logu(rng, 4 * BLOCK)  # 9 decades of dynamic range
    q, s = quantize_blockwise(jnp.asarray(x), signed=False)
    back = np.asarray(dequantize_blockwise(q, s, signed=False))
    rel = np.abs(back - x) / x
    assert rel.max() < 0.06, rel.max()


def test_signed_round_trip_error_and_sign():
    rng = np.random.default_rng(1)
    mag = _logu(rng, 4 * BLOCK, lo=1e-5)
    sign = rng.choice([-1.0, 1.0], size=mag.shape).astype(np.float32)
    x = sign * mag
    q, s = quantize_blockwise(jnp.asarray(x), signed=True)
    back = np.asarray(dequantize_blockwise(q, s, signed=True))
    assert np.array_equal(np.sign(back), np.sign(x))
    rel = np.abs(back - x) / np.abs(x)
    assert rel.max() < 0.06, rel.max()


def test_zero_is_exact_and_below_floor_clamps_up():
    x = np.zeros(BLOCK, np.float32)
    x[0] = 1.0          # block absmax
    x[1] = 1e-30        # far below the 2^-40 floor
    q, s = quantize_blockwise(jnp.asarray(x), signed=False)
    back = np.asarray(dequantize_blockwise(q, s, signed=False))
    assert back[0] == pytest.approx(1.0, rel=1e-6)
    assert np.all(back[2:] == 0.0)          # zeros exact
    assert back[1] >= 2.0 ** -40 * 0.9      # clamped UP, never to zero
    # all-zero block: scale 0, codes 0, round trip exact
    q0, s0 = quantize_blockwise(jnp.zeros(BLOCK, jnp.float32), signed=False)
    assert np.all(np.asarray(q0) == 0) and np.asarray(s0)[0] == 0.0
    assert np.all(np.asarray(
        dequantize_blockwise(q0, s0, signed=False)) == 0.0)


def test_second_round_trip_is_stable():
    """Requantizing a dequantized vector (as every optimizer step does)
    stays within ~1.5 quantization steps of the original values."""
    rng = np.random.default_rng(2)
    x = _logu(rng, 2 * BLOCK, lo=1e-7)
    q1, s1 = quantize_blockwise(jnp.asarray(x), signed=False)
    b1 = dequantize_blockwise(q1, s1, signed=False)
    q2, s2 = quantize_blockwise(b1, signed=False)
    b2 = np.asarray(dequantize_blockwise(q2, s2, signed=False))
    rel = np.abs(b2 - x) / x
    assert rel.max() < 0.12, rel.max()


def test_padded_len():
    assert padded_len(1) == BLOCK
    assert padded_len(BLOCK) == BLOCK
    assert padded_len(BLOCK + 1) == 2 * BLOCK
    assert padded_len(0) == BLOCK


# ---------------------------------------------------------------------------
# StreamTrainer integration
# ---------------------------------------------------------------------------

def _batch(cfg, rng, B=2, T=8):
    codec = rng.integers(0, cfg.codec_eos_value, size=(B, T, cfg.codec_channels))
    return {
        "input_ids": jnp.full((B, T), cfg.codec_placeholder_value, jnp.int32),
        "codec_input_ids": jnp.asarray(codec.astype(np.int32)),
        "attention_mask": jnp.ones((B, T), jnp.int32),
        "codec_labels": jnp.asarray(codec.astype(np.int32)),
    }


def _cfg(**kw):
    return tiny_test_config(
        router_jitter_noise=0.0, input_jitter_noise=0.0, **kw)


def test_int8_moments_first_step_is_exact_then_tracks():
    """Step 1 from zero moments is BIT-EXACT vs fp32 (zero codes dequantize
    to exactly 0; the update math runs in fp32 before requantization —
    quantization only affects the STORED state).  Step 2 then diverges
    only within the quantizer's moment-error envelope."""
    cfg = _cfg(num_hidden_layers=2)
    params = init_model_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    a = StreamTrainer(cfg, params, learning_rate=1e-3)
    b = StreamTrainer(cfg, params, learning_rate=1e-3, moment_dtype="int8")
    rng = np.random.default_rng(0)
    batch = _batch(cfg, rng)
    key = jax.random.PRNGKey(7)
    ma = a.train_step(batch, key)
    mb = b.train_step(batch, key)
    np.testing.assert_allclose(ma["loss"], mb["loss"], rtol=1e-6)
    np.testing.assert_allclose(ma["grad_norm"], mb["grad_norm"], rtol=1e-5)
    jax.tree.map(np.testing.assert_array_equal,
                 a.full_params(), b.full_params())

    # Step 2 consumes quantized step-1 moments: bounded relative drift.
    p1 = a.full_params()
    ma2 = a.train_step(batch, key)
    mb2 = b.train_step(batch, key)
    np.testing.assert_allclose(ma2["loss"], mb2["loss"], rtol=1e-5)
    for (path, x), (_, y), (_, p0) in zip(
            jax.tree_util.tree_flatten_with_path(a.full_params())[0],
            jax.tree_util.tree_flatten_with_path(b.full_params())[0],
            jax.tree_util.tree_flatten_with_path(p1)[0]):
        da, db = x - p0, y - p0
        if not np.any(da):
            continue
        # Relative delta error bounded by the Adam-ratio error from ~6%
        # moment noise (+ SR spread); 25% is a loose structural bound.
        err = np.abs(db - da) / np.maximum(np.max(np.abs(da)), 1e-12)
        assert np.max(err) < 0.25, jax.tree_util.keystr(path)


def test_int8_moments_train_and_checkpoint_round_trip(tmp_path):
    cfg = _cfg(num_hidden_layers=2)
    st = StreamTrainer(cfg, rng=jax.random.PRNGKey(3), learning_rate=3e-3,
                       moment_dtype="int8")
    rng = np.random.default_rng(1)
    b = _batch(cfg, rng)
    losses = [st.train_step(b, jax.random.PRNGKey(5))["loss"]
              for _ in range(6)]
    assert losses[-1] < losses[0]

    ckpt = str(tmp_path / "ck")
    st.save(ckpt)
    st2 = StreamTrainer(cfg, restore_dir=ckpt, learning_rate=3e-3,
                        moment_dtype="int8", param_dtype=jnp.float32)
    assert st2.step == st.step
    jax.tree.map(np.testing.assert_array_equal,
                 st.full_params(), st2.full_params())
    m1 = st.train_step(b, jax.random.PRNGKey(9))
    m2 = st2.train_step(b, jax.random.PRNGKey(9))
    np.testing.assert_allclose(m1["loss"], m2["loss"], rtol=1e-6)
    jax.tree.map(np.testing.assert_array_equal,
                 st.full_params(), st2.full_params())

    # moment-format mismatch CONVERTS (int8 checkpoint -> fp32 trainer)
    # instead of raising — the restored trainer resumes at the saved step
    # with dequantized moments (full round trip covered in
    # tests/test_stream.py::test_stream_restore_converts_moment_formats).
    st3 = StreamTrainer(cfg, restore_dir=ckpt, learning_rate=3e-3,
                        param_dtype=jnp.float32)
    assert st3.step == 6   # the checkpoint's step (st took one more since)
    m3 = st3.train_step(b, jax.random.PRNGKey(11))
    assert np.isfinite(m3["loss"])


def test_int8_moments_with_grad_accum():
    cfg = _cfg(num_hidden_layers=2)
    st = StreamTrainer(cfg, rng=jax.random.PRNGKey(3), learning_rate=3e-3,
                       moment_dtype="int8")
    rng = np.random.default_rng(1)
    b1, b2 = _batch(cfg, rng), _batch(cfg, rng)
    m = st.train_step([b1, b2], jax.random.PRNGKey(5))
    assert m["skipped"] == 0.0 and m["micro_batches"] == 2.0
    assert st.step == 1


def test_bad_moment_dtype_rejected():
    cfg = _cfg(num_hidden_layers=2)
    with pytest.raises(ValueError):
        StreamTrainer(cfg, rng=jax.random.PRNGKey(0), moment_dtype="fp8")
    from unimoe_audio_tpu.train.offload import OffloadAdamW

    with pytest.raises(ValueError):
        OffloadAdamW(learning_rate=1e-3, moment_dtype="fp8")


def test_offload_adamw_int8_first_step_exact_then_trains():
    """OffloadAdamW with int8 moments: step 1 is bit-exact vs fp32 (zero
    codes dequantize to exactly 0; update math in fp32 pre-requantize);
    subsequent steps keep training."""
    from unimoe_audio_tpu.train.offload import OffloadAdamW, OffloadTrainer

    cfg = _cfg(num_hidden_layers=2)
    params = init_model_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    copy = lambda: jax.tree.map(jnp.array, params)
    a = OffloadTrainer(cfg, copy(),
                       OffloadAdamW(learning_rate=1e-3), remat=False)
    b = OffloadTrainer(cfg, copy(),
                       OffloadAdamW(learning_rate=1e-3, moment_dtype="int8"),
                       remat=False)
    rng = np.random.default_rng(0)
    batch = _batch(cfg, rng)
    key = jax.random.PRNGKey(7)
    ma = a.train_step(batch, key)
    mb = b.train_step(batch, key)
    np.testing.assert_allclose(ma["loss"], mb["loss"], rtol=1e-6)
    jax.tree.map(
        lambda x, y: np.testing.assert_array_equal(
            np.asarray(x), np.asarray(y)),
        a.state.params, b.state.params)

    losses = [b.train_step(batch, key)["loss"] for _ in range(5)]
    assert losses[-1] < mb["loss"]


def test_offload_adamw_int8_precompile():
    from unimoe_audio_tpu.train.offload import OffloadAdamW

    cfg = _cfg(num_hidden_layers=2)
    params = init_model_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    off = OffloadAdamW(learning_rate=1e-3, moment_dtype="int8")
    assert off.precompile(params) > 0
