"""Delay-pattern op tests: round-trip + semantics vs a straightforward
numpy oracle of the reference math (utils/UniMoE_Audio_utils.py:137-325)."""

import numpy as np
import jax.numpy as jnp
import pytest

from unimoe_audio_tpu.codec import delay as dl


DELAY = [0, 2, 3, 5]


def np_apply_delay(audio, pad, bos, delay):
    B, T, C = audio.shape
    out = np.empty_like(audio)
    for b in range(B):
        for t in range(T):
            for c in range(C):
                src = t - delay[c]
                out[b, t, c] = bos if src < 0 else (pad if src >= T else audio[b, src, c])
    return out


def np_revert_delay(audio, pad, delay):
    B, T, C = audio.shape
    out = np.empty_like(audio)
    for b in range(B):
        for t in range(T):
            for c in range(C):
                src = t + delay[c]
                out[b, t, c] = pad if src >= T else audio[b, src, c]
    return out


def test_apply_matches_oracle():
    rng = np.random.default_rng(0)
    audio = rng.integers(0, 100, size=(2, 11, 4)).astype(np.int32)
    got = np.asarray(dl.apply_audio_delay(jnp.asarray(audio), pad_value=-7, bos_value=99, delay_pattern=DELAY))
    want = np_apply_delay(audio, -7, 99, DELAY)
    np.testing.assert_array_equal(got, want)


def test_revert_matches_oracle():
    rng = np.random.default_rng(1)
    audio = rng.integers(0, 100, size=(3, 9, 4)).astype(np.int32)
    got = np.asarray(dl.revert_audio_delay(jnp.asarray(audio), pad_value=-3, delay_pattern=DELAY))
    want = np_revert_delay(audio, -3, DELAY)
    np.testing.assert_array_equal(got, want)


def test_round_trip_identity():
    """revert(apply(x)) == x on the region unaffected by padding."""
    rng = np.random.default_rng(2)
    T, max_d = 20, max(DELAY)
    audio = rng.integers(0, 50, size=(2, T, 4)).astype(np.int32)
    delayed = dl.apply_audio_delay(jnp.asarray(audio), pad_value=-1, bos_value=-2, delay_pattern=DELAY)
    back = np.asarray(dl.revert_audio_delay(delayed, pad_value=-1, delay_pattern=DELAY))
    np.testing.assert_array_equal(back[:, : T - max_d, :], audio[:, : T - max_d, :])


def test_prepare_audio_prompt():
    prompt = np.arange(12).reshape(3, 4).astype(np.int32)
    delayed, steps = dl.prepare_audio_prompt(
        [None, prompt], num_channels=4, bos_value=42, delay_pattern=DELAY
    )
    assert steps == [1, 4]
    max_len = 3 + max(DELAY) + 1
    assert delayed.shape == (2, max_len, 4)
    d = np.asarray(delayed)
    # Channel c is BOS for the first delay[c]+1 steps (BOS row shifted + BOS fill).
    for c, dc in enumerate(DELAY):
        assert (d[:, : dc + 1, c] == 42).all()
    # Sample 1 channel 0 carries the prompt immediately after BOS.
    np.testing.assert_array_equal(d[1, 1:4, 0], prompt[:, 0])


def test_preprocess_codec_layout():
    codec = np.arange(20).reshape(5, 4)
    out = dl.preprocess_codec(
        codec, delay_pattern=DELAY, num_channels=4, bos_value=90, eos_value=91, pad_value=92
    )
    assert out.shape == (5 + max(DELAY) + 1, 4)
    for c, dc in enumerate(DELAY):
        start = dc + 1
        assert (out[:start, c] == 90).all()
        np.testing.assert_array_equal(out[start : start + 5, c], codec[:, c])
        if start + 5 < out.shape[0]:
            assert out[start + 5, c] == 91
            assert (out[start + 6 :, c] == 92).all()


def test_generate_output_strips_delay_and_slices():
    rng = np.random.default_rng(3)
    codes = rng.integers(0, 50, size=(2, 15, 4)).astype(np.int32)
    outs = dl.generate_output(
        jnp.asarray(codes), jnp.asarray([5, 9]), pad_value=-1, delay_pattern=DELAY
    )
    assert outs[0].shape == (5, 4) and outs[1].shape == (9, 4)
    want = np_revert_delay(codes, -1, DELAY)[:, : 15 - max(DELAY), :]
    np.testing.assert_array_equal(outs[1], want[1, :9])


def test_flagship_delay_pattern_round_trip():
    """The shipped 12-channel pattern [0,8..18] (utils/config.json:9-22)."""
    pattern = [0, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18]
    rng = np.random.default_rng(9)
    T, C = 60, 12
    audio = rng.integers(0, 1024, size=(2, T, C)).astype(np.int32)
    delayed = dl.apply_audio_delay(jnp.asarray(audio), pad_value=1025,
                                   bos_value=1026, delay_pattern=pattern)
    back = np.asarray(dl.revert_audio_delay(delayed, pad_value=1025,
                                            delay_pattern=pattern))
    np.testing.assert_array_equal(back[:, : T - 18], audio[:, : T - 18])
    # BOS run-in length equals each channel's delay.
    d = np.asarray(delayed)
    for c, dc in enumerate(pattern):
        assert (d[:, :dc, c] == 1026).all()
