"""Native hostlib tests: C++ kernels vs numpy/scipy references."""

import numpy as np
import pytest

from unimoe_audio_tpu.codec import native


def test_native_builds():
    assert native.available(), "hostlib.so failed to build (g++ required)"


def test_pcm_round_trip():
    rng = np.random.default_rng(0)
    audio = rng.uniform(-0.9, 0.9, size=4096).astype(np.float32)
    pcm = native.f32_to_pcm16(audio)
    assert pcm.dtype == np.dtype("<i2")
    back = native.pcm16_to_f32(pcm)
    # encode ×32767 / decode ÷32768 asymmetry bounds error at ~a·3e-5 + ½LSB
    np.testing.assert_allclose(back, audio, atol=1e-4)
    # clipping
    loud = np.array([1.5, -1.5], dtype=np.float32)
    np.testing.assert_array_equal(native.f32_to_pcm16(loud), [32767, -32767])


def test_mixdown():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1000, 2)).astype(np.float32)
    np.testing.assert_allclose(native.mixdown(x), x.mean(-1), rtol=1e-6)


def test_resample_matches_scipy_class():
    """Native polyphase vs scipy.resample_poly: same length, tone preserved,
    close waveform (different windows ⇒ not bit-identical)."""
    from scipy.signal import resample_poly

    sr_from, sr_to = 44100, 16000
    t = np.arange(int(sr_from * 0.5)) / sr_from
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    got = native.resample(x, sr_from, sr_to)
    want = resample_poly(x, 160, 441).astype(np.float32)
    assert abs(len(got) - len(want)) <= 1
    n = min(len(got), len(want))
    # dominant frequency preserved
    spec = np.abs(np.fft.rfft(got[:n]))
    freq = np.fft.rfftfreq(n, 1 / sr_to)
    assert abs(freq[spec.argmax()] - 440) < 5
    # mid-section waveform close (edges differ by filter transients)
    lo, hi = n // 4, 3 * n // 4
    err = np.abs(got[lo:hi] - want[lo:hi]).max()
    assert err < 0.02, err


def test_collate_pad():
    seqs = [np.array([1, 2, 3]), np.array([4]), np.array([5, 6])]
    out = native.collate_pad(seqs, pad_value=-1)
    np.testing.assert_array_equal(out, [[1, 2, 3], [4, -1, -1], [5, 6, -1]])
    out2 = native.collate_pad(seqs, pad_value=0, max_len=2)
    np.testing.assert_array_equal(out2, [[1, 2], [4, 0], [5, 6]])
