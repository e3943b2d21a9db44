"""DAC codec tests: JAX convs vs torch semantics, full encoder/RVQ/decoder
vs a torch oracle with shared weights, wav I/O round trip."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F
import pytest

from unimoe_audio_tpu.codec import audio_io
from unimoe_audio_tpu.codec.dac import (
    DACConfig, conv1d, conv_transpose1d, dac_decode, dac_encode,
    init_dac_params, snake, tiny_dac_config,
)


def test_conv1d_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 3, 20)).astype(np.float32)
    w = rng.normal(size=(5, 3, 7)).astype(np.float32)
    b = rng.normal(size=(5,)).astype(np.float32)
    for stride, pad, dil in [(1, 3, 1), (2, 3, 1), (1, 9, 3), (4, 2, 1)]:
        got = np.asarray(conv1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                                stride=stride, padding=pad, dilation=dil))
        want = F.conv1d(torch.tensor(x), torch.tensor(w), torch.tensor(b),
                        stride=stride, padding=pad, dilation=dil).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_conv_transpose1d_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 4, 15)).astype(np.float32)
    for in_ch, out_ch, k, stride in [(4, 3, 16, 8), (4, 2, 10, 5), (4, 4, 8, 4), (4, 3, 4, 2)]:
        w = rng.normal(size=(in_ch, out_ch, k)).astype(np.float32)
        b = rng.normal(size=(out_ch,)).astype(np.float32)
        pad = math.ceil(stride / 2)
        opad = stride % 2
        got = np.asarray(conv_transpose1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                                          stride=stride, padding=pad, output_padding=opad))
        want = F.conv_transpose1d(torch.tensor(x), torch.tensor(w), torch.tensor(b),
                                  stride=stride, padding=pad, output_padding=opad).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_snake_matches_reference_formula():
    x = np.linspace(-3, 3, 24, dtype=np.float32).reshape(1, 2, 12)
    alpha = np.array([0.5, 2.0], dtype=np.float32).reshape(1, 2, 1)
    got = np.asarray(snake(jnp.asarray(x), jnp.asarray(alpha)))
    want = x + (1.0 / (alpha + 1e-9)) * np.sin(alpha * x) ** 2
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# Torch oracle of the DAC forward (descript-audio-codec structure)
# ---------------------------------------------------------------------------

def t_conv(x, w, b, stride=1, padding=0, dilation=1):
    return F.conv1d(x, w, b, stride=stride, padding=padding, dilation=dilation)


def t_snake(x, alpha):
    return x + (1.0 / (alpha + 1e-9)) * torch.sin(alpha * x) ** 2


def t_res_unit(p, x, dil):
    y = t_snake(x, p["snake1_alpha"])
    y = t_conv(y, p["conv1_w"], p["conv1_b"], padding=((7 - 1) * dil) // 2, dilation=dil)
    y = t_snake(y, p["snake2_alpha"])
    y = t_conv(y, p["conv2_w"], p["conv2_b"])
    return x + y


def torch_dac_encode(params, audio, cfg):
    p = params["encoder"]
    x = t_conv(audio, p["conv_in_w"], p["conv_in_b"], padding=3)
    for bi, stride in enumerate(cfg.encoder_rates):
        bp = p["blocks"][bi]
        for i, dil in enumerate((1, 3, 9)):
            x = t_res_unit(bp["res"][i], x, dil)
        x = t_snake(x, bp["snake_alpha"])
        x = t_conv(x, bp["conv_w"], bp["conv_b"], stride=stride, padding=math.ceil(stride / 2))
    x = t_snake(x, p["snake_out_alpha"])
    z = t_conv(x, p["conv_out_w"], p["conv_out_b"], padding=1)

    residual = z
    codes = []
    for i in range(cfg.n_codebooks):
        q = params["quantizer"]["quantizers"][i]
        z_e = t_conv(residual, q["in_proj_w"], q["in_proj_b"])
        enc = z_e.transpose(1, 2)
        enc_n = F.normalize(enc, dim=-1)
        cb_n = F.normalize(q["codebook"], dim=-1)
        sim = enc_n @ cb_n.T
        idx = sim.argmax(dim=-1)
        codes.append(idx)
        z_q = q["codebook"][idx].transpose(1, 2)
        residual = residual - t_conv(z_q, q["out_proj_w"], q["out_proj_b"])
    return torch.stack(codes, dim=1)


def torch_dac_decode(params, codes, cfg):
    z_q = None
    for i in range(cfg.n_codebooks):
        q = params["quantizer"]["quantizers"][i]
        z_p = q["codebook"][codes[:, i]].transpose(1, 2)
        z = t_conv(z_p, q["out_proj_w"], q["out_proj_b"])
        z_q = z if z_q is None else z_q + z
    p = params["decoder"]
    x = t_conv(z_q, p["conv_in_w"], p["conv_in_b"], padding=3)
    for bi, stride in enumerate(cfg.decoder_rates):
        bp = p["blocks"][bi]
        x = t_snake(x, bp["snake_alpha"])
        x = F.conv_transpose1d(x, bp["convt_w"], bp["convt_b"], stride=stride,
                               padding=math.ceil(stride / 2), output_padding=stride % 2)
        for i, dil in enumerate((1, 3, 9)):
            x = t_res_unit(bp["res"][i], x, dil)
    x = t_snake(x, p["snake_out_alpha"])
    x = t_conv(x, p["conv_out_w"], p["conv_out_b"], padding=3)
    return torch.tanh(x)


@pytest.fixture(scope="module")
def dac_setup():
    cfg = tiny_dac_config()
    params = init_dac_params(jax.random.PRNGKey(7), cfg)
    tparams = jax.tree.map(lambda a: torch.tensor(np.asarray(a)), params)
    return cfg, params, tparams


def test_dac_encode_matches_torch_oracle(dac_setup):
    cfg, params, tparams = dac_setup
    rng = np.random.default_rng(3)
    T = cfg.hop_length * 20
    audio = rng.normal(size=(2, 1, T)).astype(np.float32) * 0.3
    got = np.asarray(dac_encode(params, jnp.asarray(audio), cfg))
    want = torch_dac_encode(tparams, torch.tensor(audio), cfg).numpy()
    assert got.shape == (2, cfg.n_codebooks, 20)
    agree = (got == want).mean()
    assert agree > 0.99, f"code agreement {agree}"  # ties may differ


def test_dac_decode_matches_torch_oracle(dac_setup):
    cfg, params, tparams = dac_setup
    rng = np.random.default_rng(4)
    codes = rng.integers(0, cfg.codebook_size, size=(2, cfg.n_codebooks, 16))
    got = np.asarray(dac_decode(params, jnp.asarray(codes), cfg))
    want = torch_dac_decode(tparams, torch.tensor(codes), cfg).numpy()
    assert got.shape == (2, 1, 16 * cfg.hop_length)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_dac_roundtrip_shapes(dac_setup):
    cfg, params, _ = dac_setup
    audio = jnp.asarray(np.random.default_rng(5).normal(size=(1, 1, 999)).astype(np.float32))
    codes = dac_encode(params, audio, cfg)
    Tf = int(np.ceil(999 / cfg.hop_length))
    assert codes.shape == (1, cfg.n_codebooks, Tf)
    wave = dac_decode(params, codes, cfg)
    assert wave.shape == (1, 1, Tf * cfg.hop_length)


def test_wav_io_roundtrip(tmp_path):
    sr = 16000
    t = np.linspace(0, 1, sr, dtype=np.float32)
    audio = (0.5 * np.sin(2 * np.pi * 440 * t))[None]
    path = str(tmp_path / "test.wav")
    audio_io.write_wav(path, audio, sr)
    back, sr2 = audio_io.read_wav(path)
    assert sr2 == sr and back.shape == audio.shape
    np.testing.assert_allclose(back, audio, atol=1e-3)


def test_resample_preserves_tone(tmp_path):
    sr_from, sr_to = 44100, 16000
    t = np.linspace(0, 1, sr_from, dtype=np.float32)
    audio = np.sin(2 * np.pi * 440 * t)[None]
    out = audio_io.resample(audio, sr_from, sr_to)
    assert abs(out.shape[-1] - sr_to) <= 2
    # Dominant FFT bin still ~440 Hz.
    spec = np.abs(np.fft.rfft(out[0]))
    freq = np.fft.rfftfreq(out.shape[-1], 1 / sr_to)
    assert abs(freq[np.argmax(spec)] - 440) < 5


def test_encode_array_matches_encode(tmp_path, dac_setup):
    cfg, params, _ = dac_setup
    from unimoe_audio_tpu.codec.dac_wrapper import Dac
    d = Dac(allow_random=True, config=cfg)
    d.params = params
    sr = cfg.sample_rate
    t = np.linspace(0, 0.2, int(sr * 0.2), dtype=np.float32)
    wav = 0.4 * np.sin(2 * np.pi * 250 * t)
    path = str(tmp_path / "a.wav")
    audio_io.write_wav(path, wav[None], sr)
    via_file = np.asarray(d.encode(path))
    via_array = d.encode_array(np.asarray(audio_io.read_wav(path)[0]), sr)
    np.testing.assert_array_equal(via_file, via_array)
