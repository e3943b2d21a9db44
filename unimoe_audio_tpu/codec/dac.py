"""DAC neural codec (descript-audio-codec, 16 kHz config) in pure JAX.

The reference delegates codec work to the `dac` pip package
(reference: utils/UniMoE_Audio_utils.py:56-134 — encode wav → 12×T codes,
decode codes → wav).  That package is torch; here the full
encoder / residual-vector-quantizer / decoder stack is reimplemented as
JAX functions over a param pytree, XLA-compiled end to end.

Architecture (16 kHz DAC):
  encoder_dim 64, encoder_rates (2,4,5,8)  → hop 320 ⇒ 50 frames/s
  decoder_dim 1536, decoder_rates (8,5,4,2)
  12 codebooks × 1024 entries × 8 dims, latent dim 1024

Weight-norm convs are stored FOLDED (single `w`); the HF/torch weight
converter folds g·v/‖v‖ at load time.  Conv weights keep torch layout
[out, in, k] (transposed convs: [in, out, k]) so conversion is a pure copy.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class DACConfig:
    encoder_dim: int = 64
    encoder_rates: Tuple[int, ...] = (2, 4, 5, 8)
    decoder_dim: int = 1536
    decoder_rates: Tuple[int, ...] = (8, 5, 4, 2)
    n_codebooks: int = 12
    codebook_size: int = 1024
    codebook_dim: int = 8
    sample_rate: int = 16000

    @property
    def hop_length(self) -> int:
        return int(np.prod(self.encoder_rates))

    @property
    def latent_dim(self) -> int:
        return self.encoder_dim * (2 ** len(self.encoder_rates))


def tiny_dac_config() -> DACConfig:
    """Miniature DAC for tests."""
    return DACConfig(
        encoder_dim=8, encoder_rates=(2, 4), decoder_dim=32, decoder_rates=(4, 2),
        n_codebooks=4, codebook_size=32, codebook_dim=4, sample_rate=16000,
    )


# ---------------------------------------------------------------------------
# Primitive ops
# ---------------------------------------------------------------------------

def conv1d(x, w, b=None, *, stride=1, padding=0, dilation=1):
    """x: [B, C, T]; w: [out, in, k] (torch layout)."""
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding=[(padding, padding)],
        rhs_dilation=(dilation,), dimension_numbers=("NCH", "OIH", "NCH"),
    )
    if b is not None:
        y = y + b[None, :, None]
    return y


def conv_transpose1d(x, w, b=None, *, stride=1, padding=0, output_padding=0):
    """Torch ConvTranspose1d semantics; w: [in, out, k] (torch layout).

    Implemented as an lhs-dilated conv with the flipped, IO-swapped kernel:
    out_len = (T-1)·stride - 2·padding + k + output_padding.
    """
    k = w.shape[-1]
    w_flip = jnp.flip(w, axis=-1).transpose(1, 0, 2)  # [out, in, k]
    lo = k - 1 - padding
    hi = k - 1 - padding + output_padding
    y = jax.lax.conv_general_dilated(
        x, w_flip, window_strides=(1,), padding=[(lo, hi)],
        lhs_dilation=(stride,), dimension_numbers=("NCH", "OIH", "NCH"),
    )
    if b is not None:
        y = y + b[None, :, None]
    return y


def snake(x, alpha):
    """Snake activation: x + sin²(αx)/α (DAC's Snake1d). alpha: [1, C, 1]."""
    a = alpha.astype(jnp.float32)
    xf = x.astype(jnp.float32)
    return (xf + (1.0 / (a + 1e-9)) * jnp.square(jnp.sin(a * xf))).astype(x.dtype)


# ---------------------------------------------------------------------------
# Blocks
# ---------------------------------------------------------------------------

def residual_unit(p: Dict, x, dilation: int):
    """Snake → k7 dilated conv → Snake → k1 conv, residual add."""
    y = snake(x, p["snake1_alpha"])
    pad = ((7 - 1) * dilation) // 2
    y = conv1d(y, p["conv1_w"], p["conv1_b"], padding=pad, dilation=dilation)
    y = snake(y, p["snake2_alpha"])
    y = conv1d(y, p["conv2_w"], p["conv2_b"])
    return x + y


def encoder_block(p: Dict, x, stride: int):
    for i, dil in enumerate((1, 3, 9)):
        x = residual_unit(p["res"][i], x, dil)
    x = snake(x, p["snake_alpha"])
    x = conv1d(
        x, p["conv_w"], p["conv_b"], stride=stride, padding=math.ceil(stride / 2),
    )
    return x


def decoder_block(p: Dict, x, stride: int):
    x = snake(x, p["snake_alpha"])
    x = conv_transpose1d(
        x, p["convt_w"], p["convt_b"], stride=stride,
        padding=math.ceil(stride / 2), output_padding=stride % 2,
    )
    for i, dil in enumerate((1, 3, 9)):
        x = residual_unit(p["res"][i], x, dil)
    return x


# ---------------------------------------------------------------------------
# Encoder / RVQ / Decoder
# ---------------------------------------------------------------------------

def dac_encoder(params: Dict, audio: jnp.ndarray, cfg: DACConfig) -> jnp.ndarray:
    """audio [B, 1, T] → latents [B, latent_dim, T/hop]."""
    x = conv1d(audio, params["conv_in_w"], params["conv_in_b"], padding=3)
    for i, stride in enumerate(cfg.encoder_rates):
        x = encoder_block(params["blocks"][i], x, stride)
    x = snake(x, params["snake_out_alpha"])
    x = conv1d(x, params["conv_out_w"], params["conv_out_b"], padding=1)
    return x


def rvq_encode(params: Dict, z: jnp.ndarray, cfg: DACConfig) -> jnp.ndarray:
    """Latents [B, D, T] → codes [B, n_codebooks, T].

    DAC's VectorQuantize: per codebook, project the residual to codebook_dim,
    L2-normalize both encodings and codebook entries, nearest-neighbour by
    (normalized) L2 distance, then subtract the out-projected quantized
    vector from the running residual.
    """
    residual = z
    codes = []
    for i in range(cfg.n_codebooks):
        q = params["quantizers"][i]
        z_e = conv1d(residual, q["in_proj_w"], q["in_proj_b"])  # [B, d_cb, T]
        enc = z_e.transpose(0, 2, 1)  # [B, T, d_cb]
        enc_n = enc / (jnp.linalg.norm(enc, axis=-1, keepdims=True) + 1e-12)
        cb = q["codebook"]  # [K, d_cb]
        cb_n = cb / (jnp.linalg.norm(cb, axis=-1, keepdims=True) + 1e-12)
        # max cosine similarity == min normalized L2 distance
        sim = jnp.einsum("btd,kd->btk", enc_n, cb_n)
        idx = jnp.argmax(sim, axis=-1)  # [B, T]
        codes.append(idx)
        z_q = cb[idx].transpose(0, 2, 1)  # [B, d_cb, T]
        z_q_full = conv1d(z_q, q["out_proj_w"], q["out_proj_b"])
        residual = residual - z_q_full
    return jnp.stack(codes, axis=1)


def rvq_decode(params: Dict, codes: jnp.ndarray, cfg: DACConfig) -> jnp.ndarray:
    """codes [B, n_codebooks, T] → latents [B, D, T] (quantizer.from_codes)."""
    z_q = None
    for i in range(cfg.n_codebooks):
        q = params["quantizers"][i]
        z_p = q["codebook"][codes[:, i]].transpose(0, 2, 1)  # [B, d_cb, T]
        z_q_i = conv1d(z_p, q["out_proj_w"], q["out_proj_b"])
        z_q = z_q_i if z_q is None else z_q + z_q_i
    return z_q


def dac_decoder(params: Dict, z: jnp.ndarray, cfg: DACConfig) -> jnp.ndarray:
    """latents [B, D, T] → audio [B, 1, T·hop]."""
    x = conv1d(z, params["conv_in_w"], params["conv_in_b"], padding=3)
    for i, stride in enumerate(cfg.decoder_rates):
        x = decoder_block(params["blocks"][i], x, stride)
    x = snake(x, params["snake_out_alpha"])
    x = conv1d(x, params["conv_out_w"], params["conv_out_b"], padding=3)
    return jnp.tanh(x)


def dac_preprocess(audio: jnp.ndarray, cfg: DACConfig) -> jnp.ndarray:
    """Right-pad [B, 1, T] to a hop multiple (dac.DAC.preprocess)."""
    T = audio.shape[-1]
    hop = cfg.hop_length
    pad = (hop - T % hop) % hop
    if pad:
        audio = jnp.pad(audio, ((0, 0), (0, 0), (0, pad)))
    return audio


def dac_encode(params: Dict, audio: jnp.ndarray, cfg: DACConfig) -> jnp.ndarray:
    """[B, 1, T] waveform → [B, n_codebooks, T/hop] codes."""
    z = dac_encoder(params["encoder"], dac_preprocess(audio, cfg), cfg)
    return rvq_encode(params["quantizer"], z, cfg)


def dac_decode(params: Dict, codes: jnp.ndarray, cfg: DACConfig) -> jnp.ndarray:
    """[B, n_codebooks, T] codes → [B, 1, T·hop] waveform."""
    z = rvq_decode(params["quantizer"], codes, cfg)
    return dac_decoder(params["decoder"], z, cfg)


# ---------------------------------------------------------------------------
# Init (random weights; real weights come from the torch checkpoint converter)
# ---------------------------------------------------------------------------

def _conv_init(key, out_ch, in_ch, k, scale=None):
    scale = scale if scale is not None else (in_ch * k) ** -0.5
    kw, kb = jax.random.split(key)
    return (
        jax.random.uniform(kw, (out_ch, in_ch, k), minval=-scale, maxval=scale),
        jax.random.uniform(kb, (out_ch,), minval=-scale, maxval=scale),
    )


def _res_unit_init(key, dim):
    k1, k2 = jax.random.split(key)
    w1, b1 = _conv_init(k1, dim, dim, 7)
    w2, b2 = _conv_init(k2, dim, dim, 1)
    return {
        "snake1_alpha": jnp.ones((1, dim, 1)),
        "conv1_w": w1, "conv1_b": b1,
        "snake2_alpha": jnp.ones((1, dim, 1)),
        "conv2_w": w2, "conv2_b": b2,
    }


def init_dac_params(rng: jax.Array, cfg: DACConfig) -> Dict:
    keys = iter(jax.random.split(rng, 256))
    d = cfg.encoder_dim
    enc_blocks = []
    w_in, b_in = _conv_init(next(keys), d, 1, 7)
    for stride in cfg.encoder_rates:
        block = {
            "res": [_res_unit_init(next(keys), d) for _ in range(3)],
            "snake_alpha": jnp.ones((1, d, 1)),
        }
        w, b = _conv_init(next(keys), d * 2, d, 2 * stride)
        block["conv_w"], block["conv_b"] = w, b
        enc_blocks.append(block)
        d *= 2
    w_out, b_out = _conv_init(next(keys), cfg.latent_dim, d, 3)
    encoder = {
        "conv_in_w": w_in, "conv_in_b": b_in,
        "blocks": enc_blocks,
        "snake_out_alpha": jnp.ones((1, d, 1)),
        "conv_out_w": w_out, "conv_out_b": b_out,
    }

    quantizers = []
    for _ in range(cfg.n_codebooks):
        wi, bi = _conv_init(next(keys), cfg.codebook_dim, cfg.latent_dim, 1)
        wo, bo = _conv_init(next(keys), cfg.latent_dim, cfg.codebook_dim, 1)
        cb = jax.random.normal(next(keys), (cfg.codebook_size, cfg.codebook_dim))
        quantizers.append({
            "in_proj_w": wi, "in_proj_b": bi,
            "out_proj_w": wo, "out_proj_b": bo,
            "codebook": cb,
        })

    d = cfg.decoder_dim
    w_in, b_in = _conv_init(next(keys), d, cfg.latent_dim, 7)
    dec_blocks = []
    for stride in cfg.decoder_rates:
        out_d = d // 2
        wt = jax.random.uniform(
            next(keys), (d, out_d, 2 * stride),
            minval=-(d * 2 * stride) ** -0.5, maxval=(d * 2 * stride) ** -0.5,
        )
        bt = jnp.zeros((out_d,))
        block = {
            "snake_alpha": jnp.ones((1, d, 1)),
            "convt_w": wt, "convt_b": bt,
            "res": [_res_unit_init(next(keys), out_d) for _ in range(3)],
        }
        dec_blocks.append(block)
        d = out_d
    w_out, b_out = _conv_init(next(keys), 1, d, 7)
    decoder = {
        "conv_in_w": w_in, "conv_in_b": b_in,
        "blocks": dec_blocks,
        "snake_out_alpha": jnp.ones((1, d, 1)),
        "conv_out_w": w_out, "conv_out_b": b_out,
    }

    return {"encoder": encoder, "quantizer": {"quantizers": quantizers}, "decoder": decoder}
