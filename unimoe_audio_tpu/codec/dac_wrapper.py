"""High-level Dac class with the reference's surface.

Port of the Dac wrapper (reference: utils/UniMoE_Audio_utils.py:56-134):
  encode(audio_path) → python list [T][12] of codes
  decode(codes [1, 12, T], save_path, min_duration) → writes 16-bit wav

Weights resolution mirrors the reference's candidate search: the
DAC_WEIGHTS env var, then ./dac_model/weights_16khz.* paths.  Weights are a
converted-from-torch pickle of the JAX param pytree (see
convert_dac_weights); absent weights fall back to an explicit error, or
random params when allow_random=True (tests/benches).
"""

from __future__ import annotations

import os
import pickle
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import audio_io
from .dac import (
    DACConfig,
    dac_decode,
    dac_encode,
    init_dac_params,
)


class Dac:
    def __init__(self, weights_path: Optional[str] = None, *, allow_random: bool = False,
                 config: Optional[DACConfig] = None):
        self.config = config or DACConfig()
        path = self._resolve_weights(weights_path)
        if path is not None:
            with open(path, "rb") as f:
                blob = pickle.load(f)
            if "config" in blob:
                self.config = DACConfig(**blob["config"])
            self.params = jax.tree.map(jnp.asarray, blob["params"])
        elif allow_random:
            self.params = init_dac_params(jax.random.PRNGKey(0), self.config)
        else:
            raise FileNotFoundError(
                "DAC weights not found. Set DAC_WEIGHTS to a converted weights "
                "file (see unimoe_audio_tpu.core.convert.convert_dac_weights) "
                "or pass allow_random=True for random-weight operation."
            )
        self._encode = jax.jit(lambda p, a: dac_encode(p, a, self.config))
        self._decode = jax.jit(lambda p, c: dac_decode(p, c, self.config))

    @staticmethod
    def _resolve_weights(explicit: Optional[str]) -> Optional[str]:
        candidates = []
        if explicit:
            if not os.path.isfile(explicit):
                # An explicitly named path must not silently fall through
                # to env/default/random weights (garbage audio, no error).
                raise FileNotFoundError(f"DAC weights not found: {explicit}")
            candidates.append(explicit)
        env = os.environ.get("DAC_WEIGHTS")
        if env:
            candidates.append(env)
        base = os.path.dirname(__file__)
        for root in (base, os.getcwd()):
            candidates.append(os.path.join(root, "dac_model", "weights_16khz.jax.pkl"))
        return next((p for p in candidates if p and os.path.isfile(p)), None)

    def encode_array(self, audio: np.ndarray, sample_rate: int) -> np.ndarray:
        """Raw waveform [T] or [C, T] → codes [T_frames, n_codebooks]
        (array-input twin of encode(), for streaming/serving ingest)."""
        audio = np.asarray(audio, dtype=np.float32)
        if audio.ndim == 1:
            audio = audio[None]
        audio = audio_io.to_mono(audio)
        audio = audio_io.resample(audio, sample_rate, self.config.sample_rate)
        codes = self._encode(self.params, jnp.asarray(audio[None]))
        return np.asarray(codes)[0].T

    def encode(self, audio_path: str) -> List[List[int]]:
        """wav file → [T][n_codebooks] code list (the reference's return
        layout, utils/UniMoE_Audio_utils.py:115-119)."""
        audio, sr = audio_io.read_wav(audio_path)
        audio = audio_io.to_mono(audio)
        audio = audio_io.resample(audio, sr, self.config.sample_rate)
        x = jnp.asarray(audio[None])  # [1, 1, T]
        codes = self._encode(self.params, x)  # [1, C, Tf]
        codes = np.asarray(codes)[0].T  # [Tf, C]
        assert codes.shape[1] == self.config.n_codebooks and codes.ndim == 2
        return codes.tolist()

    def decode_array(self, codes) -> np.ndarray:
        """codes [1, n_codebooks, T] → waveform np [1, T·hop] (no file I/O —
        the streaming path's building block)."""
        codes = jnp.asarray(np.asarray(codes))
        return np.asarray(self._decode(self.params, codes))[0]

    def decode(self, codes, save_path: str, min_duration: Optional[float] = None) -> np.ndarray:
        """codes [1, n_codebooks, T] → writes 16-bit wav, returns waveform."""
        codes = jnp.asarray(np.asarray(codes))
        assert codes.shape[0] == 1 and codes.shape[1] == self.config.n_codebooks
        audio = np.asarray(self._decode(self.params, codes))[0]  # [1, T]
        sr = self.config.sample_rate
        duration = audio.shape[-1] / sr
        if min_duration is not None and duration < min_duration:
            pad = int((min_duration - duration) * sr)
            audio = np.concatenate([audio, np.zeros((1, pad), dtype=audio.dtype)], axis=-1)
        audio_io.write_wav(save_path, audio, sr)
        return audio

    def decode_batch(self, codes_list, save_paths, min_duration=None):
        """Batched decode of variable-length code sequences → wav files.

        The serving path previously decoded streams one by one (~50 ms +
        ~30 ms tunnel fetch each — at B=88 the sequential DAC decode cost
        more than the whole AR decode).  Pads every [C, T_i] to the batch
        max, runs ONE decoder forward, slices each stream back to
        T_i · hop samples.  Returns the list of waveforms.
        """
        import numpy as np

        assert len(codes_list) == len(save_paths)
        lens = [np.asarray(c).shape[-1] for c in codes_list]
        T = max(lens)
        batch = np.zeros((len(codes_list), self.config.n_codebooks, T), np.int32)
        for i, c in enumerate(codes_list):
            c = np.asarray(c)
            batch[i, :, : lens[i]] = c
            if lens[i] < T and lens[i] > 0:
                # edge-replicate: the decoder's receptive field sees the
                # pad near each stream's tail; repeating the last frame is
                # more benign there than code 0.
                batch[i, :, lens[i]:] = c[:, -1:]
        audio = np.asarray(self._decode(self.params, jnp.asarray(batch)))  # [B, 1, T·hop]
        hop = audio.shape[-1] // T
        # Per-stream slicing below assumes exactly hop samples per frame;
        # if the conv stack ever trims edges the slices would silently
        # misalign — fail loudly instead.
        assert audio.shape[-1] == T * hop, (
            f"decoder output {audio.shape[-1]} not a multiple of T={T}"
        )
        sr = self.config.sample_rate
        out = []
        for i, path in enumerate(save_paths):
            a = audio[i, :, : lens[i] * hop]
            duration = a.shape[-1] / sr
            if min_duration is not None and duration < min_duration:
                pad = int((min_duration - duration) * sr)
                a = np.concatenate([a, np.zeros((1, pad), a.dtype)], axis=-1)
            audio_io.write_wav(path, a, sr)
            out.append(a)
        return out
