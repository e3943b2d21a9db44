"""Channel delay-pattern ops for RVQ codec token layout.

TPU-native re-implementation of the reference's delay machinery
(reference: utils/UniMoE_Audio_utils.py:137-325).  The reference
precomputes flat gather-index tuples on the host; here each op is a pure
`jnp` gather with static shapes, so it fuses under `jit` and runs on the
VPU without host round-trips.

Semantics contract:
  apply:   out[b, t, c] = BOS            if t <  delay[c]
                        = audio[b, t - delay[c], c]   otherwise
  revert:  out[b, t, c] = PAD            if t + delay[c] >= T
                        = audio[b, t + delay[c], c]   otherwise
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np


def apply_audio_delay(
    audio_BxTxC: jnp.ndarray,
    pad_value: int,
    bos_value: int,
    delay_pattern: Sequence[int],
) -> jnp.ndarray:
    """Shift channel c later by delay[c] frames, BOS-filling the head.

    Port of apply_audio_delay (reference: utils/UniMoE_Audio_utils.py:168-183)
    with indices computed inline (the t>=T PAD branch is kept for parity even
    though it is unreachable for non-negative delays).
    """
    B, T, C = audio_BxTxC.shape
    delay = jnp.asarray(delay_pattern, dtype=jnp.int32)
    t_idx = jnp.arange(T, dtype=jnp.int32)[None, :, None] - delay[None, None, :]  # [1,T,C]
    gathered = jnp.take_along_axis(
        audio_BxTxC,
        jnp.clip(t_idx, 0, T - 1).astype(jnp.int32).repeat(B, axis=0),
        axis=1,
    )
    bos = jnp.asarray(bos_value, dtype=audio_BxTxC.dtype)
    pad = jnp.asarray(pad_value, dtype=audio_BxTxC.dtype)
    out = jnp.where(t_idx < 0, bos, jnp.where(t_idx >= T, pad, gathered))
    return out


def revert_audio_delay(
    audio_BxTxC: jnp.ndarray,
    pad_value: int,
    delay_pattern: Sequence[int],
) -> jnp.ndarray:
    """Undo apply_audio_delay: shift channel c earlier by delay[c] frames.

    Port of revert_audio_delay (reference: utils/UniMoE_Audio_utils.py:209-227).
    Positions whose source falls past the end are PAD-filled.
    """
    B, T, C = audio_BxTxC.shape
    delay = jnp.asarray(delay_pattern, dtype=jnp.int32)
    t_idx = jnp.arange(T, dtype=jnp.int32)[None, :, None] + delay[None, None, :]  # [1,T,C]
    gathered = jnp.take_along_axis(
        audio_BxTxC,
        jnp.clip(t_idx, 0, T - 1).astype(jnp.int32).repeat(B, axis=0),
        axis=1,
    )
    pad = jnp.asarray(pad_value, dtype=audio_BxTxC.dtype)
    return jnp.where(t_idx >= T, pad, gathered)


def prepare_audio_prompt(
    audio_prompts: List[np.ndarray | None],
    *,
    num_channels: int,
    bos_value: int,
    delay_pattern: Sequence[int],
) -> Tuple[jnp.ndarray, List[int]]:
    """Build the delayed prefill buffer for generation.

    Port of _prepare_audio_prompt (reference: utils/UniMoE_Audio_utils.py:230-268):
    a [B, max_len, C] int32 buffer initialised to -1 (sentinel = "to be
    generated"), row 0 = BOS, then each sample's voice-clone prompt codes;
    finally the delay pattern is applied with pad_value=-1.  Returns the
    delayed buffer and per-sample prefill step counts.
    """
    max_delay = max(delay_pattern)
    batch_size = len(audio_prompts)
    max_len = max((0 if p is None else int(p.shape[0])) for p in audio_prompts) + max_delay + 1

    prefill = np.full((batch_size, max_len, num_channels), -1, dtype=np.int32)
    prefill[:, 0, :] = bos_value
    prefill_steps: List[int] = []
    for i, prompt in enumerate(audio_prompts):
        if prompt is not None:
            prompt = np.asarray(prompt, dtype=np.int32)
            prefill[i, 1 : prompt.shape[0] + 1, :] = prompt
            prefill_steps.append(int(prompt.shape[0]) + 1)
        else:
            prefill_steps.append(1)

    delayed = apply_audio_delay(
        jnp.asarray(prefill), pad_value=-1, bos_value=bos_value, delay_pattern=delay_pattern
    )
    return delayed, prefill_steps


def generate_output(
    generated_codes: jnp.ndarray,
    lengths_Bx: jnp.ndarray,
    *,
    pad_value: int,
    delay_pattern: Sequence[int],
) -> List[np.ndarray]:
    """Undo the delay on generated codes and slice per-sample lengths.

    Port of _generate_output (reference: utils/UniMoE_Audio_utils.py:301-325).
    Returns host numpy arrays [T_i, C] ready for DAC decode.
    """
    max_delay = max(delay_pattern)
    codebook = revert_audio_delay(generated_codes, pad_value=pad_value, delay_pattern=delay_pattern)
    # NB: `:-0` would be an empty slice — guard the max_delay == 0 case
    # (all-zero delay patterns, e.g. single-channel dev configs).
    codebook = codebook[:, : codebook.shape[1] - max_delay, :]
    codebook = np.asarray(codebook)
    lengths = np.asarray(lengths_Bx)
    return [codebook[i, : int(lengths[i]), :] for i in range(codebook.shape[0])]


def preprocess_codec(
    codec: np.ndarray,
    *,
    delay_pattern: Sequence[int],
    num_channels: int,
    bos_value: int,
    eos_value: int,
    pad_value: int,
) -> np.ndarray:
    """Lay out reference-audio codec tokens with per-channel BOS run-in + EOS.

    Port of UniMoEAudio._preprocess_codec (reference:
    utils/UniMoE_Audio_mod.py:140-156): channel c gets delay[c]+1 BOS rows,
    then the codes, one EOS, then PAD.
    """
    codec = np.asarray(codec, dtype=np.int64)
    token_len = codec.shape[0]
    max_delay = max(delay_pattern)
    out = np.zeros((token_len + max_delay + 1, num_channels), dtype=np.int64)
    for c in range(num_channels):
        start = delay_pattern[c] + 1
        out[:start, c] = bos_value
        out[start : start + token_len, c] = codec[:, c]
        out[start + token_len :, c] = pad_value
        if start + token_len < out.shape[0]:
            out[start + token_len, c] = eos_value
    return out
