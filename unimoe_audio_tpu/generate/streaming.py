"""Chunked streaming generation — audio yielded while decoding continues.

New capability beyond the reference (its Gradio demo only streams status
text, web_demo.py): the decode while_loop pauses every `chunk_frames`
steps (`stop_at` + resumable loop state in generate_jit), the delay
pattern is reverted over the frames that are final (a frame is final once
`max_delay` further steps exist), and each chunk's waveform is emitted.
One compile serves all chunks — the resumed program is the same XLA
executable.
"""

from __future__ import annotations

from typing import Dict, Iterator

import jax
import jax.numpy as jnp
import numpy as np

from ..codec import delay as dl
from ..config import UniMoEAudioConfig
from .loop import generate_jit, pad_buffer


def generate_stream(
    params: Dict,
    cfg: UniMoEAudioConfig,
    input_ids,
    attention_mask,
    codec_input_ids,
    rng,
    *,
    max_tokens: int,
    min_tokens: int,
    chunk_frames: int = 25,
    cfg_scale: float = 10.0,
    temperature: float = 1.0,
    top_p: float = 1.0,
    cfg_filter_top_k: int = 45,
    eos_prob_mul_factor: float = 0.6,
    do_sample: bool = True,
    dac=None,
    kv_dtype: str = None,
) -> Iterator[Dict]:
    """Yields dicts per chunk:
      {"frames": np[B, n_new, C] delay-reverted codes,
       "audio":  np[B, n_new·hop] waveform (when a Dac is given),
       "done":   bool}
    Single-prompt batches only expose meaningful incremental lengths
    (per-sample EOS can finish streams at different steps).
    """
    B = input_ids.shape[0] // 2
    C = cfg.codec_channels
    max_delay = cfg.max_delay

    prefill, prefill_steps = dl.prepare_audio_prompt(
        [None] * B, num_channels=C, bos_value=cfg.codec_bos_value,
        delay_pattern=cfg.codec_delay_pattern,
    )
    buf = pad_buffer(prefill, max_tokens)
    steps_arr = jnp.asarray(prefill_steps, jnp.int32)
    kwargs = dict(
        max_tokens=max_tokens, min_tokens=jnp.int32(min_tokens),
        cfg_scale=jnp.float32(cfg_scale), temperature=jnp.float32(temperature),
        top_p=jnp.float32(top_p), cfg_filter_top_k=cfg_filter_top_k,
        eos_prob_mul_factor=jnp.float32(eos_prob_mul_factor),
        do_sample=do_sample, return_state=True,
    )
    if kv_dtype:
        kwargs["kv_dtype"] = kv_dtype

    state = None
    emitted = 0  # frames already yielded (audio-frame domain)
    start = min(prefill_steps) - 1
    stop = start + chunk_frames
    while True:
        res, state = generate_jit(
            params, cfg, jnp.asarray(input_ids), jnp.asarray(attention_mask),
            codec_input_ids, buf, steps_arr, rng,
            None, None, None, None, state, jnp.int32(stop),
            **kwargs,
        )
        # One round trip for every per-chunk control read (tunnel fetches
        # cost ~30 ms each on the axon TPU).
        dec_step, cd, lengths = jax.device_get(
            (state.dec_step, state.eos_countdown, res.lengths))
        dec_step = int(dec_step)
        done = bool((cd == 0).all()) or dec_step >= max_tokens

        # Frames final so far: the EOS machine may still rewrite the last
        # max_delay steps, so hold those back until done.  At done, trim to
        # the true audio length — the final max_delay countdown steps carry
        # EOS/PAD, not audio (the batch path drops them via lengths +
        # the [:-max_delay] strip in generate_output).
        produced = dec_step - start            # delayed-domain steps decoded
        lengths = np.asarray(lengths)
        safe = int(lengths.max()) if done else max(0, produced - max_delay)
        if safe > emitted:
            # Revert the delay over [emitted, safe) with lookahead.
            codes = np.asarray(res.codes)      # [B, max_tokens, C], PAD-filled
            lo = emitted
            hi = min(safe + max_delay, max_tokens)
            window = codes[:, lo:hi]
            reverted = np.asarray(dl.revert_audio_delay(
                jnp.asarray(window), pad_value=cfg.codec_pad_value,
                delay_pattern=cfg.codec_delay_pattern,
            ))[:, : safe - emitted]
            # Per-sample trim: silence frames past each stream's length.
            frame_idx = np.arange(lo, lo + reverted.shape[1])
            over = frame_idx[None, :, None] >= lengths[:, None, None]
            reverted = np.where(over, 0, reverted)
            out = {"frames": reverted, "done": done,
                   "lengths": np.minimum(lengths, lo + reverted.shape[1])}
            if dac is not None:
                chunks = []
                for b in range(B):
                    valid = np.clip(reverted[b], 0, cfg.codec_eos_value - 1)
                    wav = dac.decode_array(valid.T[None])
                    chunks.append(wav[0])
                out["audio"] = np.stack(chunks)
            emitted = safe
            yield out
        elif done:
            yield {"frames": np.zeros((B, 0, C), np.int32), "done": True}
        if done:
            return
        stop += chunk_frames
