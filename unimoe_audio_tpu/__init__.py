"""UniMoE-Audio TPU — a TPU-native unified speech + music generation framework.

A from-scratch JAX/XLA/Pallas re-architecture with the capability surface of
UniMoE-Audio (Dynamic-Capacity MoE decoder over DAC codec tokens; TTS with
voice cloning, text-to-music, video+text-to-music), built mesh-first for
TPU pods.

Package map (mirrors the reference's layer map, SURVEY.md §1):
  config     — dataclass configs interoperable with the HF config.json
  codec      — DAC neural codec in JAX, delay-pattern ops, wav I/O
  moe        — Top-P DCMoE router, dense/packed/EP dispatch
  models     — decoder stack, vision tower, codec heads
  generate   — single-jit AR decode loop + sampler
  ops        — Pallas kernels (flash attention), int8 quantization
  parallel   — device mesh + sharding specs (replaces DeepSpeed groups)
  train      — optax trainer, data pipeline, dense→MoE surgery, resharding
  core       — checkpointing (orbax), torch/HF weight converters
  apps       — CLI, batch framework, web demo, video preprocessing
  api        — the UniMoEAudio task class (reference surface)
"""

import os

__version__ = "0.1.0"

from .config import TextMoEConfig, UniMoEAudioConfig, VisionConfig, tiny_test_config


def get_model_info():
    """Summary dict (parity with utils/__init__.py get_model_info)."""
    return {
        "name": "UniMoE-Audio-TPU",
        "version": __version__,
        "tasks": ["text_to_speech", "text_to_music", "video_text_to_music"],
        "backend": "jax/xla/pallas",
        "codec": "DAC 16 kHz, 12 RVQ channels, 50 frames/s",
    }


if not os.environ.get("UNIMOE_AUDIO_QUIET"):
    # One-line banner (reference prints a larger one, utils/__init__.py:282).
    # stderr so programmatic stdout (bench.py's JSON line) stays clean.
    import sys as _sys

    print(
        f"UniMoE-Audio TPU v{__version__} — jax/xla/pallas · "
        "set UNIMOE_AUDIO_QUIET=1 to silence",
        file=_sys.stderr,
    )


def load_model(model_path: str, **kwargs):
    """Convenience: build a UniMoEAudio instance (lazy import)."""
    from .api import UniMoEAudio

    return UniMoEAudio(model_path, **kwargs)


__all__ = [
    "TextMoEConfig",
    "UniMoEAudioConfig",
    "VisionConfig",
    "tiny_test_config",
    "get_model_info",
    "load_model",
]
