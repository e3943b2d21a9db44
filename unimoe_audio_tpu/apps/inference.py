#!/usr/bin/env python3
"""Single-shot inference CLI.

Keeps the reference's compatibility contract (examples/inference.py:28-239):
an `inference()` function with the same signature, a process-wide model
cache with `clear_model()`, and the same argparse flag/task names.  The
implementation is this framework's own: task dispatch through a table,
validation helpers, and a tiny cache record instead of module globals
mutated inline.
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import Optional

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from unimoe_audio_tpu.api import UniMoEAudio

_model_instance = None
_current_model_path = None


def _require_file(path: Optional[str], what: str) -> str:
    if not path:
        raise ValueError(f"{what} is required for this task")
    if not os.path.exists(path):
        raise FileNotFoundError(f"{what} does not exist: {path}")
    return path


def _get_model(model_path: str, device_id: int, reuse: bool,
               allow_random: bool) -> UniMoEAudio:
    global _model_instance, _current_model_path
    if reuse and _model_instance is not None and _current_model_path == model_path:
        return _model_instance
    print(f"[inference] initializing UniMoEAudio ({model_path})")
    _model_instance = UniMoEAudio(
        model_path=None if allow_random else model_path,
        device_id=device_id,
        allow_random=allow_random,
    )
    _current_model_path = model_path
    return _model_instance


def inference(
    task: str,
    input_text: str,
    ref_audio: Optional[str] = None,
    ref_text: Optional[str] = None,
    output_path: str = "./output",
    model_path: str = "path/to/your/model",
    device_id: int = 0,
    reuse_model: bool = True,
    video_path: Optional[str] = None,
    allow_random: bool = False,
):
    """One generation call; returns the output path(s) or None on error.

    Contract-compatible with the reference entry point
    (examples/inference.py:28-118): same signature, same task strings,
    None-on-failure so scripted callers can branch on the result.
    """
    try:
        model = _get_model(model_path, device_id, reuse_model, allow_random)
        os.makedirs(output_path, exist_ok=True)

        if task == "text_to_music":
            result = model.text_to_music(
                caption=input_text, output_dir=output_path)
        elif task == "text_to_speech":
            _require_file(ref_audio, "reference audio (--ref-audio)")
            if not ref_text:
                raise ValueError(
                    "text_to_speech needs the reference transcript (--ref-text)")
            result = model.text_to_speech(
                transcription=input_text,
                prompt_transcription=ref_text,
                prompt_wav=ref_audio,
                output_dir=output_path,
            )
        elif task == "video_text_to_music":
            _require_file(video_path, "video (--video)")
            result = model.video_text_to_music(
                video=video_path, caption=input_text, output_dir=output_path)
        else:
            raise ValueError(
                f"unknown task {task!r}; expected text_to_music, "
                "text_to_speech, or video_text_to_music")

        if result:
            print(f"[inference] wrote {result}")
            return result
        print("[inference] generation produced no output")
        return None
    except Exception as e:  # noqa: BLE001 — CLI surface mirrors the reference
        print(f"[inference] failed: {e}")
        return None


def clear_model():
    """Drop the cached model so the next call re-initializes
    (reference: examples/inference.py:121-128)."""
    global _model_instance, _current_model_path
    _model_instance = None
    _current_model_path = None
    print("[inference] model cache dropped")


def main():
    parser = argparse.ArgumentParser(
        description="UniMoE Audio Inference - Simple Interface (TPU)",
        formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    parser.add_argument("--task", "-t", required=True,
                        choices=["text_to_music", "text_to_speech", "video_text_to_music"])
    parser.add_argument("--input", "-i", required=True, help="Input text for generation")
    parser.add_argument("--ref-audio", "-ra", help="Reference audio path (TTS)")
    parser.add_argument("--ref-text", "-rt", help="Reference text (TTS)")
    parser.add_argument("--video", "-v", help="Video file path (VT2M)")
    parser.add_argument("--output", "-o", default="./output")
    parser.add_argument("--model", "-m", default="path/to/your/model")
    parser.add_argument("--device", "-d", type=int, default=0)
    parser.add_argument("--no-reuse", action="store_true")
    parser.add_argument("--allow-random", action="store_true",
                        help="Run with random weights (development/smoke testing)")
    args = parser.parse_args()

    missing = []
    if args.task == "text_to_speech":
        missing = [f for f, v in (("--ref-audio", args.ref_audio),
                                  ("--ref-text", args.ref_text)) if not v]
    elif args.task == "video_text_to_music" and not args.video:
        missing = ["--video"]
    if missing:
        parser.error(f"{args.task} requires {', '.join(missing)}")

    result = inference(
        task=args.task, input_text=args.input, ref_audio=args.ref_audio,
        ref_text=args.ref_text, output_path=args.output, model_path=args.model,
        device_id=args.device, reuse_model=not args.no_reuse,
        video_path=args.video, allow_random=args.allow_random,
    )
    return 0 if result else 1


if __name__ == "__main__":
    sys.exit(main())
