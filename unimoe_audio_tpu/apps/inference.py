#!/usr/bin/env python3
"""Single-shot inference CLI.

Port of examples/inference.py (reference: examples/inference.py:28-239):
same `inference()` function signature, global model cache + clear_model(),
and the same argparse surface.
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
    """Simplified inference entry (reference: examples/inference.py:28-118)."""
    global _model_instance, _current_model_path

    try:
        if not reuse_model or _model_instance is None or _current_model_path != model_path:
            print(f"Loading model from {model_path}...")
            _model_instance = UniMoEAudio(
                model_path=None if allow_random else model_path,
                device_id=device_id,
                allow_random=allow_random,
            )
            _current_model_path = model_path
            print("Model loaded successfully!")

        os.makedirs(output_path, exist_ok=True)

        if task == "text_to_music":
            print(f"Generating music: {input_text}")
            result = _model_instance.text_to_music(caption=input_text, output_dir=output_path)
        elif task == "text_to_speech":
            if not ref_audio or not ref_text:
                raise ValueError("ref_audio and ref_text are required for text_to_speech task")
            if not os.path.exists(ref_audio):
                raise FileNotFoundError(f"Reference audio file not found: {ref_audio}")
            print(f"Generating speech: {input_text}")
            result = _model_instance.text_to_speech(
                transcription=input_text,
                prompt_transcription=ref_text,
                prompt_wav=ref_audio,
                output_dir=output_path,
            )
        elif task == "video_text_to_music":
            if not video_path:
                raise ValueError("video_path is required for video_text_to_music task")
            if not os.path.exists(video_path):
                raise FileNotFoundError(f"Video file not found: {video_path}")
            print(f"Generating music from video and text: {input_text}")
            result = _model_instance.video_text_to_music(
                video=video_path, caption=input_text, output_dir=output_path,
            )
        else:
            raise ValueError(
                f"Unknown task type: {task}. Must be 'text_to_music', "
                "'text_to_speech', or 'video_text_to_music'"
            )

        if result:
            print(f"Generation completed: {result}")
            return result
        print("Generation failed")
        return None
    except Exception as e:  # noqa: BLE001 — CLI surface mirrors the reference
        print(f"Error during inference: {e}")
        return None


def clear_model():
    """Free the cached model (reference: examples/inference.py:121-128)."""
    global _model_instance, _current_model_path
    _model_instance = None
    _current_model_path = None
    print("Model instance cleared")


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

    if args.task == "text_to_speech" and (not args.ref_audio or not args.ref_text):
        print("Error: --ref-audio and --ref-text are required for text_to_speech task")
        return 1
    if args.task == "video_text_to_music" and not args.video:
        print("Error: --video is required for video_text_to_music task")
        return 1

    result = inference(
        task=args.task, input_text=args.input, ref_audio=args.ref_audio,
        ref_text=args.ref_text, output_path=args.output, model_path=args.model,
        device_id=args.device, reuse_model=not args.no_reuse,
        video_path=args.video, allow_random=args.allow_random,
    )
    if result:
        print(f"\nSuccess! Generated file: {result}")
        return 0
    print("\nFailed to generate audio")
    return 1


if __name__ == "__main__":
    sys.exit(main())
