"""UniMoE-Audio TPU usage example.

Port of the reference e2e smoke script (reference: examples/example.py:1-53):
all three tasks through the UniMoEAudio class.  Pass --random to run with
random weights + a stub tokenizer (development smoke mode, no checkpoint).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from unimoe_audio_tpu.api import UniMoEAudio

parser = argparse.ArgumentParser()
parser.add_argument("--model", default="path/to/model")
parser.add_argument("--output", default="./generated_audio")
parser.add_argument("--prompt-wav", default="assets/prompt_audios/en_female.wav")
parser.add_argument("--video", default="assets/audios/demo_1.mp4")
parser.add_argument("--random", action="store_true",
                    help="random weights + stub tokenizer (smoke mode)")
args = parser.parse_args()

print("Initializing UniMoE Audio model...")
if args.random:
    from unimoe_audio_tpu.config import tiny_test_config

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))))
    from tests.test_api import StubTokenizer

    cfg = tiny_test_config()
    audio_generator = UniMoEAudio(None, allow_random=True, config=cfg,
                                  tokenizer=StubTokenizer(cfg),
                                  max_tokens=32, min_tokens=4)
else:
    audio_generator = UniMoEAudio(model_path=args.model, device_id=0)

os.makedirs(args.output, exist_ok=True)

print("\n=== Text-to-Music Generation ===")
music_files = audio_generator.text_to_music(
    caption="A peaceful piano melody with soft strings",
    output_dir=args.output,
)
print(f"Generated music files: {music_files}")

print("\n=== Text-to-Speech (Voice Cloning) ===")
if os.path.exists(args.prompt_wav) or not args.random:
    speech_files = audio_generator.text_to_speech(
        transcription="Hello world, this is a test of voice cloning.",
        prompt_transcription="They're calling to us not to give up and to keep on fighting!",
        prompt_wav=args.prompt_wav,
        output_dir=args.output,
    )
    print(f"Generated speech files: {speech_files}")
else:
    print("(skipped: no prompt wav available in smoke mode)")

print("\n=== Video+Text-to-Music Generation ===")
if os.path.exists(args.video) or not args.random:
    video_music_files = audio_generator.video_text_to_music(
        video=args.video,
        caption="Upbeat electronic music matching the video content",
        output_dir=args.output,
    )
    print(f"Generated video music files: {video_music_files}")
else:
    print("(skipped: no demo video available in smoke mode)")

print(f"\nAll generated files are saved in: {args.output}")
