"""Voice-clone prompt audio library loader.

Port of AudioPromptLoader (reference: examples/audio_loader.py:15-127):
a prompt_audios.json-backed library of reference voices (en/zh × m/f) with
load/normalize and random pick — librosa/soundfile replaced by the
framework's own wav I/O + scipy resampling.
"""

from __future__ import annotations

import json
import os
import random
from pathlib import Path
from typing import Dict, Optional, Tuple

import numpy as np

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from unimoe_audio_tpu.codec import audio_io


class AudioPromptLoader:
    def __init__(self, config_path: Optional[str] = None, base_dir: Optional[str] = None):
        if config_path is None:
            config_path = os.path.join(os.path.dirname(__file__), "prompt_audios.json")
        if base_dir is None:
            base_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        self.config_path = config_path
        self.base_dir = Path(base_dir)
        self.config = self._load_config()

    def _load_config(self) -> Dict:
        try:
            with open(self.config_path, encoding="utf-8") as f:
                return json.load(f)
        except FileNotFoundError:
            raise FileNotFoundError(f"Configuration file not found: {self.config_path}")
        except json.JSONDecodeError as e:
            raise ValueError(f"Configuration file format error: {e}")

    def get_audio_info(self, language: Optional[str] = None,
                       gender: Optional[str] = None) -> Dict:
        lang_map = {"en": "english", "zh": "chinese"}
        language = lang_map.get(language, language)
        prompts = self.config.get("audio_prompts", {})
        if language and language in prompts:
            if gender and gender in prompts[language]:
                return prompts[language][gender]
            return prompts[language]
        return prompts

    def load_audio(self, language: str, gender: str, sr: int = 22050,
                   normalize: bool = True) -> Tuple[np.ndarray, int, Dict]:
        info = self.get_audio_info(language, gender)
        if not info or "audio_path" not in info:
            raise ValueError(
                f"Audio information not found: language={language}, gender={gender}"
            )
        path = self.base_dir / info["audio_path"]
        audio, native_sr = audio_io.read_wav(str(path))
        audio = audio_io.to_mono(audio)[0]
        if sr and sr != native_sr:
            audio = audio_io.resample(audio, native_sr, sr)
            native_sr = sr
        if normalize and np.abs(audio).max() > 0:
            audio = audio / np.abs(audio).max()
        return audio, native_sr, info

    def get_random_prompt(self, language: Optional[str] = None) -> Dict:
        prompts = self.config.get("audio_prompts", {})
        lang_map = {"en": "english", "zh": "chinese"}
        language = lang_map.get(language, language)
        langs = [language] if language in prompts else list(prompts)
        lang = random.choice(langs)
        gender = random.choice(list(prompts[lang]))
        return prompts[lang][gender]
