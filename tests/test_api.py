"""End-to-end API tests on the tiny random-weight model: T2M and
voice-clone TTS produce wav files through the full pipeline
(tokenize → prefill → jitted decode → delay revert → DAC decode → wav)."""

import re

import numpy as np
import pytest

from unimoe_audio_tpu.api import SPECIAL_TOKENS, UniMoEAudio
from unimoe_audio_tpu.codec import audio_io
from unimoe_audio_tpu.config import tiny_test_config


class StubTokenizer:
    """Whitespace/special-token tokenizer with HF's __call__ surface."""

    def __init__(self, cfg):
        self.cfg = cfg
        self.pad_token_id = 0
        self.special = {t: 200 + i for i, t in enumerate(SPECIAL_TOKENS)}
        self.special["<|AUDIO_PLACEHOLDER|>"] = cfg.codec_placeholder_value

    def _encode_one(self, text):
        pattern = "(" + "|".join(re.escape(t) for t in self.special) + ")"
        ids = []
        for part in re.split(pattern, text):
            if not part:
                continue
            if part in self.special:
                ids.append(self.special[part])
            else:
                for w in part.split():
                    ids.append(1 + (hash(w) % 150))
        return ids

    def __call__(self, texts, add_special_tokens=False, padding=True, return_tensors="np"):
        seqs = [self._encode_one(t) for t in texts]
        T = max(len(s) for s in seqs)
        ids = np.zeros((len(seqs), T), dtype=np.int32)
        mask = np.zeros((len(seqs), T), dtype=np.int32)
        for i, s in enumerate(seqs):  # left padding
            ids[i, T - len(s):] = s
            mask[i, T - len(s):] = 1
        return {"input_ids": ids, "attention_mask": mask}


@pytest.fixture(scope="module")
def model():
    cfg = tiny_test_config()
    m = UniMoEAudio(
        None, allow_random=True, config=cfg, tokenizer=StubTokenizer(cfg),
        max_tokens=24, min_tokens=4,
    )
    return m


def test_text_to_music_end_to_end(model, tmp_path):
    paths = model.text_to_music("A peaceful piano melody", output_dir=str(tmp_path), seed=0)
    assert len(paths) == 1 and paths[0].endswith(".wav")
    audio, sr = audio_io.read_wav(paths[0])
    assert sr == model.dac.config.sample_rate
    assert audio.shape[-1] >= sr  # min_duration=1 s pad
    assert np.isfinite(audio).all()


def test_text_to_music_batch(model, tmp_path):
    paths = model.text_to_music(
        ["melody one", "melody two"], output_dir=str(tmp_path), seed=1
    )
    assert len(paths) == 2


def test_text_to_speech_voice_clone_end_to_end(model, tmp_path):
    # Build a reference wav, encode through the (random) DAC, clone.
    sr = model.dac.config.sample_rate
    t = np.linspace(0, 0.3, int(sr * 0.3), dtype=np.float32)
    ref = str(tmp_path / "ref.wav")
    audio_io.write_wav(ref, 0.3 * np.sin(2 * np.pi * 330 * t)[None], sr)

    paths = model.text_to_speech(
        "Hello world", prompt_text="reference transcript", prompt_wav=ref,
        output_dir=str(tmp_path), seed=2,
    )
    assert len(paths) == 1 and paths[0].endswith(".wav")
    audio, _ = audio_io.read_wav(paths[0])
    assert np.isfinite(audio).all()


def test_checkpoint_variant_kwargs(model, tmp_path):
    sr = model.dac.config.sample_rate
    t = np.linspace(0, 0.2, int(sr * 0.2), dtype=np.float32)
    ref = str(tmp_path / "ref2.wav")
    audio_io.write_wav(ref, 0.2 * np.sin(2 * np.pi * 220 * t)[None], sr)
    paths = model.text_to_speech(
        transcription="alias spelling", prompt_transcription="ref", prompt_wav=ref,
        output_dir=str(tmp_path), seed=3,
    )
    assert len(paths) == 1


def test_empty_caption_rejected(model):
    assert model.text_to_music("") == []
    assert model.text_to_speech("", prompt_text="x", prompt_wav=None) == []


def test_audio_seconds_do_not_leak_across_calls(model, tmp_path):
    """max_audio_seconds is per-call: a TTS cap must not shrink later T2M
    generations (regression: the alias used to mutate MAX_TOKENS)."""
    before = (model.MAX_TOKENS, model.MIN_TOKENS)
    model.text_to_music("capped", output_dir=str(tmp_path), seed=7,
                        max_audio_seconds=1, min_audio_seconds=0.1)
    assert (model.MAX_TOKENS, model.MIN_TOKENS) == before


def test_serving_mode_end_to_end(tmp_path):
    """serving_mode (int8 + padded FFNs + packed dispatch sizing) produces
    valid audio through the public surface."""
    cfg = tiny_test_config()
    m = UniMoEAudio(None, allow_random=True, config=cfg,
                    tokenizer=StubTokenizer(cfg), max_tokens=16, min_tokens=4,
                    serving_mode=True)
    from unimoe_audio_tpu.ops.quant import QTensor

    assert isinstance(m.params["layers"]["attn"]["q_proj"]["w"], QTensor)
    paths = m.text_to_music(["a"] * 40, output_dir=str(tmp_path), seed=0)
    assert len(paths) == 40
    audio, _ = audio_io.read_wav(paths[0])
    assert np.isfinite(audio).all()


@pytest.mark.parametrize("mode,kv", [("int8", None), ("int4", "int8")])
def test_serving_snapshot_round_trip(tmp_path, mode, kv):
    """save_serving_snapshot → UniMoEAudio(snapshot_dir) reloads the
    QUANTIZED params (QTensor leaves; int4 repacks s4 through the
    producer-side path) without re-quantizing, with identical greedy
    generation and the snapshot's serving/kv modes adopted."""
    import jax.numpy as jnp

    from unimoe_audio_tpu.ops.quant import QTensor

    cfg = tiny_test_config()
    m = UniMoEAudio(None, allow_random=True, config=cfg,
                    tokenizer=StubTokenizer(cfg), max_tokens=12,
                    min_tokens=4, serving_mode=mode, kv_cache_dtype=kv)
    snap = str(tmp_path / "snap")
    m.save_serving_snapshot(snap)

    # allow_random only affects the missing-DAC fallback here — the
    # params come from the snapshot either way.
    m2 = UniMoEAudio(snap, allow_random=True, tokenizer=StubTokenizer(cfg),
                     max_tokens=12, min_tokens=4)
    assert m2.serving_mode == mode and m2.kv_cache_dtype == kv
    q1 = m.params["layers"]["moe"]["dynamic"]["gate"]
    q2 = m2.params["layers"]["moe"]["dynamic"]["gate"]
    assert isinstance(q2, QTensor) and q2.q.dtype == q1.q.dtype
    np.testing.assert_array_equal(
        np.asarray(q1.q.astype(jnp.int8)), np.asarray(q2.q.astype(jnp.int8)))

    p1 = m.text_to_music("same tune", output_dir=str(tmp_path / "a"), seed=3)
    p2 = m2.text_to_music("same tune", output_dir=str(tmp_path / "b"), seed=3)
    a1, _ = audio_io.read_wav(p1[0])
    a2, _ = audio_io.read_wav(p2[0])
    np.testing.assert_array_equal(a1, a2)

    # A conflicting serving_mode request is rejected, not silently ignored.
    with pytest.raises(AssertionError):
        UniMoEAudio(snap, tokenizer=StubTokenizer(cfg), serving_mode="int8"
                    if mode != "int8" else "int4")
