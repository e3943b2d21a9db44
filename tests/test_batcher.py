"""Request batcher + train→save→serve round-trip tests."""

import numpy as np
import pytest

from tests.test_api import StubTokenizer
from unimoe_audio_tpu.api import UniMoEAudio
from unimoe_audio_tpu.apps.batcher import RequestBatcher, _bucket
from unimoe_audio_tpu.config import tiny_test_config


def test_bucket():
    assert [_bucket(n) for n in (1, 2, 3, 5, 9, 40, 99)] == [1, 2, 4, 8, 16, 48, 48]


def test_concurrent_t2m_batching(tmp_path):
    cfg = tiny_test_config()
    model = UniMoEAudio(None, allow_random=True, config=cfg,
                        tokenizer=StubTokenizer(cfg), max_tokens=16, min_tokens=4)
    batcher = RequestBatcher(model, window_s=0.3, output_dir=str(tmp_path))
    futs = [
        batcher.submit("text_to_music", {"caption": f"melody {i}", "seed": 1})
        for i in range(3)
    ]
    paths = [f.result(timeout=600) for f in futs]
    assert len(set(paths)) == 3
    assert all(p.endswith(".wav") for p in paths)
    batcher.close()


def test_train_save_serve_round_trip(tmp_path):
    """Trainer.save_pretrained output loads straight into UniMoEAudio."""
    import jax
    import jax.numpy as jnp

    from unimoe_audio_tpu.models.model import init_model_params
    from unimoe_audio_tpu.train.trainer import Trainer, TrainerConfig

    cfg = tiny_test_config()
    params = init_model_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    tr = Trainer(cfg, params, TrainerConfig(total_steps=1, warmup_steps=0,
                                            save_every=0, ckpt_dir=None,
                                            remat=False))
    out_dir = str(tmp_path / "export")
    tr.save_pretrained(out_dir)

    m = UniMoEAudio(out_dir, dtype=jnp.float32, tokenizer=StubTokenizer(cfg),
                    max_tokens=12, min_tokens=4)
    assert m.config.codec_channels == cfg.codec_channels
    paths = m.text_to_music("roundtrip", output_dir=str(tmp_path), seed=0)
    assert len(paths) == 1


def _make_model(tmp_path, max_tokens=16):
    cfg = tiny_test_config()
    return UniMoEAudio(None, allow_random=True, config=cfg,
                       tokenizer=StubTokenizer(cfg), max_tokens=max_tokens,
                       min_tokens=4)


def _ref_wav(model, tmp_path, name="ref.wav"):
    from unimoe_audio_tpu.codec import audio_io

    sr = model.dac.config.sample_rate
    t = np.linspace(0, 0.3, int(sr * 0.3), dtype=np.float32)
    path = str(tmp_path / name)
    audio_io.write_wav(path, 0.3 * np.sin(2 * np.pi * 330 * t)[None], sr)
    return path


def test_generate_mixed_matches_individual(tmp_path):
    """Greedy decode: a heterogeneous T2M+TTS batch row-matches the same
    requests run individually (batch rows don't interact)."""
    model = _make_model(tmp_path)
    ref = _ref_wav(model, tmp_path)
    codec = model.dac.encode(ref)

    reqs = [
        {"task": "text_to_music", "caption": "calm piano",
         "max_audio_seconds": 16 / 50, "min_audio_seconds": 4 / 50},
        {"task": "text_to_speech", "caption": "hello there",
         "prompt_text": "ref text", "prompt_codec": codec,
         "max_audio_seconds": 16 / 50, "min_audio_seconds": 4 / 50},
    ]
    mixed = model.generate_mixed(reqs, output_dir=str(tmp_path / "m"),
                                 do_sample=False, seed=0)
    assert len(mixed) == 2

    solo_t2m = model.text_to_music(
        "calm piano", output_dir=str(tmp_path / "a"), do_sample=False, seed=0)
    solo_tts = model.text_to_speech(
        "hello there", prompt_text="ref text", prompt_codec=codec,
        output_dir=str(tmp_path / "b"), do_sample=False, seed=0)

    from unimoe_audio_tpu.codec import audio_io

    for got, want in zip(mixed, [solo_t2m[0], solo_tts[0]]):
        a, _ = audio_io.read_wav(got)
        b, _ = audio_io.read_wav(want)
        n = min(a.shape[-1], b.shape[-1])
        np.testing.assert_allclose(a[..., :n], b[..., :n], atol=1e-6)


def test_batcher_interleaved_multitask(tmp_path):
    """Interleaved TTS + T2M requests coalesce into ONE mixed batch."""
    model = _make_model(tmp_path)
    ref = _ref_wav(model, tmp_path, "ref_b.wav")
    codec = model.dac.encode(ref)

    calls = []
    orig = model.generate_mixed

    def spy(reqs, **kw):
        calls.append(len(reqs))
        return orig(reqs, **kw)

    model.generate_mixed = spy
    batcher = RequestBatcher(model, window_s=0.4, output_dir=str(tmp_path))
    futs = [
        batcher.submit("text_to_music", {"caption": "beat one", "seed": 5,
                                         "max_audio_seconds": 16 / 50,
                                         "min_audio_seconds": 4 / 50}),
        batcher.submit("text_to_speech", {"transcription": "say this",
                                          "prompt_transcription": "ref",
                                          "prompt_codec": codec,
                                          "max_audio_seconds": 16 / 50,
                                          "min_audio_seconds": 4 / 50}),
        batcher.submit("text_to_music", {"caption": "beat two", "seed": 5,
                                         "max_audio_seconds": 16 / 50,
                                         "min_audio_seconds": 4 / 50}),
    ]
    paths = [f.result(timeout=600) for f in futs]
    batcher.close()
    assert len(set(paths)) == 3
    assert all(p.endswith(".wav") for p in paths)
    # all three interleaved tasks shared one generate_mixed batch
    assert len(calls) == 1 and calls[0] >= 3


def test_batcher_interleaved_three_tasks(tmp_path):
    """All THREE tasks (TTS + T2M + VT2M) coalesce into one mixed batch."""
    from tests.test_vt2m import VisionStubTokenizer

    cfg = tiny_test_config(with_vision=True)
    model = UniMoEAudio(None, allow_random=True, config=cfg,
                        tokenizer=VisionStubTokenizer(cfg), max_tokens=16,
                        min_tokens=4)
    ref = _ref_wav(model, tmp_path, "ref3.wav")
    codec = model.dac.encode(ref)
    video = np.random.default_rng(0).uniform(
        0, 255, size=(2, 3, 56, 56)).astype(np.float32)

    calls = []
    orig = model.generate_mixed

    def spy(reqs, **kw):
        calls.append([r["task"] for r in reqs])
        return orig(reqs, **kw)

    model.generate_mixed = spy
    batcher = RequestBatcher(model, window_s=0.5, output_dir=str(tmp_path))
    futs = [
        batcher.submit("text_to_music", {"caption": "beat", "seed": 7,
                                         "max_audio_seconds": 16 / 50,
                                         "min_audio_seconds": 4 / 50}),
        batcher.submit("video_text_to_music", {"caption": "drums",
                                               "video": video,
                                               "max_frames": 2,
                                               "max_audio_seconds": 16 / 50,
                                               "min_audio_seconds": 4 / 50}),
        batcher.submit("text_to_speech", {"caption": "speak", "prompt_text": "r",
                                          "prompt_codec": codec,
                                          "max_audio_seconds": 16 / 50,
                                          "min_audio_seconds": 4 / 50}),
    ]
    paths = [f.result(timeout=900) for f in futs]
    batcher.close()
    assert len(set(paths)) == 3 and all(p.endswith(".wav") for p in paths)
    assert len(calls) == 1
    assert set(calls[0][:3]) == {"text_to_music", "video_text_to_music",
                                 "text_to_speech"}


def test_per_request_seed_composition_independent(tmp_path):
    """A seeded request's SAMPLED output is identical whether it runs alone
    or shares a batch with other requests (per-sample seed chains)."""
    model = _make_model(tmp_path)
    from unimoe_audio_tpu.codec import audio_io

    req = {"task": "text_to_music", "caption": "same tune", "seed": 42,
           "max_audio_seconds": 16 / 50, "min_audio_seconds": 4 / 50}
    other = {"task": "text_to_music", "caption": "different thing", "seed": 7,
             "max_audio_seconds": 16 / 50, "min_audio_seconds": 4 / 50}

    solo = model.generate_mixed([req], output_dir=str(tmp_path / "solo"))
    mixed = model.generate_mixed([other, req], output_dir=str(tmp_path / "mix"))

    a, _ = audio_io.read_wav(solo[0])
    b, _ = audio_io.read_wav(mixed[1])
    n = min(a.shape[-1], b.shape[-1])
    np.testing.assert_allclose(a[..., :n], b[..., :n], atol=1e-6)
