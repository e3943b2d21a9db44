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
