"""Serving-entry tests: multi-device mesh serving on the virtual CPU mesh
(the reference's multi-GPU EP inference path, multi_gpu_with_ep.py),
TTFA latency harness."""

import numpy as np
import jax
import pytest

from tests.test_api import StubTokenizer
from unimoe_audio_tpu.apps.serve import build_server, measure_ttfa
from unimoe_audio_tpu.codec import audio_io
from unimoe_audio_tpu.config import tiny_test_config


def test_mesh_served_generation(tmp_path):
    cfg = tiny_test_config(
        hidden_size=64, num_attention_heads=4, num_key_value_heads=2,
        mlp_dynamic_expert_num=4, dynamic_intermediate_size=64,
        shared_intermediate_size=32,
    )
    model = build_server(
        None, ep_size=2, tp_size=2, allow_random=True,
        tokenizer=StubTokenizer(cfg), config=cfg, max_tokens=16, min_tokens=4,
    )
    paths = model.text_to_music("served melody", output_dir=str(tmp_path), seed=0)
    assert len(paths) == 1
    audio, _ = audio_io.read_wav(paths[0])
    assert np.isfinite(audio).all()


def test_ttfa_harness():
    cfg = tiny_test_config()
    model = build_server(
        None, allow_random=True, tokenizer=StubTokenizer(cfg), config=cfg,
        max_tokens=16, min_tokens=4,
    )
    stats = measure_ttfa(model, n_trials=2)
    assert stats["p50_ttfa_s"] > 0 and np.isfinite(stats["p50_ttfa_s"])


def test_mesh_served_quantized_generation(tmp_path):
    """int8 params shard onto the mesh (QTensor-aware specs) and serve."""
    cfg = tiny_test_config(
        hidden_size=64, num_attention_heads=4, num_key_value_heads=2,
        mlp_dynamic_expert_num=4, dynamic_intermediate_size=64,
        shared_intermediate_size=32,
    )
    model = build_server(
        None, ep_size=2, tp_size=2, allow_random=True, quantize=True,
        tokenizer=StubTokenizer(cfg), config=cfg, max_tokens=12, min_tokens=4,
    )
    from unimoe_audio_tpu.ops.quant import QTensor
    w = model.params["layers"]["attn"]["q_proj"]["w"]
    assert isinstance(w, QTensor)
    # q sharded over the model axis; scale follows where dims survive.
    assert "model" in str(w.q.sharding.spec)
    dyn = model.params["layers"]["moe"]["dynamic"]["down"]
    assert "expert" in str(dyn.q.sharding.spec)
    # down's scale has a size-1 dim where the weight sharded 'model' on F:
    # the spec must drop it there.
    assert "model" not in str(dyn.s.sharding.spec).split(",")[2]
    paths = model.text_to_music("quantized served", output_dir=str(tmp_path), seed=0)
    assert len(paths) == 1


def test_mesh_served_int4_generation(tmp_path):
    """int4 (s4) expert leaves shard onto the mesh through the jit
    widen→repack path (device_put of s4 across a relayout recurses on
    this jax version, so shard_params must never relayout s4 directly)
    and serve end-to-end."""
    import jax.numpy as jnp

    cfg = tiny_test_config(
        hidden_size=64, num_attention_heads=4, num_key_value_heads=2,
        mlp_dynamic_expert_num=4, dynamic_intermediate_size=64,
        shared_intermediate_size=32,
    )
    model = build_server(
        None, ep_size=2, tp_size=2, allow_random=True, quantize="int4",
        tokenizer=StubTokenizer(cfg), config=cfg, max_tokens=12, min_tokens=4,
    )
    dyn = model.params["layers"]["moe"]["dynamic"]["down"]
    assert dyn.q.dtype == jnp.int4
    assert "expert" in str(dyn.q.sharding.spec)
    # attention stays int8: only expert FFNs take the s4 latency trade.
    assert model.params["layers"]["attn"]["q_proj"]["w"].q.dtype == jnp.int8
    paths = model.text_to_music("int4 served", output_dir=str(tmp_path), seed=0)
    assert len(paths) == 1
    audio, _ = audio_io.read_wav(paths[0])
    assert np.isfinite(audio).all()


def test_mesh_served_packed_dispatch_batch(tmp_path):
    """Capacity-packed dispatch (serving_mode auto-engages at >= 32
    streams) under an ep x tp sharded int8 mesh: the one-hot dispatch /
    combine einsums shard via GSPMD and the batch serves end-to-end."""
    cfg = tiny_test_config(
        hidden_size=64, num_attention_heads=4, num_key_value_heads=2,
        mlp_dynamic_expert_num=4, dynamic_intermediate_size=64,
        shared_intermediate_size=32,
    )
    model = build_server(
        None, ep_size=2, tp_size=2, allow_random=True, quantize=True,
        tokenizer=StubTokenizer(cfg), config=cfg, max_tokens=12, min_tokens=4,
    )
    assert model.serving_mode
    # 36 streams -> 72 CFG rows: decode_dispatch_mode='packed' engages.
    paths = model.text_to_music(["tune %d" % i for i in range(36)],
                                output_dir=str(tmp_path), seed=0)
    assert len(paths) == 36
    audio, _ = audio_io.read_wav(paths[0])
    assert np.isfinite(audio).all()


def test_serve_cli_continuous_mode(tmp_path, monkeypatch, capsys):
    """serve.py --requests --continuous: requests ride the rolling slot
    server; a malformed request fails alone."""
    import json
    import sys

    import unimoe_audio_tpu.apps.serve as serve_mod

    cfg = tiny_test_config()
    model = build_server(
        None, allow_random=True, tokenizer=StubTokenizer(cfg), config=cfg,
        max_tokens=16, min_tokens=4,
    )
    monkeypatch.setattr(serve_mod, "build_server", lambda *a, **k: model)

    reqs = [
        {"task": "text_to_music", "caption": "calm tune",
         "max_audio_seconds": 12 / 50, "min_audio_seconds": 4 / 50},
        {"task": "text_to_music"},  # malformed: no caption
        {"task": "text_to_music", "caption": "fast drums",
         "max_audio_seconds": 10 / 50, "min_audio_seconds": 4 / 50},
    ]
    rf = str(tmp_path / "reqs.json")
    json.dump(reqs, open(rf, "w"))
    monkeypatch.setattr(sys, "argv", [
        "serve", "--requests", rf, "--continuous", "--slots", "2",
        "--chunk-frames", "4", "--output", str(tmp_path / "cont"),
    ])
    assert serve_mod.main() == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["outputs"][0] and out["outputs"][2]
    assert out["outputs"][1] is None
    assert out["errors"] and out["errors"][0]["index"] == 1


def test_serve_cli_full_task_surface(tmp_path, monkeypatch, capsys):
    """serve.py main() routes TTS and the --requests batcher path (the
    reference EP inference scripts are task-agnostic); a malformed request
    in the batch fails alone without sinking the others."""
    import json
    import sys

    import unimoe_audio_tpu.apps.serve as serve_mod

    cfg = tiny_test_config()
    model = build_server(
        None, allow_random=True, tokenizer=StubTokenizer(cfg), config=cfg,
        max_tokens=16, min_tokens=4,
    )
    monkeypatch.setattr(serve_mod, "build_server", lambda *a, **k: model)

    # voice prompt for TTS
    sr = model.dac.config.sample_rate
    t = np.linspace(0, 0.3, int(sr * 0.3), dtype=np.float32)
    ref = str(tmp_path / "ref.wav")
    audio_io.write_wav(ref, 0.3 * np.sin(2 * np.pi * 220 * t)[None], sr)

    monkeypatch.setattr(sys, "argv", [
        "serve", "--task", "text_to_speech", "--input", "hello world",
        "--prompt-text", "ref text", "--prompt-wav", ref,
        "--output", str(tmp_path / "tts"),
    ])
    assert serve_mod.main() == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["outputs"] and out["outputs"][0].endswith(".wav")

    # --requests: heterogeneous batch; row 1 malformed (empty caption)
    reqs = [
        {"task": "text_to_music", "caption": "calm tune",
         "max_audio_seconds": 16 / 50, "min_audio_seconds": 4 / 50},
        {"task": "text_to_music", "caption": "   "},
    ]
    rf = str(tmp_path / "reqs.json")
    json.dump(reqs, open(rf, "w"))
    monkeypatch.setattr(sys, "argv", [
        "serve", "--requests", rf, "--output", str(tmp_path / "srv"),
    ])
    assert serve_mod.main() == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["outputs"][0] and out["outputs"][0].endswith(".wav")
    assert out["outputs"][1] is None
    assert out["errors"] and out["errors"][0]["index"] == 1


def test_mesh_served_int8_kv_generation(tmp_path):
    """--kv-cache int8 through build_server on an ep*tp mesh: the decode
    KV cache is int8 (per-position scales) while params ride the mesh."""
    cfg = tiny_test_config(
        hidden_size=64, num_attention_heads=4, num_key_value_heads=2,
        mlp_dynamic_expert_num=4, dynamic_intermediate_size=64,
        shared_intermediate_size=32,
    )
    model = build_server(
        None, ep_size=2, tp_size=2, allow_random=True, quantize=True,
        tokenizer=StubTokenizer(cfg), config=cfg, max_tokens=16,
        min_tokens=4, kv_cache="int8",
    )
    assert model.kv_cache_dtype == "int8"
    paths = model.text_to_music("served melody", output_dir=str(tmp_path),
                                seed=0)
    audio, _ = audio_io.read_wav(paths[0])
    assert np.isfinite(audio).all()
