"""Shipped-fixture compatibility: the batch framework loads the example
config/tasks files (including the reference's fixture schema)."""

import os

from unimoe_audio_tpu.apps.inference_framework import (
    FrameworkConfig,
    TaskConfig,
    load_config_from_file,
    load_tasks_from_file,
)

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_load_example_fixtures():
    cfg = load_config_from_file(os.path.join(ROOT, "examples", "test_config.json"))
    assert isinstance(cfg, FrameworkConfig)
    assert cfg.max_concurrent_tasks == 1

    tasks = load_tasks_from_file(os.path.join(ROOT, "examples", "test_tasks.json"))
    assert len(tasks) == 4
    assert all(isinstance(t, TaskConfig) for t in tasks)
    # Both key spellings land in prompt_wav/prompt_text.
    tts = [t for t in tasks if t.task_type == "text_to_speech"]
    assert all(t.prompt_wav and t.prompt_text for t in tts)


def test_load_reference_fixture_schema(tmp_path):
    """The REFERENCE repo's own test_tasks.json (reference_audio spelling,
    which crashes the reference's TaskConfig) loads here."""
    import json

    tasks = [{
        "task_type": "text_to_speech",
        "task_id": "ref_001",
        "target_text": "hello",
        "reference_audio": "/x/ref.wav",
        "reference_text": "ref transcript",
        "output_path": "./out",
    }]
    p = tmp_path / "tasks.json"
    p.write_text(json.dumps(tasks))
    loaded = load_tasks_from_file(str(p))
    assert loaded[0].prompt_wav == "/x/ref.wav"
    assert loaded[0].prompt_text == "ref transcript"


def test_yaml_fixture(tmp_path):
    p = tmp_path / "tasks.yaml"
    p.write_text(
        "- task_type: text_to_music\n  task_id: y1\n  caption: calm\n"
    )
    loaded = load_tasks_from_file(str(p))
    assert loaded[0].caption == "calm"
