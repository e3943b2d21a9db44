"""VT2M end-to-end: synthetic video → vision tower → fused generation → wav.
Also covers mRoPE index computation for video sequences and the patch
flattening layout."""

import numpy as np
import pytest

from unimoe_audio_tpu.api import UniMoEAudio
from unimoe_audio_tpu.apps.video import video_to_patches
from unimoe_audio_tpu.codec import audio_io
from unimoe_audio_tpu.config import tiny_test_config
from unimoe_audio_tpu.models.model import get_rope_index
from tests.test_api import StubTokenizer


class VisionStubTokenizer(StubTokenizer):
    def __init__(self, cfg):
        super().__init__(cfg)
        self.special["<|vision_start|>"] = cfg.vision_start_token_id
        self.special["<|vision_end|>"] = cfg.vision_end_token_id
        self.special["<|video_pad|>"] = cfg.video_token_id


def test_video_to_patches_layout():
    video = np.arange(2 * 3 * 28 * 28, dtype=np.float32).reshape(2, 3, 28, 28)
    flat, grid = video_to_patches(video, patch_size=14, temporal_patch_size=2, merge_size=2)
    assert list(grid) == [1, 2, 2]
    assert flat.shape == (4, 3 * 2 * 14 * 14)
    # Odd frame count pads by repeating the last frame.
    flat2, grid2 = video_to_patches(video[:1], patch_size=14, temporal_patch_size=2,
                                    merge_size=2)
    assert list(grid2) == [1, 2, 2]


def test_get_rope_index_video():
    cfg = tiny_test_config(with_vision=True)
    # layout: [text, text, vstart, vid×4, vend, text]
    V = cfg.video_token_id
    ids = np.array([[7, 8, cfg.vision_start_token_id, V, V, V, V,
                     cfg.vision_end_token_id, 9]])
    grid = np.array([[1, 4, 4]])  # merged 2×2 ⇒ 4 video tokens
    pos, deltas = get_rope_index(ids, cfg, video_grid_thw=grid,
                                 second_per_grid_ts=[1.0])
    assert pos.shape == (3, 1, 9)
    # Text prefix: all three axes advance together 0,1,2.
    np.testing.assert_array_equal(pos[:, 0, :3], [[0, 1, 2]] * 3)
    # Video block: t stays, h/w scan the 2×2 grid, offset by 3.
    np.testing.assert_array_equal(pos[0, 0, 3:7], [3, 3, 3, 3])
    np.testing.assert_array_equal(pos[1, 0, 3:7], [3, 3, 4, 4])
    np.testing.assert_array_equal(pos[2, 0, 3:7], [3, 4, 3, 4])
    # Tail text continues after the max video position + 1.
    assert pos[0, 0, 7] == 5 and pos[0, 0, 8] == 6


@pytest.fixture(scope="module")
def vmodel():
    cfg = tiny_test_config(with_vision=True)
    return UniMoEAudio(
        None, allow_random=True, config=cfg, tokenizer=VisionStubTokenizer(cfg),
        max_tokens=20, min_tokens=4,
    )


def test_video_text_to_music_end_to_end(vmodel, tmp_path):
    rng = np.random.default_rng(0)
    # Two RGB frames, 56×56 (pre-extracted ndarray path).
    video = rng.uniform(0, 255, size=(2, 3, 56, 56)).astype(np.float32)
    paths = vmodel.video_text_to_music(
        video=[video], caption=["drums"], output_dir=str(tmp_path), seed=0,
        max_frames=2,
    )
    assert len(paths) == 1 and paths[0].endswith(".wav")
    audio, _ = audio_io.read_wav(paths[0])
    assert np.isfinite(audio).all()


def test_vt2m_falls_back_without_vision(tmp_path):
    cfg = tiny_test_config(with_vision=False)
    m = UniMoEAudio(
        None, allow_random=True, config=cfg, tokenizer=StubTokenizer(cfg),
        max_tokens=16, min_tokens=4,
    )
    paths = m.video_text_to_music(video=["x.mp4"], caption=["calm"],
                                  output_dir=str(tmp_path), seed=1)
    assert len(paths) == 1
