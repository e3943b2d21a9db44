"""Golden tests against HuggingFace's ACTUAL Qwen2.5-VL modules — the same
classes the reference instantiates (utils/UniMoE_Audio_model.py:52-58
imports Qwen2_5_VLAttention / Qwen2RMSNorm / Qwen2_5_VLRotaryEmbedding;
utils/UniMoE_Audio_utils.py:575 the vision blocks).  Validates rope
conventions, GQA attention, and the full vision tower with converted
weights against upstream, not a hand-written oracle."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import pytest

from unimoe_audio_tpu.config import TextMoEConfig, VisionConfig
from unimoe_audio_tpu.models.layers import attention, compute_mrope, init_attention_params
from unimoe_audio_tpu.models.vision import init_vision_params, vision_forward
from unimoe_audio_tpu.core.convert import convert_vision_state_dict


def make_hf_text_config(tc: TextMoEConfig):
    from transformers.models.qwen2_5_vl.configuration_qwen2_5_vl import (
        Qwen2_5_VLTextConfig,
    )

    return Qwen2_5_VLTextConfig(
        hidden_size=tc.hidden_size,
        num_attention_heads=tc.num_attention_heads,
        num_key_value_heads=tc.num_key_value_heads,
        rope_theta=tc.rope_theta,
        max_position_embeddings=tc.max_position_embeddings,
        rope_scaling={"type": "default", "mrope_section": list(tc.mrope_section)},
        attention_dropout=0.0,
        vocab_size=128,
        intermediate_size=64,
        num_hidden_layers=1,
        _attn_implementation="eager",
    )


@pytest.mark.parametrize("multimodal_positions", [False, True])
def test_attention_matches_hf(multimodal_positions):
    """My GQA attention + mRoPE == HF Qwen2_5_VLAttention with the same
    weights, for both text-style (all rows equal) and true 3-D positions."""
    from transformers.models.qwen2_5_vl.modeling_qwen2_5_vl import (
        Qwen2_5_VLAttention, Qwen2_5_VLRotaryEmbedding,
    )

    tc = TextMoEConfig(
        hidden_size=64, num_attention_heads=4, num_key_value_heads=2,
        mrope_section=(4, 2, 2),  # sums to head_dim/2 = 8
        num_hidden_layers=1, vocab_size=128,
    )
    hf_cfg = make_hf_text_config(tc)
    torch.manual_seed(0)
    hf_attn = Qwen2_5_VLAttention(hf_cfg, layer_idx=0).eval()
    rope = Qwen2_5_VLRotaryEmbedding(hf_cfg)

    B, T = 2, 10
    x = torch.randn(B, T, tc.hidden_size) * 0.5
    if multimodal_positions:
        pos = torch.stack([
            torch.arange(T).repeat(B, 1),
            torch.arange(T).repeat(B, 1) // 2,
            torch.arange(T).repeat(B, 1) // 3,
        ])  # [3, B, T] distinct rows
    else:
        pos = torch.arange(T).repeat(B, 1).unsqueeze(0).expand(3, B, T)
    cos_sin = rope(x, pos)
    mask = torch.zeros(B, 1, T, T)
    mask = mask.masked_fill(
        ~torch.tril(torch.ones(T, T, dtype=torch.bool)), float("-inf")
    )
    with torch.no_grad():
        want = hf_attn(x, attention_mask=mask, position_embeddings=cos_sin)[0]

    # Port the weights.
    params = {
        name: {
            "w": jnp.asarray(getattr(hf_attn, name).weight.detach().numpy().T),
            **({"b": jnp.asarray(getattr(hf_attn, name).bias.detach().numpy())}
               if getattr(hf_attn, name).bias is not None else {}),
        }
        for name in ("q_proj", "k_proj", "v_proj", "o_proj")
    }
    cos, sin = compute_mrope(
        jnp.asarray(pos.numpy()), tc.head_dim, tc.rope_theta, tc.mrope_section
    )
    got, _ = attention(
        params, jnp.asarray(x.numpy()), cos, sin, tc, use_flash=False,
    )
    np.testing.assert_allclose(
        np.asarray(got), want.numpy(), rtol=2e-4, atol=2e-5,
    )


def test_vision_tower_matches_hf():
    """My vision tower with weights converted FROM an HF vision transformer
    produces the same features (patch embed, window shuffle, blocks,
    merger, unshuffle)."""
    from transformers.models.qwen2_5_vl.configuration_qwen2_5_vl import (
        Qwen2_5_VLVisionConfig,
    )
    from transformers.models.qwen2_5_vl.modeling_qwen2_5_vl import (
        Qwen2_5_VisionTransformerPretrainedModel,
    )

    hf_vcfg = Qwen2_5_VLVisionConfig(
        depth=3, hidden_size=32, intermediate_size=64, num_heads=4,
        in_channels=3, patch_size=2, temporal_patch_size=2,
        spatial_merge_size=2, out_hidden_size=48, window_size=8,
        fullatt_block_indexes=[1], _attn_implementation="eager",
    )
    torch.manual_seed(1)
    hf_tower = Qwen2_5_VisionTransformerPretrainedModel(hf_vcfg).eval().float()

    vcfg = VisionConfig(
        depth=3, hidden_size=32, intermediate_size=64, num_heads=4,
        in_channels=3, patch_size=2, temporal_patch_size=2,
        spatial_merge_size=2, out_hidden_size=48, window_size=8,
        fullatt_block_indexes=(1,),
    )
    sd = {f"visual.{k}": v for k, v in hf_tower.state_dict().items()}
    params = jax.tree.map(jnp.asarray, convert_vision_state_dict(sd, vcfg))

    grid = np.array([[1, 8, 8]])
    S = int(grid.prod())
    patch_dim = 3 * 2 * 2 * 2
    patches = torch.randn(S, patch_dim) * 0.5
    with torch.no_grad():
        want = hf_tower(patches, grid_thw=torch.tensor(grid)).numpy()

    got = np.asarray(vision_forward(params, jnp.asarray(patches.numpy()), grid, vcfg))
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)
