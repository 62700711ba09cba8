"""Converter robustness: key translation rules + error paths."""

import numpy as np
import pytest

from stableanimator_tpu.convert.torch_to_jax import (
    _unet_key,
    _vae_key,
    convert_pose_net,
    convert_unet,
)


class TestKeyTranslation:
    def test_unet_keys(self):
        cases = {
            "conv_in.weight": ("conv_in",),
            "time_embedding.linear_1.weight": ("time_embedding", "linear_1"),
            "down_blocks.0.resnets.1.spatial_res_block.norm1.weight":
                ("down_blocks_0", "resnets_1", "spatial_res_block", "norm1"),
            "down_blocks.0.attentions.0.transformer_blocks.0.attn2.processor.id_to_k.weight":
                ("down_blocks_0", "attentions_0", "transformer_blocks_0",
                 "attn2", "id_to_k"),
            "mid_block.attentions.0.transformer_blocks.0.ff.net.0.proj.weight":
                ("mid_block", "attentions_0", "transformer_blocks_0", "ff",
                 "act", "proj"),
            "up_blocks.1.attentions.2.transformer_blocks.0.attn1.to_out.0.bias":
                ("up_blocks_1", "attentions_2", "transformer_blocks_0",
                 "attn1", "to_out"),
            "down_blocks.0.resnets.0.time_mixer.mix_factor":
                ("down_blocks_0", "resnets_0", "time_mixer", "mix_factor"),
        }
        for torch_key, expected in cases.items():
            assert _unet_key(torch_key) == expected, torch_key

    def test_vae_keys(self):
        cases = {
            "quant_conv.weight": ("quant_conv",),
            "encoder.conv_in.weight": ("encoder", "conv_in"),
            "encoder.down_blocks.0.resnets.1.norm1.weight":
                ("encoder", "down_blocks_0_resnets_1", "norm1"),
            "decoder.mid_block.attentions.0.to_out.0.weight":
                ("decoder", "mid_block_attentions_0", "to_out"),
            "decoder.up_blocks.2.resnets.0.temporal_res_block.conv1.weight":
                ("decoder", "up_blocks_2_resnets_0", "temporal_res_block",
                 "conv1"),
            "decoder.time_conv_out.bias": ("decoder", "time_conv_out"),
        }
        for torch_key, expected in cases.items():
            assert _vae_key(torch_key) == expected, torch_key


class TestLeafLayouts:
    def test_conv_and_linear_transposes(self):
        sd = {
            "conv_layers.0.weight": np.zeros((4, 3, 3, 3), np.float32),
            "conv_layers.0.bias": np.zeros((4,), np.float32),
            "final_proj.weight": np.zeros((32, 4, 1, 1), np.float32),
            "final_proj.bias": np.zeros((32,), np.float32),
            "scale": np.ones((1,), np.float32),
        }
        params = convert_pose_net(sd)["params"]
        assert params["conv_layers_0"]["kernel"].shape == (3, 3, 3, 4)
        assert params["final_proj"]["kernel"].shape == (1, 1, 4, 32)
        assert params["scale"].shape == (1,)

    def test_unmapped_key_raises(self):
        with pytest.raises(ValueError, match="unmapped"):
            convert_unet({"totally.unknown.thing": np.zeros((2, 2), np.float32),
                          "conv_in.weight": np.zeros((4, 3, 3, 3), np.float32)})
