# Tensor-name normalization table tests (reference: src/tensor_name_conv.c).
import pytest

from mlimgsynth_tpu.nameconv import QKV, normalize_lora_name, normalize_name

CASES = [
    # CompVis SD1 CLIP
    ("cond_stage_model.transformer.text_model.embeddings.token_embedding.weight",
     "clip.text.embed.token.weight"),
    ("cond_stage_model.transformer.text_model.embeddings.position_embedding.weight",
     "clip.text.embed.position.weight"),
    ("cond_stage_model.transformer.text_model.encoder.layers.11.self_attn.k_proj.weight",
     "clip.text.encoder.layers.11.attn.k_proj.weight"),
    ("cond_stage_model.transformer.text_model.encoder.layers.0.layer_norm1.bias",
     "clip.text.encoder.layers.0.norm1.bias"),
    ("cond_stage_model.transformer.text_model.encoder.layers.3.mlp.fc1.weight",
     "clip.text.encoder.layers.3.mlp.fc1.weight"),
    ("cond_stage_model.transformer.text_model.final_layer_norm.weight",
     "clip.text.ln_final.weight"),
    # OpenCLIP SD2
    ("cond_stage_model.model.ln_final.weight", "clip.text.ln_final.weight"),
    ("cond_stage_model.model.token_embedding.weight",
     "clip.text.embed.token.weight"),
    ("cond_stage_model.model.positional_embedding",
     "clip.text.embed.position.weight"),
    ("cond_stage_model.model.transformer.resblocks.5.ln_1.weight",
     "clip.text.encoder.layers.5.norm1.weight"),
    ("cond_stage_model.model.transformer.resblocks.5.attn.out_proj.weight",
     "clip.text.encoder.layers.5.attn.out_proj.weight"),
    ("cond_stage_model.model.transformer.resblocks.5.mlp.c_fc.bias",
     "clip.text.encoder.layers.5.mlp.fc1.bias"),
    ("cond_stage_model.model.transformer.resblocks.5.mlp.c_proj.weight",
     "clip.text.encoder.layers.5.mlp.fc2.weight"),
    # SDXL dual encoders
    ("conditioner.embedders.0.transformer.text_model.encoder.layers.2.self_attn.q_proj.bias",
     "clip.text.encoder.layers.2.attn.q_proj.bias"),
    ("conditioner.embedders.1.model.text_projection", "clip2.text.text_proj"),
    ("conditioner.embedders.1.model.transformer.resblocks.30.attn.out_proj.bias",
     "clip2.text.encoder.layers.30.attn.out_proj.bias"),
    # VAE
    ("first_stage_model.decoder.conv_in.weight", "vae.decoder.conv_in.weight"),
    ("first_stage_model.decoder.up.3.block.1.nin_shortcut.weight",
     "vae.decoder.up.3.block.1.skip_conv.weight"),
    ("first_stage_model.encoder.down.0.block.0.norm1.weight",
     "vae.encoder.down.0.block.0.norm1.weight"),
    ("first_stage_model.encoder.mid.attn_1.q.weight",
     "vae.encoder.mid.attn_1.q.weight"),
    ("first_stage_model.quant_conv.bias", "vae.quant_conv.bias"),
    ("first_stage_model.post_quant_conv.weight", "vae.post_quant_conv.weight"),
    # UNet CompVis
    ("model.diffusion_model.time_embed.0.weight", "unet.time_embed.0.weight"),
    ("model.diffusion_model.label_emb.0.0.weight", "unet.label_embed.0.weight"),
    ("model.diffusion_model.input_blocks.0.0.weight", "unet.in.conv.weight"),
    ("model.diffusion_model.out.0.weight", "unet.out.norm.weight"),
    ("model.diffusion_model.out.2.weight", "unet.out.conv.weight"),
    ("model.diffusion_model.input_blocks.1.0.in_layers.0.weight",
     "unet.in.1.0.norm1.weight"),
    ("model.diffusion_model.input_blocks.1.0.in_layers.2.weight",
     "unet.in.1.0.conv1.weight"),
    ("model.diffusion_model.input_blocks.1.1.transformer_blocks.0.attn2.to_k.weight",
     "unet.in.1.1.transf.0.attn2.k_proj.weight"),
    ("model.diffusion_model.input_blocks.1.1.transformer_blocks.0.ff.net.0.proj.weight",
     "unet.in.1.1.transf.0.ff.net.0.proj.weight"),
    ("model.diffusion_model.input_blocks.3.0.op.weight", "unet.in.3.0.conv.weight"),
    ("model.diffusion_model.input_blocks.4.0.skip_connection.weight",
     "unet.in.4.0.skip_conv.weight"),
    ("model.diffusion_model.middle_block.0.emb_layers.1.weight",
     "unet.mid.0.emb_proj.weight"),
    ("model.diffusion_model.middle_block.1.proj_in.weight",
     "unet.mid.1.proj_in.weight"),
    ("model.diffusion_model.output_blocks.2.1.conv.weight",
     "unet.out.2.1.conv.weight"),
    ("model.diffusion_model.output_blocks.5.1.transformer_blocks.0.norm3.weight",
     "unet.out.5.1.transf.0.norm3.weight"),
    # UNet diffusers (index arithmetic, tensor_name_conv.c:236-268)
    ("unet.down_blocks.0.resnets.0.norm1.weight", "unet.in.1.0.norm1.weight"),
    ("unet.down_blocks.0.attentions.1.proj_out.weight",
     "unet.in.2.1.proj_out.weight"),
    ("unet.down_blocks.0.downsamplers.0.conv.weight", "unet.in.3.0.conv.weight"),
    ("unet.down_blocks.1.resnets.0.conv1.weight", "unet.in.4.0.conv1.weight"),
    ("unet.up_blocks.0.resnets.2.conv2.weight", "unet.out.2.0.conv2.weight"),
    ("unet.up_blocks.0.upsamplers.0.conv.weight", "unet.out.2.1.conv.weight"),
    ("unet.up_blocks.1.upsamplers.0.conv.weight", "unet.out.5.2.conv.weight"),
    ("unet.mid_block.attentions.0.transformer_blocks.0.attn1.to_q.weight",
     "unet.mid.1.transf.0.attn1.q_proj.weight"),
    ("unet.mid_block.resnets.0.conv1.weight", "unet.mid.0.conv1.weight"),
    ("unet.mid_block.resnets.1.conv2.weight", "unet.mid.2.conv2.weight"),
    # diffusers te
    ("te.text_model.encoder.layers.7.self_attn.v_proj.weight",
     "clip.text.encoder.layers.7.attn.v_proj.weight"),
    ("te2.text_model.encoder.layers.7.mlp.fc1.weight",
     "clip2.text.encoder.layers.7.mlp.fc1.weight"),
    # Unused tensors
    ("model_ema.decay", None),
    ("alphas_cumprod", None),
    ("cond_stage_model.logit_scale", None),
]


@pytest.mark.parametrize("name,expected", CASES, ids=[c[0] for c in CASES])
def test_normalize(name, expected):
    assert normalize_name(name) == expected


def test_qkv_split_marker():
    r = normalize_name(
        "cond_stage_model.model.transformer.resblocks.4.attn.in_proj_weight")
    assert isinstance(r, QKV)
    assert r.name == "clip.text.encoder.layers.4.attn.in_proj_weight"
    r = normalize_name(
        "conditioner.embedders.1.model.transformer.resblocks.0.attn.in_proj_bias")
    assert isinstance(r, QKV)
    assert r.name == "clip2.text.encoder.layers.0.attn.in_proj_bias"


def test_separator_equivalence():
    # '.', '_', '/' are interchangeable separators in the source name
    assert normalize_name(
        "model/diffusion_model/time_embed/0/weight") == "unet.time_embed.0.weight"


def test_lora_names():
    assert normalize_lora_name(
        "lora_unet.input_blocks.1.1.transformer_blocks.0.attn2.to_k.weight"
        ) == "unet.in.1.1.transf.0.attn2.k_proj.weight"
    assert normalize_lora_name("not_a_lora.weight") is None
    # kohya SDXL dual-tower prefixes
    assert normalize_lora_name(
        "lora_te1_text_model_encoder_layers_0_self_attn_q_proj"
        ".lora_down.weight") == \
        "clip.text.encoder.layers.0.attn.q_proj.lora_down.weight"
    assert normalize_lora_name(
        "lora_te2_text_model_encoder_layers_3_mlp_fc1.lora_up.weight") == \
        "clip2.text.encoder.layers.3.mlp.fc1.lora_up.weight"


def test_sd3_layout_names():
    from mlimgsynth_tpu.nameconv import TProj, normalize_name as nn
    assert nn("model.diffusion_model.joint_blocks.3.x_block.attn.qkv"
              ".weight") == "mmdit.joint_blocks.3.x_block.attn.qkv.weight"
    assert nn("model.diffusion_model.pos_embed") == "mmdit.pos_embed"
    assert nn("model.diffusion_model.final_layer.linear.weight") \
        == "mmdit.final_layer.linear.weight"
    assert nn("text_encoders.clip_l.transformer.text_model.encoder.layers"
              ".0.self_attn.q_proj.weight") \
        == "clip.text.encoder.layers.0.attn.q_proj.weight"
    r = nn("text_encoders.clip_g.transformer.text_model.text_projection"
           ".weight")
    assert isinstance(r, TProj) and r.name == "clip2.text.text_proj"
    assert nn("text_encoders.t5xxl.transformer.shared.weight") \
        == "t5.shared.weight"
    assert nn("text_encoders.t5xxl.transformer.encoder.block.0.layer.0"
              ".SelfAttention.q.weight") \
        == "t5.encoder.block.0.layer.0.SelfAttention.q.weight"


def test_flux_layout_names():
    from mlimgsynth_tpu.nameconv import normalize_name as nn
    # bare (bfl distribution) tails
    assert nn("double_blocks.0.img_attn.qkv.weight") \
        == "flux.double_blocks.0.img_attn.qkv.weight"
    assert nn("single_blocks.7.linear1.weight") \
        == "flux.single_blocks.7.linear1.weight"
    assert nn("guidance_in.in_layer.weight") \
        == "flux.guidance_in.in_layer.weight"
    assert nn("final_layer.adaLN_modulation.1.weight") \
        == "flux.final_layer.adaLN_modulation.1.weight"
    # prefixed (ComfyUI-style single files)
    assert nn("model.diffusion_model.double_blocks.0.txt_mod.lin.weight") \
        == "flux.double_blocks.0.txt_mod.lin.weight"
    # bare VAE files (flux ae.safetensors)
    assert nn("decoder.up.3.block.1.nin_shortcut.weight") \
        == "vae.decoder.up.3.block.1.skip_conv.weight"
    assert nn("encoder.conv_in.bias") == "vae.encoder.conv_in.bias"


def test_flux_final_layer_alias_in_loader():
    """build_name_map aliases the shared final_layer tails under flux."""
    from mlimgsynth_tpu.weights import register_name, NameRef
    out = {}
    register_name(out, "model.diffusion_model.final_layer.linear.weight",
                  "mmdit.final_layer.linear.weight")
    assert out["mmdit.final_layer.linear.weight"].raw \
        == "model.diffusion_model.final_layer.linear.weight"
    assert out["flux.final_layer.linear.weight"].raw \
        == "model.diffusion_model.final_layer.linear.weight"


def test_lora_dit_names():
    """kohya (sd-scripts) flux/SD3 LoRA names: flattened-underscore module
    paths reconstruct to the internal dotted scheme; peft lora_A/lora_B
    suffixes alias to lora_down/lora_up."""
    nl = normalize_lora_name
    assert nl("lora_unet_double_blocks_0_img_attn_qkv.lora_down.weight") \
        == "flux.double_blocks.0.img_attn.qkv.lora_down.weight"
    assert nl("lora_unet_double_blocks_12_txt_mlp_2.lora_up.weight") \
        == "flux.double_blocks.12.txt_mlp.2.lora_up.weight"
    assert nl("lora_unet_single_blocks_7_linear1.alpha") \
        == "flux.single_blocks.7.linear1.alpha"
    assert nl("lora_unet_single_blocks_7_modulation_lin.lora_down.weight") \
        == "flux.single_blocks.7.modulation.lin.lora_down.weight"
    assert nl("lora_unet_joint_blocks_3_x_block_attn_qkv.lora_down.weight") \
        == "mmdit.joint_blocks.3.x_block.attn.qkv.lora_down.weight"
    assert nl("lora_unet_joint_blocks_3_context_block_mlp_fc2.lora_up"
              ".weight") \
        == "mmdit.joint_blocks.3.context_block.mlp.fc2.lora_up.weight"
    assert nl("lora_unet_joint_blocks_0_x_block_attn2_proj.lora_down"
              ".weight") \
        == "mmdit.joint_blocks.0.x_block.attn2.proj.lora_down.weight"
    assert nl("lora_unet_joint_blocks_0_x_block_adaLN_modulation_1.alpha") \
        == "mmdit.joint_blocks.0.x_block.adaLN_modulation.1.alpha"
    # peft suffix aliases
    assert nl("lora_unet_double_blocks_0_img_attn_qkv.lora_A.weight") \
        == "flux.double_blocks.0.img_attn.qkv.lora_down.weight"
    assert nl("lora_unet_double_blocks_0_img_attn_qkv.lora_B.weight") \
        == "flux.double_blocks.0.img_attn.qkv.lora_up.weight"
    # family/module mismatches rejected
    assert nl("lora_unet_joint_blocks_0_img_attn_qkv.lora_down.weight") \
        is None
    assert nl("lora_unet_double_blocks_0_x_block_attn_qkv.lora_down"
              ".weight") is None
    assert nl("lora_unet_double_blocks_0_linear1.lora_down.weight") is None
    assert nl("lora_unet_single_blocks_0_img_attn_qkv.lora_down.weight") \
        is None


def test_lora_peft_dit_names():
    """diffusers-peft DiT LoRA names: transformer.*-prefixed, lora_A/B,
    family-disambiguated, fused-weight slices encoded as @num/span/den."""
    nl = normalize_lora_name
    assert nl("transformer.transformer_blocks.0.attn.to_q.lora_A.weight",
              "flux") == \
        "flux.double_blocks.0.img_attn.qkv@0/1/3.lora_down.weight"
    assert nl("transformer.transformer_blocks.0.attn.add_v_proj.lora_B"
              ".weight", "flux") == \
        "flux.double_blocks.0.txt_attn.qkv@2/1/3.lora_up.weight"
    assert nl("transformer.transformer_blocks.3.attn.to_out.0.lora_A"
              ".weight", "flux") == \
        "flux.double_blocks.3.img_attn.proj.lora_down.weight"
    assert nl("transformer.transformer_blocks.3.ff_context.net.0.proj"
              ".lora_A.weight", "flux") == \
        "flux.double_blocks.3.txt_mlp.0.lora_down.weight"
    assert nl("transformer.single_transformer_blocks.7.attn.to_k.lora_A"
              ".weight", "flux") == \
        "flux.single_blocks.7.linear1@1/1/7.lora_down.weight"
    assert nl("transformer.single_transformer_blocks.7.proj_mlp.lora_B"
              ".weight", "flux") == \
        "flux.single_blocks.7.linear1@3/4/7.lora_up.weight"
    assert nl("transformer.single_transformer_blocks.7.proj_out.lora_A"
              ".weight", "flux") == \
        "flux.single_blocks.7.linear2.lora_down.weight"
    # same layout, mmdit family
    assert nl("transformer.transformer_blocks.0.attn.to_q.lora_A.weight",
              "mmdit") == \
        "mmdit.joint_blocks.0.x_block.attn.qkv@0/1/3.lora_down.weight"
    assert nl("transformer.transformer_blocks.2.attn.add_k_proj.lora_A"
              ".weight", "mmdit") == \
        "mmdit.joint_blocks.2.context_block.attn.qkv@1/1/3.lora_down.weight"
    assert nl("transformer.transformer_blocks.2.norm1_context.linear"
              ".lora_A.weight", "mmdit") == \
        "mmdit.joint_blocks.2.context_block.adaLN_modulation.1" \
        ".lora_down.weight"
    assert nl("transformer.transformer_blocks.0.attn2.to_v.lora_A.weight",
              "mmdit") == \
        "mmdit.joint_blocks.0.x_block.attn2.qkv@2/1/3.lora_down.weight"
    # family gating
    assert nl("transformer.single_transformer_blocks.0.proj_out.lora_A"
              ".weight", "mmdit") is None
    assert nl("transformer.transformer_blocks.0.attn.to_q.lora_A.weight",
              "sd") is None


def test_lora_peft_sd_names():
    """diffusers-peft SD LoRA state dicts (unet./text_encoder. prefixes,
    plain diffusers module paths, lora_A/B) ride the existing diffusers
    checkpoint mapping."""
    nl = normalize_lora_name
    assert nl("unet.down_blocks.1.attentions.0.transformer_blocks.0"
              ".attn1.to_q.lora_A.weight") == \
        "unet.in.4.1.transf.0.attn1.q_proj.lora_down.weight"
    assert nl("unet.mid_block.attentions.0.transformer_blocks.0"
              ".ff.net.0.proj.lora_B.weight") == \
        "unet.mid.1.transf.0.ff.net.0.proj.lora_up.weight"
    assert nl("text_encoder.text_model.encoder.layers.0.self_attn"
              ".q_proj.lora_A.weight") == \
        "clip.text.encoder.layers.0.attn.q_proj.lora_down.weight"
    assert nl("text_encoder_2.text_model.encoder.layers.2.mlp.fc1"
              ".lora_B.weight") == \
        "clip2.text.encoder.layers.2.mlp.fc1.lora_up.weight"
