"""Generate the exact state-dict key manifests of the released SAM / HQ-SAM
checkpoints (sam_vit_b_01ec64.pth, sam_vit_l_0b3195.pth,
sam_vit_h_4b8939.pth, sam_hq_vit_{b,l,h}.pth).

Written from the original facebookresearch/segment-anything and SysCV/sam-hq
module structure (ImageEncoderViT / PromptEncoder / MaskDecoder[HQ] /
TwoWayTransformer), which defines the checkpoints' key layout — the
reference loads these exact files (/root/reference/main.py:258-263).
Run `python gen_sam_key_manifests.py` from this directory to regenerate
sam_keys_*.txt; tests/test_sam_keys.py asserts our converter
(sanerf_hq_tpu/sam/weights.py) consumes every key and only those.
"""
import os

# (embed_dim, depth, num_heads) per ViT size; head_dim = embed/heads
VIT = {"vit_b": (768, 12, 12), "vit_l": (1024, 24, 16),
       "vit_h": (1280, 32, 16)}


def _wb(name):
    return [f"{name}.weight", f"{name}.bias"]


def _attn(name):
    out = []
    for p in ("q_proj", "k_proj", "v_proj", "out_proj"):
        out += _wb(f"{name}.{p}")
    return out


def _mlp3(name):
    out = []
    for i in range(3):
        out += _wb(f"{name}.layers.{i}")
    return out


def sam_keys(model_type: str, hq: bool = False):
    _, depth, _ = VIT[model_type]
    k = []
    # ---- image encoder (ImageEncoderViT) --------------------------------
    k += _wb("image_encoder.patch_embed.proj")
    k += ["image_encoder.pos_embed"]
    for i in range(depth):
        b = f"image_encoder.blocks.{i}"
        k += _wb(f"{b}.norm1")
        k += _wb(f"{b}.attn.qkv")
        # use_rel_pos=True for every block in all released configs
        k += [f"{b}.attn.rel_pos_h", f"{b}.attn.rel_pos_w"]
        k += _wb(f"{b}.attn.proj")
        k += _wb(f"{b}.norm2")
        k += _wb(f"{b}.mlp.lin1") + _wb(f"{b}.mlp.lin2")
    # neck convs are bias=False in the original; only LayerNorm2d has bias
    k += ["image_encoder.neck.0.weight"] + _wb("image_encoder.neck.1")
    k += ["image_encoder.neck.2.weight"] + _wb("image_encoder.neck.3")
    # ---- prompt encoder ---------------------------------------------------
    k += ["prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"]
    for i in range(4):
        k += [f"prompt_encoder.point_embeddings.{i}.weight"]
    k += ["prompt_encoder.not_a_point_embed.weight",
          "prompt_encoder.no_mask_embed.weight"]
    k += _wb("prompt_encoder.mask_downscaling.0")
    k += _wb("prompt_encoder.mask_downscaling.1")
    k += _wb("prompt_encoder.mask_downscaling.3")
    k += _wb("prompt_encoder.mask_downscaling.4")
    k += _wb("prompt_encoder.mask_downscaling.6")
    # ---- mask decoder -----------------------------------------------------
    t = "mask_decoder.transformer"
    for i in range(2):
        b = f"{t}.layers.{i}"
        k += _attn(f"{b}.self_attn") + _wb(f"{b}.norm1")
        k += _attn(f"{b}.cross_attn_token_to_image") + _wb(f"{b}.norm2")
        k += _wb(f"{b}.mlp.lin1") + _wb(f"{b}.mlp.lin2") + _wb(f"{b}.norm3")
        k += _attn(f"{b}.cross_attn_image_to_token") + _wb(f"{b}.norm4")
    k += _attn(f"{t}.final_attn_token_to_image") + _wb(f"{t}.norm_final_attn")
    k += ["mask_decoder.iou_token.weight", "mask_decoder.mask_tokens.weight"]
    k += _wb("mask_decoder.output_upscaling.0")
    k += _wb("mask_decoder.output_upscaling.1")
    k += _wb("mask_decoder.output_upscaling.3")
    for i in range(4):
        k += _mlp3(f"mask_decoder.output_hypernetworks_mlps.{i}")
    k += _mlp3("mask_decoder.iou_prediction_head")
    if hq:
        # MaskDecoderHQ additions (SysCV/sam-hq modeling/mask_decoder_hq.py)
        k += ["mask_decoder.hf_token.weight"]
        k += _mlp3("mask_decoder.hf_mlp")
        k += _wb("mask_decoder.compress_vit_feat.0")
        k += _wb("mask_decoder.compress_vit_feat.1")
        k += _wb("mask_decoder.compress_vit_feat.3")
        k += _wb("mask_decoder.embedding_encoder.0")
        k += _wb("mask_decoder.embedding_encoder.1")
        k += _wb("mask_decoder.embedding_encoder.3")
        k += _wb("mask_decoder.embedding_maskfeature.0")
        k += _wb("mask_decoder.embedding_maskfeature.1")
        k += _wb("mask_decoder.embedding_maskfeature.3")
    return k


if __name__ == "__main__":
    here = os.path.dirname(os.path.abspath(__file__))
    for mt in VIT:
        for hq in (False, True):
            name = f"sam_keys_{'hq_' if hq else ''}{mt}.txt"
            with open(os.path.join(here, name), "w") as f:
                f.write("\n".join(sam_keys(mt, hq)) + "\n")
            print("wrote", name)
