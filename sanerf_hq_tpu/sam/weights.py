"""Torch SAM/HQ-SAM checkpoint -> flax parameter conversion.

Conversion rules (validated against torch-cpu in tests/test_sam.py):
  Linear:          W[out,in]        -> kernel[in,out]            (transpose)
  Conv2d:          W[out,in,kh,kw]  -> kernel[kh,kw,in,out]      (2,3,1,0)
  ConvTranspose2d: W[in,out,kh,kw]  -> kernel[kh,kw,in,out] with spatial flip
  Embedding:       W[n,dim]         -> embedding[n,dim]
  LayerNorm:       weight/bias      -> scale/bias (flax nn.LayerNorm)
  LayerNorm2d:     weight/bias      -> weight/bias (our custom module)
"""
from __future__ import annotations

from typing import Dict

import numpy as np


def _lin(sd, name):
    out = {"kernel": sd[f"{name}.weight"].T.copy()}
    if f"{name}.bias" in sd:
        out["bias"] = sd[f"{name}.bias"].copy()
    return out


def _conv(sd, name):
    out = {"kernel": sd[f"{name}.weight"].transpose(2, 3, 1, 0).copy()}
    if f"{name}.bias" in sd:
        out["bias"] = sd[f"{name}.bias"].copy()
    return out


def _convT(sd, name):
    k = sd[f"{name}.weight"].transpose(2, 3, 0, 1)[::-1, ::-1].copy()
    out = {"kernel": k}
    if f"{name}.bias" in sd:
        out["bias"] = sd[f"{name}.bias"].copy()
    return out


def _ln(sd, name):
    return {"scale": sd[f"{name}.weight"].copy(), "bias": sd[f"{name}.bias"].copy()}


def _ln2d(sd, name):
    return {"weight": sd[f"{name}.weight"].copy(), "bias": sd[f"{name}.bias"].copy()}


def _emb(sd, name):
    return {"embedding": sd[f"{name}.weight"].copy()}


def _mlp_head(sd, name, n_layers):
    return {f"layers_{i}": _lin(sd, f"{name}.layers.{i}") for i in range(n_layers)}


def _attn_ds(sd, name):
    return {
        "q_proj": _lin(sd, f"{name}.q_proj"),
        "k_proj": _lin(sd, f"{name}.k_proj"),
        "v_proj": _lin(sd, f"{name}.v_proj"),
        "out_proj": _lin(sd, f"{name}.out_proj"),
    }


def _twoway_transformer(sd, base):
    out = {}
    for i in range(2):
        b = f"{base}.layers.{i}"
        out[f"layers_{i}"] = {
            "self_attn": _attn_ds(sd, f"{b}.self_attn"),
            "norm1": _ln(sd, f"{b}.norm1"),
            "cross_attn_token_to_image": _attn_ds(sd, f"{b}.cross_attn_token_to_image"),
            "norm2": _ln(sd, f"{b}.norm2"),
            "mlp": {"lin1": _lin(sd, f"{b}.mlp.lin1"),
                    "lin2": _lin(sd, f"{b}.mlp.lin2")},
            "norm3": _ln(sd, f"{b}.norm3"),
            "cross_attn_image_to_token": _attn_ds(sd, f"{b}.cross_attn_image_to_token"),
            "norm4": _ln(sd, f"{b}.norm4"),
        }
    out["final_attn_token_to_image"] = _attn_ds(sd, f"{base}.final_attn_token_to_image")
    out["norm_final_attn"] = _ln(sd, f"{base}.norm_final_attn")
    return out


def convert_torch_checkpoint(path: str, encoder, prompt_encoder, decoder,
                             hq: bool = False) -> Dict:
    import torch

    sd_t = torch.load(path, map_location="cpu")
    if "model" in sd_t and isinstance(sd_t["model"], dict):
        sd_t = sd_t["model"]
    sd = {k: v.numpy().astype(np.float32) for k, v in sd_t.items()}
    return convert_state_dict(sd, encoder, hq=hq)


def convert_state_dict(sd: Dict[str, np.ndarray], encoder,
                       hq: bool = False) -> Dict:
    """Pure numpy-state-dict -> flax-params conversion (torch-free entry;
    key coverage vs the released sam_vit_* / sam_hq_vit_* checkpoints is
    asserted against the manifests in tests/fixtures/sam_keys_*.txt)."""
    # ---- encoder --------------------------------------------------------
    enc = {
        "patch_embed_proj": _conv(sd, "image_encoder.patch_embed.proj"),
        "pos_embed": sd["image_encoder.pos_embed"].copy(),
        "neck_conv1": _conv(sd, "image_encoder.neck.0"),
        "neck_ln1": _ln2d(sd, "image_encoder.neck.1"),
        "neck_conv2": _conv(sd, "image_encoder.neck.2"),
        "neck_ln2": _ln2d(sd, "image_encoder.neck.3"),
    }
    for i in range(encoder.depth):
        b = f"image_encoder.blocks.{i}"
        enc[f"blocks_{i}"] = {
            "norm1": _ln(sd, f"{b}.norm1"),
            "attn": {
                "qkv": _lin(sd, f"{b}.attn.qkv"),
                "proj": _lin(sd, f"{b}.attn.proj"),
                "rel_pos_h": sd[f"{b}.attn.rel_pos_h"].copy(),
                "rel_pos_w": sd[f"{b}.attn.rel_pos_w"].copy(),
            },
            "norm2": _ln(sd, f"{b}.norm2"),
            "mlp": {"lin1": _lin(sd, f"{b}.mlp.lin1"),
                    "lin2": _lin(sd, f"{b}.mlp.lin2")},
        }

    # ---- prompt encoder --------------------------------------------------
    pe = {
        "pe_layer": {
            "positional_encoding_gaussian_matrix":
                sd["prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"].copy()
        },
        "not_a_point_embed": _emb(sd, "prompt_encoder.not_a_point_embed"),
        "no_mask_embed": _emb(sd, "prompt_encoder.no_mask_embed"),
        "mask_downscaling_0": _conv(sd, "prompt_encoder.mask_downscaling.0"),
        "mask_downscaling_1": _ln2d(sd, "prompt_encoder.mask_downscaling.1"),
        "mask_downscaling_3": _conv(sd, "prompt_encoder.mask_downscaling.3"),
        "mask_downscaling_4": _ln2d(sd, "prompt_encoder.mask_downscaling.4"),
        "mask_downscaling_6": _conv(sd, "prompt_encoder.mask_downscaling.6"),
    }
    for i in range(4):
        pe[f"point_embeddings_{i}"] = _emb(sd, f"prompt_encoder.point_embeddings.{i}")

    # ---- decoder ----------------------------------------------------------
    n_hyper = 4  # base decoder hypernet count
    base = {
        "transformer": _twoway_transformer(sd, "mask_decoder.transformer"),
        "iou_token": _emb(sd, "mask_decoder.iou_token"),
        "mask_tokens": _emb(sd, "mask_decoder.mask_tokens"),
        "output_upscaling_0": _convT(sd, "mask_decoder.output_upscaling.0"),
        "output_upscaling_1": _ln2d(sd, "mask_decoder.output_upscaling.1"),
        "output_upscaling_3": _convT(sd, "mask_decoder.output_upscaling.3"),
        "iou_prediction_head": _mlp_head(sd, "mask_decoder.iou_prediction_head", 3),
    }
    for i in range(n_hyper):
        base[f"output_hypernetworks_mlps_{i}"] = _mlp_head(
            sd, f"mask_decoder.output_hypernetworks_mlps.{i}", 3
        )

    if hq:
        dec = {
            "base": base,
            "hf_token": _emb(sd, "mask_decoder.hf_token"),
            "hf_mlp": _mlp_head(sd, "mask_decoder.hf_mlp", 3),
            "compress_vit_feat_0": _convT(sd, "mask_decoder.compress_vit_feat.0"),
            "compress_vit_feat_1": _ln2d(sd, "mask_decoder.compress_vit_feat.1"),
            "compress_vit_feat_3": _convT(sd, "mask_decoder.compress_vit_feat.3"),
            "embedding_encoder_0": _convT(sd, "mask_decoder.embedding_encoder.0"),
            "embedding_encoder_1": _ln2d(sd, "mask_decoder.embedding_encoder.1"),
            "embedding_encoder_3": _convT(sd, "mask_decoder.embedding_encoder.3"),
            "embedding_maskfeature_0": _conv(sd, "mask_decoder.embedding_maskfeature.0"),
            "embedding_maskfeature_1": _ln2d(sd, "mask_decoder.embedding_maskfeature.1"),
            "embedding_maskfeature_3": _conv(sd, "mask_decoder.embedding_maskfeature.3"),
        }
    else:
        dec = base

    return {"encoder": enc, "prompt_encoder": pe, "decoder": dec}
