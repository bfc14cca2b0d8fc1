"""SAM model registry + bundle (encoder / prompt encoder / decoder).

Mirrors the `sam_model_registry_baseline` surface consumed at main.py:258-260.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp

from .image_encoder import ImageEncoderViT, vit_b_config, vit_h_config, vit_l_config
from .mask_decoder import MaskDecoder, MaskDecoderHQ
from .prompt_encoder import PromptEncoder


@dataclasses.dataclass
class SamModel:
    encoder: ImageEncoderViT
    prompt_encoder: PromptEncoder
    decoder: Any
    params: Any
    is_hq: bool = False


_CONFIGS = {"vit_h": vit_h_config, "vit_l": vit_l_config, "vit_b": vit_b_config}


def build_sam(model_type: str = "vit_h", checkpoint: Optional[str] = None,
              hq: bool = False, img_size: int = 1024,
              init_params: bool = True, seed: int = 0) -> SamModel:
    cfg = _CONFIGS[model_type]()
    encoder = ImageEncoderViT(img_size=img_size, **cfg)
    prompt_encoder = PromptEncoder(
        image_embedding_size=(img_size // 16, img_size // 16),
        input_image_size=(img_size, img_size),
    )
    if hq:
        decoder = MaskDecoderHQ(vit_dim=cfg["embed_dim"])
    else:
        decoder = MaskDecoder()

    params = None
    if checkpoint is not None:
        from .weights import convert_torch_checkpoint

        params = convert_torch_checkpoint(checkpoint, encoder, prompt_encoder,
                                          decoder, hq=hq)
    elif init_params:
        key = jax.random.PRNGKey(seed)
        k1, k2, k3 = jax.random.split(key, 3)
        grid = img_size // 16
        enc_p = encoder.init(k1, jnp.zeros((1, img_size, img_size, 3)))["params"]
        pe_p = prompt_encoder.init(
            k2, points=jnp.zeros((1, 1, 2)), labels=jnp.ones((1, 1))
        )["params"]
        feats = jnp.zeros((1, grid, grid, 256))
        pe_dense = jnp.zeros((1, grid, grid, 256))
        sparse = jnp.zeros((1, 2, 256))
        if hq:
            interm = jnp.zeros((1, grid, grid, cfg["embed_dim"]))
            dec_p = decoder.init(k3, feats, pe_dense, sparse, pe_dense, True,
                                 interm)["params"]
        else:
            dec_p = decoder.init(k3, feats, pe_dense, sparse, pe_dense,
                                 True)["params"]
        params = {"encoder": enc_p, "prompt_encoder": pe_p, "decoder": dec_p}

    return SamModel(encoder, prompt_encoder, decoder, params, is_hq=hq)


def sam_model_registry(model_type: str = "vit_h", checkpoint=None, **kw):
    return build_sam(model_type, checkpoint, **kw)
