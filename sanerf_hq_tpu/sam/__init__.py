from .build import build_sam, sam_model_registry, SamModel
from .predictor import SamPredictor
from .image_encoder import ImageEncoderViT
from .prompt_encoder import PromptEncoder
from .mask_decoder import MaskDecoder, MaskDecoderHQ
