from .uncertainty import vision_uncertainty, entropy_varentropy, topk_token_ids
from .basic import rms_norm, layer_norm, quick_gelu, rotary_embedding, apply_rope
