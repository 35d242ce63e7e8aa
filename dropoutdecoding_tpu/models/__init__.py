from . import llama, clip_vit, projector, llava
