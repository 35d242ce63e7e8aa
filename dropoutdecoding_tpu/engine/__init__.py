from .generate import LlavaEngine, GenerationResult
