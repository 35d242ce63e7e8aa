from .config import (
    LlamaConfig,
    ClipVisionConfig,
    QFormerConfig,
    LlavaConfig,
    LlavaNextConfig,
    InstructBlipConfig,
    EnsembleConfig,
    GenerationConfig,
)
from .prng import PrngPolicy
