from .config import pallas_attention_enabled, use_pallas_attention
from .attention import fused_attention

__all__ = ["fused_attention", "pallas_attention_enabled", "use_pallas_attention"]
