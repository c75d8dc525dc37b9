from .attention import match_attention, flash_match_attention
from .bfgs_update import fused_bfgs_update_direction, reference_update_direction

__all__ = [
    "match_attention",
    "flash_match_attention",
    "fused_bfgs_update_direction",
    "reference_update_direction",
]
