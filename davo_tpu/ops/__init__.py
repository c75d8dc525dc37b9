from .attention import match_attention, flash_match_attention

__all__ = ["match_attention", "flash_match_attention"]
