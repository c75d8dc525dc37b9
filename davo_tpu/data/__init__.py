from .synthetic import SceneConfig, generate_scene, generate_batch
from .vo_windows import VOWindowConfig, generate_vo_window_batch
from .rendering import (
    RenderConfig,
    sample_appearance,
    render_frame,
    render_views,
)

__all__ = [
    "SceneConfig",
    "generate_scene",
    "generate_batch",
    "VOWindowConfig",
    "generate_vo_window_batch",
    "RenderConfig",
    "sample_appearance",
    "render_frame",
    "render_views",
]
