from .synthetic import SceneConfig, generate_scene, generate_batch

__all__ = ["SceneConfig", "generate_scene", "generate_batch"]
