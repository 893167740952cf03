"""IO layer: glTF loading, benchmark scene configs, image output."""

from hikari_tpu.io.scenes import CONFIGS, cornell_box_scene

__all__ = ["CONFIGS", "cornell_box_scene"]
