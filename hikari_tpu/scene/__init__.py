"""Scene layer: host-side compile of meshes/materials/instances into flat
device buffers (reference L2, src/mesh_material/ — see SURVEY.md §1)."""

from hikari_tpu.scene.mesh import (
    Mesh,
    cube_mesh,
    plane_mesh,
    quad_mesh,
    uv_sphere_mesh,
)
from hikari_tpu.scene.compile import (
    DirectionalLight,
    Instance,
    Material,
    Scene,
    SceneArrays,
    compile_scene,
)
from hikari_tpu.scene.buffers import SceneBuffers, build_scene_buffers, to_device
from hikari_tpu.scene.bvh import FlatBvh, build_flat_bvh, validate_flat_bvh
from hikari_tpu.scene.alias import build_alias_table
from hikari_tpu.scene.update import (
    SceneUpdater,
    update_activity,
    update_transforms,
)

__all__ = [
    "Mesh",
    "cube_mesh",
    "plane_mesh",
    "quad_mesh",
    "uv_sphere_mesh",
    "DirectionalLight",
    "Instance",
    "Material",
    "Scene",
    "SceneArrays",
    "compile_scene",
    "SceneBuffers",
    "build_scene_buffers",
    "to_device",
    "FlatBvh",
    "build_flat_bvh",
    "validate_flat_bvh",
    "build_alias_table",
    "SceneUpdater",
    "update_activity",
    "update_transforms",
]
