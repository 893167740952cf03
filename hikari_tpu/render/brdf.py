"""Physically-based BRDF: Burley diffuse + GGX specular + EnvBRDF ambient.

jnp reimplementation of the Filament-derived lighting functions the
reference imports from ``bevy_pbr::lighting`` (light.wgsl:4) and its own
shading layer (light.wgsl:711-908): ``lit``, ``ambient``, ``shading``,
``env_brdf``, ``input_radiance`` and surface retrieval. This is the fully
differentiable core of the renderer — pure elementwise math over the pixel
grid, ideal VPU work.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from hikari_tpu.utils import PI, dot3, gather_channels, mxu_table_gather, safe_normalize, saturate, reflect


# ---------------------------------------------------------------------------
# bevy_pbr::lighting equivalents (Filament-style single-scatter model)
# ---------------------------------------------------------------------------


def perceptual_roughness_to_roughness(perceptual_roughness):
    """Clamp + square (bevy_pbr; used at light.wgsl:738)."""
    clamped = jnp.clip(perceptual_roughness, 0.089, 1.0)
    return clamped * clamped


def d_ggx(roughness, noh):
    one_minus = 1.0 - noh * noh
    a = noh * roughness
    k = roughness / (one_minus + a * a)
    return k * k * (1.0 / PI)


def v_smith_ggx_correlated(roughness, nov, nol):
    a2 = roughness * roughness
    lambda_v = nol * jnp.sqrt((nov - a2 * nov) * nov + a2)
    lambda_l = nov * jnp.sqrt((nol - a2 * nol) * nol + a2)
    return 0.5 / jnp.maximum(lambda_v + lambda_l, 1e-7)


def f_schlick_vec(f0, f90, voh):
    return f0 + (f90[..., None] - f0) * jnp.power(1.0 - voh, 5.0)[..., None]


def f_schlick(f0, f90, voh):
    return f0 + (f90 - f0) * jnp.power(1.0 - voh, 5.0)


def fresnel(f0, loh):
    f90 = saturate(jnp.sum(f0 * (50.0 * 0.33), axis=-1))
    return f_schlick_vec(f0, f90, loh)


def specular(f0, roughness, nov, nol, noh, loh, specular_intensity=1.0):
    """GGX specular lobe (bevy_pbr ``specular``)."""
    d = d_ggx(roughness, noh)
    v = v_smith_ggx_correlated(roughness, nov, nol)
    f = fresnel(f0, loh)
    return (specular_intensity * d * v)[..., None] * f


def fd_burley(roughness, nov, nol, loh):
    """Burley (Disney) diffuse (bevy_pbr ``Fd_Burley``)."""
    f90 = 0.5 + 2.0 * roughness * loh * loh
    light_scatter = f_schlick(1.0, f90, nol)
    view_scatter = f_schlick(1.0, f90, nov)
    return light_scatter * view_scatter * (1.0 / PI)


def env_brdf_approx(f0, perceptual_roughness, nov):
    """Karis mobile EnvBRDF approximation (bevy_pbr ``EnvBRDFApprox``)."""
    c0 = jnp.array([-1.0, -0.0275, -0.572, 0.022])
    c1 = jnp.array([1.0, 0.0425, 1.04, -0.04])
    pr = perceptual_roughness[..., None]
    r = pr * c0 + c1
    a004 = (
        jnp.minimum(r[..., 0] * r[..., 0], jnp.exp2(-9.28 * nov)) * r[..., 0]
        + r[..., 1]
    )
    ab_x = -1.04 * a004 + r[..., 2]
    ab_y = 1.04 * a004 + r[..., 3]
    return f0 * ab_x[..., None] + ab_y[..., None]


# ---------------------------------------------------------------------------
# Surface + shading (reference light.wgsl:711-908)
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Surface:
    """Reference ``Surface`` (light.wgsl:281-288): all (...,) or (...,C)."""

    base_color: jax.Array  # (..., 4)
    emissive: jax.Array  # (..., 4)
    reflectance: jax.Array  # (...,)
    metallic: jax.Array  # (...,)
    roughness: jax.Array  # (...,) — already converted from perceptual
    occlusion: jax.Array  # (...,)

    def replace_roughness(self, value) -> "Surface":
        return Surface(
            base_color=self.base_color,
            emissive=self.emissive,
            reflectance=self.reflectance,
            metallic=self.metallic,
            roughness=jnp.broadcast_to(value, self.roughness.shape),
            occlusion=self.occlusion,
        )


def retrieve_surface(scene, material_index, uv=None) -> Surface:
    """Reference ``retreive_surface`` (light.wgsl:730-794). When the scene
    carries no textures this is the NO_TEXTURE specialization (a *static*
    branch — one XLA executable per variant, like the reference's
    pipeline key); otherwise each texture slot is sampled from the uniform
    stack and multiplied into the factors. ``material_index`` may be -1
    (miss) — clamped gather, callers mask.

    Normal maps: the reference uploads ``normal_map_texture`` in
    GpuStandardMaterial (mod.rs:216) but never samples it — the
    ``normal_texture`` loads in light.wgsl (:1035/:1071/:1289) are the
    G-buffer normal MRT, and ``retreive_surface`` touches only
    base/emissive/metallic-roughness/occlusion. Parity therefore means
    keeping the slot (scene.mat_normal_map_texture) unsampled."""
    safe = jnp.maximum(material_index, 0)
    # All five factor tables share the index: pack to one rows-of-11
    # gather (gathers cost per output row, nearly width-independent —
    # tools/bench_gather.py).
    packed = jnp.concatenate(
        [
            scene.mat_base_color,
            scene.mat_emissive,
            scene.mat_metallic[:, None],
            scene.mat_reflectance[:, None],
            scene.mat_perceptual_roughness[:, None],
        ],
        axis=-1,
    )
    rows = mxu_table_gather(packed, safe)  # (..., 11); mat grads ride the MXU VJP
    base_color = rows[..., 0:4]
    emissive = rows[..., 4:8]
    metallic = rows[..., 8]
    reflectance = rows[..., 9]
    perceptual_roughness = rows[..., 10]
    occlusion = jnp.ones_like(metallic)

    if getattr(scene, "num_textures", 0) > 0 and uv is not None:
        from hikari_tpu.render.texture import sample_texture_atlas, srgb_to_linear

        def tex_sample(ids):
            return sample_texture_atlas(scene.tex_atlas, scene.tex_meta, ids, uv)

        bc = tex_sample(scene.mat_base_color_texture[safe])
        base_color = base_color * jnp.concatenate(
            [srgb_to_linear(bc[..., :3]), bc[..., 3:4]], axis=-1
        )
        em = tex_sample(scene.mat_emissive_texture[safe])
        emissive = emissive * jnp.concatenate(
            [srgb_to_linear(em[..., :3]), em[..., 3:4]], axis=-1
        )
        mr = tex_sample(scene.mat_metallic_roughness_texture[safe])
        # Reference multiplies metallic by the red channel (light.wgsl:768).
        metallic = metallic * mr[..., 0]
        occ = tex_sample(scene.mat_occlusion_texture[safe])
        occlusion = occ[..., 0]

    return Surface(
        base_color=base_color,
        emissive=emissive,
        reflectance=reflectance,
        metallic=metallic,
        roughness=perceptual_roughness_to_roughness(perceptual_roughness),
        occlusion=occlusion,
    )


def retrieve_emissive(scene, material_index, uv=None):
    """Reference ``retreive_emissive`` (light.wgsl:744-747, :783-793)."""
    safe = jnp.maximum(material_index, 0)
    emissive = mxu_table_gather(scene.mat_emissive, safe)
    if getattr(scene, "num_textures", 0) > 0 and uv is not None:
        from hikari_tpu.render.texture import sample_texture_atlas, srgb_to_linear

        em = sample_texture_atlas(
            scene.tex_atlas, scene.tex_meta,
            scene.mat_emissive_texture[safe], uv,
        )
        emissive = emissive * jnp.concatenate(
            [srgb_to_linear(em[..., :3]), em[..., 3:4]], axis=-1
        )
    return emissive


def compute_emissive_radiance(emissive):
    """Radiance scale 255 * a * rgb (reference light.wgsl:594-596)."""
    return 255.0 * emissive[..., 3:4] * emissive[..., :3]


def lit(radiance, diffuse_color, roughness, f0, l, n, v):
    """Direct lighting: Burley diffuse + GGX specular, times NoL
    (reference ``lit``, light.wgsl:796-818)."""
    h = safe_normalize(l + v)
    nol = saturate(dot3(n, l))
    noh = saturate(dot3(n, h))
    loh = saturate(dot3(l, h))
    nov = jnp.maximum(dot3(n, v), 0.0001)

    diffuse = diffuse_color * fd_burley(roughness, nov, nol, loh)[..., None]
    spec = specular(f0, roughness, nov, nol, noh, loh, 1.0)
    return (spec + diffuse) * radiance * nol[..., None]


def ambient(diffuse_color, roughness, occlusion, f0, n, v, ambient_color):
    """Ambient env-BRDF approx (reference ``ambient``, light.wgsl:820-833)."""
    nov = jnp.maximum(dot3(n, v), 0.0001)
    diffuse_ambient = env_brdf_approx(diffuse_color, jnp.ones_like(roughness), nov)
    specular_ambient = env_brdf_approx(f0, roughness, nov)
    return occlusion[..., None] * (diffuse_ambient + specular_ambient) * ambient_color


def shading(v, n, l, surface: Surface, input_radiance, ambient_color):
    """Mix lit vs ambient by input alpha (reference ``shading``,
    light.wgsl:869-888)."""
    base_color = surface.base_color[..., :3]
    f0 = (
        0.16 * (surface.reflectance * surface.reflectance * (1.0 - surface.metallic))[
            ..., None
        ]
        + base_color * surface.metallic[..., None]
    )
    diffuse_color = base_color * (1.0 - surface.metallic[..., None])

    lit_radiance = lit(
        input_radiance[..., :3], diffuse_color, surface.roughness, f0, l, n, v
    )
    ambient_radiance = ambient(
        diffuse_color,
        surface.roughness,
        surface.occlusion,
        f0,
        n,
        v,
        ambient_color,
    )
    a = input_radiance[..., 3:4]
    return lit_radiance * a + ambient_radiance * (1.0 - a)


def env_brdf(v, n, surface: Surface):
    """Albedo for demodulation + overlay fallback (reference ``env_brdf``,
    light.wgsl:890-908)."""
    base_color = surface.base_color[..., :3]
    nov = jnp.maximum(dot3(n, v), 0.0001)
    f0 = (
        0.16 * (surface.reflectance * surface.reflectance * (1.0 - surface.metallic))[
            ..., None
        ]
        + base_color * surface.metallic[..., None]
    )
    diffuse_color = base_color * (1.0 - surface.metallic[..., None])
    diffuse_ambient = env_brdf_approx(
        diffuse_color, jnp.ones_like(surface.roughness), nov
    )
    specular_ambient = env_brdf_approx(f0, surface.roughness, nov)
    return surface.occlusion[..., None] * (diffuse_ambient + specular_ambient)


def calculate_view(camera_position, world_position):
    """Perspective view vector (reference ``calculate_view``,
    light.wgsl:714-727; orthographic branch omitted — hikari cameras are
    perspective)."""
    return safe_normalize(camera_position - world_position)
