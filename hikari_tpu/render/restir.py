"""ReSTIR reservoirs: streaming/weighted reservoir sampling with temporal
and spatial reuse.

jnp equivalent of the reference's reservoir section
(src/shaders/light.wgsl:33-224 pack/unpack + ops, :911-1004 ReSTIR core).
On TPU the 64-byte packed struct (light.wgsl:35-43) becomes an SoA pytree
of f32/i32 image-shaped arrays — no bit packing needed (bandwidth packing
to bf16 is a later optimization), and every "ptr<function>" mutation
becomes a masked functional update over the whole grid.
"""

from __future__ import annotations

from dataclasses import dataclass, replace

import jax
import jax.numpy as jnp

from hikari_tpu.utils import dot3, fract, safe_normalize


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Sample:
    """Reference ``Sample`` (light.wgsl:49-57)."""

    radiance: jax.Array  # (..., 4)
    random: jax.Array  # (..., 4)
    visible_position: jax.Array  # (..., 4) xyz + depth
    visible_normal: jax.Array  # (..., 3)
    visible_instance: jax.Array  # (...,) i32
    sample_position: jax.Array  # (..., 4) xyz + hit flag
    sample_normal: jax.Array  # (..., 3)

    @staticmethod
    def zeros(shape) -> "Sample":
        return Sample(
            radiance=jnp.zeros(shape + (4,)),
            random=jnp.zeros(shape + (4,)),
            visible_position=jnp.zeros(shape + (4,)),
            visible_normal=jnp.zeros(shape + (3,)),
            visible_instance=jnp.full(shape, -1, dtype=jnp.int32),
            sample_position=jnp.zeros(shape + (4,)),
            sample_normal=jnp.zeros(shape + (3,)),
        )

    def select(self, mask, other: "Sample") -> "Sample":
        """where(mask, self, other) fieldwise; mask (...,)."""
        m1 = mask[..., None]
        return Sample(
            radiance=jnp.where(m1, self.radiance, other.radiance),
            random=jnp.where(m1, self.random, other.random),
            visible_position=jnp.where(
                m1, self.visible_position, other.visible_position
            ),
            visible_normal=jnp.where(m1, self.visible_normal, other.visible_normal),
            visible_instance=jnp.where(
                mask, self.visible_instance, other.visible_instance
            ).astype(jnp.int32),
            sample_position=jnp.where(m1, self.sample_position, other.sample_position),
            sample_normal=jnp.where(m1, self.sample_normal, other.sample_normal),
        )


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Reservoir:
    """Reference ``Reservoir`` (light.wgsl:59-66)."""

    s: Sample
    count: jax.Array  # (...,)
    lifetime: jax.Array  # (...,)
    w: jax.Array  # (...,)
    w_sum: jax.Array  # (...,)
    w2_sum: jax.Array  # (...,)

    @staticmethod
    def zeros(shape) -> "Reservoir":
        z = jnp.zeros(shape)
        return Reservoir(
            s=Sample.zeros(shape), count=z, lifetime=z, w=z, w_sum=z, w2_sum=z
        )

    def select(self, mask, other: "Reservoir") -> "Reservoir":
        return Reservoir(
            s=self.s.select(mask, other.s),
            count=jnp.where(mask, self.count, other.count),
            lifetime=jnp.where(mask, self.lifetime, other.lifetime),
            w=jnp.where(mask, self.w, other.w),
            w_sum=jnp.where(mask, self.w_sum, other.w_sum),
            w2_sum=jnp.where(mask, self.w2_sum, other.w2_sum),
        )


def set_reservoir(s: Sample, w_new) -> Reservoir:
    """Reference ``set_reservoir`` (light.wgsl:138-144)."""
    shape = w_new.shape
    return Reservoir(
        s=s,
        count=jnp.ones(shape),
        lifetime=jnp.zeros(shape),
        w=jnp.zeros(shape),
        w_sum=w_new,
        w2_sum=w_new * w_new,
    )


def update_reservoir(r: Reservoir, s: Sample, w_new, mask=None) -> Reservoir:
    """Weighted random replacement (reference ``update_reservoir``,
    light.wgsl:146-173). ``mask`` gates the whole update (pixels where the
    GPU thread wouldn't have called the function)."""
    w_sum = r.w_sum + w_new
    w2_sum = r.w2_sum + w_new * w_new
    count = r.count + 1.0
    rand = fract(jnp.sum(s.random, axis=-1))
    replace_mask = rand < w_new / jnp.where(w_sum == 0.0, 1.0, w_sum)
    new_s = s.select(replace_mask, r.s)
    out = Reservoir(
        s=new_s,
        count=count,
        lifetime=r.lifetime,
        w=r.w,
        w_sum=w_sum,
        w2_sum=w2_sum,
    )
    if mask is not None:
        out = out.select(mask, r)
    return out


def merge_reservoir(r: Reservoir, other: Reservoir, p, mask=None) -> Reservoir:
    """Reference ``merge_reservoir`` (light.wgsl:175-179): update with the
    other's sample weighted p * other.w * other.count, then add counts."""
    merged = update_reservoir(r, other.s, p * other.w * other.count)
    merged = Reservoir(
        s=merged.s,
        count=r.count + other.count,
        lifetime=merged.lifetime,
        w=merged.w,
        w_sum=merged.w_sum,
        w2_sum=merged.w2_sum,
    )
    if mask is not None:
        merged = merged.select(mask, r)
    return merged


def clamp_reservoir(r: Reservoir, max_count) -> Reservoir:
    """Count clamp rescaling w_sum/w2_sum (reference temporal_restir clamp
    light.wgsl:945-951 and spatial clamp :1645-1651)."""
    m = jnp.asarray(max_count, dtype=jnp.float32)
    over = r.count > m
    scale = jnp.where(over, m / jnp.maximum(r.count, 1e-8), 1.0)
    return Reservoir(
        s=r.s,
        count=jnp.where(over, m, r.count),
        lifetime=r.lifetime,
        w=r.w,
        w_sum=r.w_sum * scale,
        w2_sum=r.w2_sum * scale,
    )


def temporal_restir(r: Reservoir, s: Sample, w_new, max_count, mask=None) -> Reservoir:
    """Reference ``temporal_restir`` (light.wgsl:937-952)."""
    out = update_reservoir(r, s, w_new)
    out = clamp_reservoir(out, max_count)
    if mask is not None:
        out = out.select(mask, r)
    return out


def check_previous_reservoir(r: Reservoir, s: Sample) -> tuple[Reservoir, jax.Array]:
    """Geometric validation of a reprojected reservoir (reference
    ``check_previous_reservoir``, light.wgsl:917-935): depth-ratio,
    normal-dot and instance tests; on miss the reservoir resets to zero.
    Returns (validated reservoir, ok mask)."""
    depth_prev = r.s.visible_position[..., 3]
    depth_cur = s.visible_position[..., 3]
    ratio = depth_prev / jnp.where(depth_cur == 0.0, 1e-8, depth_cur)
    ratio = jnp.where(ratio < 1.0, 1.0 / jnp.where(ratio == 0.0, 1e-8, ratio), ratio)
    depth_miss = ratio > 1.05 * (1.0 + 0.5 * s.random[..., 0])
    instance_miss = r.s.visible_instance != s.visible_instance
    normal_miss = dot3(s.visible_normal, r.s.visible_normal) < 0.9
    ok = ~(depth_miss | normal_miss | instance_miss)
    empty = Reservoir.zeros(ok.shape)
    return r.select(ok, empty), ok


def reservoir_variance(r: Reservoir, max_variance: float) -> jax.Array:
    """Per-pixel variance estimate written alongside the radiance
    (reference light.wgsl:1224-1227)."""
    count = jnp.maximum(r.count, 1e-8)
    var = r.w2_sum / count - jnp.square(r.w_sum / count)
    var = jnp.where(r.count < 1.0, var, var / count)
    return jnp.minimum(var, max_variance)


def compress_reservoir(r: Reservoir) -> Reservoir:
    """Bandwidth packing of the cross-frame reservoir state, mirroring the
    reference's 64-byte ``PackedReservoir`` (light.wgsl:35-43): radiance/
    random/count/w/w_sum/w2_sum stored f16 (reference: 2x16float /
    2x16unorm), normals f16 (reference: 8snorm — coarser), lifetime f16,
    positions kept FULL f32 (reference: RGBA32F — geometric validation
    needs them), instance i32. Storage-only: every pass upcasts to f32 on
    read (decompress_reservoir), so compute precision is unchanged. f16
    (not bf16): reservoir counts accumulate by +1 up to 800 and need the
    10-bit mantissa (exact integers to 2048)."""
    f16 = jnp.float16

    def cvt(x, dtype):
        return x.astype(dtype)

    return Reservoir(
        s=Sample(
            radiance=cvt(r.s.radiance, f16),
            random=cvt(r.s.random, f16),
            visible_position=r.s.visible_position.astype(jnp.float32),
            visible_normal=cvt(r.s.visible_normal, f16),
            visible_instance=r.s.visible_instance.astype(jnp.int32),
            sample_position=r.s.sample_position.astype(jnp.float32),
            sample_normal=cvt(r.s.sample_normal, f16),
        ),
        count=cvt(r.count, f16),
        lifetime=cvt(r.lifetime, f16),
        w=cvt(r.w, f16),
        w_sum=cvt(r.w_sum, f16),
        w2_sum=cvt(r.w2_sum, f16),
    )


def decompress_reservoir(r: Reservoir) -> Reservoir:
    """Upcast a packed reservoir back to f32 compute precision."""
    f32 = jnp.float32
    return Reservoir(
        s=Sample(
            radiance=r.s.radiance.astype(f32),
            random=r.s.random.astype(f32),
            visible_position=r.s.visible_position,
            visible_normal=r.s.visible_normal.astype(f32),
            visible_instance=r.s.visible_instance,
            sample_position=r.s.sample_position,
            sample_normal=r.s.sample_normal.astype(f32),
        ),
        count=r.count.astype(f32),
        lifetime=r.lifetime.astype(f32),
        w=r.w.astype(f32),
        w_sum=r.w_sum.astype(f32),
        w2_sum=r.w2_sum.astype(f32),
    )


def finalize_w(r: Reservoir, target_luminance) -> Reservoir:
    """Unbiased contribution weight W = w_sum / (count * p_target)
    (reference light.wgsl:1216-1217). The quotient's backward is computed
    with diff.stable_div — exact derivative, reassociated so the
    1/luminance^2 transient can't overflow float32 near zero."""
    from hikari_tpu.diff import stable_div

    total = r.count * target_luminance
    w = jnp.where(
        total > 0.0, stable_div(r.w_sum, jnp.where(total == 0.0, 1.0, total)), 0.0
    )
    return replace(r, w=w)


def compute_jacobian(q: Sample, r: Sample) -> jax.Array:
    """GRIS reconnection Jacobian, clamped to [1, 50] (reference
    ``compute_jacobian``, light.wgsl:985-1004). q = neighbor sample being
    reused at the receiver r."""
    normal = q.sample_normal
    d_r = r.visible_position[..., :3] - q.sample_position[..., :3]
    d_q = q.visible_position[..., :3] - q.sample_position[..., :3]
    cos_phi_1 = jnp.abs(dot3(safe_normalize(d_r), normal))
    cos_phi_2 = jnp.abs(dot3(safe_normalize(d_q), normal))
    term_1 = cos_phi_1 / jnp.maximum(cos_phi_2, 0.0001)
    num = jnp.sum(d_q * d_q, axis=-1)
    denom = jnp.sum(d_r * d_r, axis=-1)
    term_2 = num / jnp.maximum(denom, 0.0001)
    return jnp.clip(term_1 * term_2, 1.0, 50.0)


def compute_inv_jacobian(current: Sample, neighbor: Sample) -> jax.Array:
    """Inverse-form Jacobian with visibility-cone rejections, in [0.06, 1]
    or 0 (reference ``compute_inv_jacobian``, light.wgsl:954-983)."""
    offset_b = neighbor.sample_position[..., :3] - neighbor.visible_position[..., :3]
    offset_a = neighbor.sample_position[..., :3] - current.visible_position[..., :3]
    front = dot3(current.visible_normal, offset_a) > 0.0
    rb2 = jnp.sum(offset_b * offset_b, axis=-1)
    ra2 = jnp.sum(offset_a * offset_a, axis=-1)
    ob = safe_normalize(offset_b)
    oa = safe_normalize(offset_a)
    cos_a = dot3(current.visible_normal, oa)
    cos_b = dot3(neighbor.visible_normal, ob)
    cos_phi_a = -dot3(oa, neighbor.sample_normal)
    cos_phi_b = -dot3(ob, neighbor.sample_normal)
    valid = (
        front
        & (cos_b > 0.0)
        & (cos_phi_b > 0.0)
        & (cos_a > 0.0)
        & (cos_phi_a > 0.0)
        & (ra2 > 0.0)
        & (rb2 > 0.0)
    )
    denominator = rb2 * cos_phi_a
    numerator = ra2 * cos_phi_b
    jac = jnp.clip(numerator / jnp.where(denominator <= 0.0, 1.0, denominator), 0.06, 1.0)
    return jnp.where(valid & (denominator > 0.0), jac, 0.0)
