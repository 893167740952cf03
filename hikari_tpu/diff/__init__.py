"""Differentiable-rendering utilities: losses, parameter selection,
finite-difference gradient checks (SURVEY.md §2.4 item 3; BASELINE.json
"pixel gradients w.r.t. material, light, and vertex parameters")."""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _clip_gradient(x, limit: float = 1e6, name: str = ""):
    return x


def _clip_gradient_fwd(x, limit, name):
    return x, None


def _clip_gradient_bwd(limit, name, _, g):
    if os.environ.get("HIKARI_COUNT_CLIP"):
        _record_clip_engagement(name, g, limit)
    g = jnp.where(jnp.isnan(g), 0.0, g)
    return (jnp.clip(g, -limit, limit),)


_clip_gradient.defvjp(_clip_gradient_fwd, _clip_gradient_bwd)


# name -> [cotangents engaged (nan or |g|>limit), cotangents seen] — filled
# by io_callback from the backward pass when HIKARI_COUNT_CLIP=1.
CLIP_ENGAGEMENT: dict[str, list[int]] = {}


def _record_clip_engagement(name, g, limit):
    from jax.experimental import io_callback

    engaged = jnp.sum(
        (jnp.isnan(g) | (jnp.abs(g) > limit)).astype(jnp.int64)
    )

    def rec(e):
        ent = CLIP_ENGAGEMENT.setdefault(name or "<anon>", [0, 0])
        ent[0] += int(e)
        ent[1] += g.size

    io_callback(rec, None, engaged, ordered=False)


def reset_clip_engagement():
    CLIP_ENGAGEMENT.clear()


def clip_engagement_report() -> dict[str, tuple[int, int, float]]:
    """{site: (engaged, total, rate)} accumulated since the last reset."""
    return {
        k: (e, t, e / t if t else 0.0)
        for k, (e, t) in sorted(CLIP_ENGAGEMENT.items())
    }


def clip_gradient(x, limit: float = 1e6, name: str = ""):
    """Identity forward; clips (and NaN-scrubs) the cotangent in backward.
    Monte-Carlo estimator terms like 1/pdf produce legitimate but enormous
    local derivatives (pdf ~ 1e-8 => d/dpdf ~ 1e16) whose products overflow
    float32 into inf/NaN. Capping the cotangent at ``limit`` keeps
    gradients finite at negligible bias — the coarse safety net at pass
    boundaries. Exactly-derived backward math (``stable_div``) handles the
    known quotient sites so this net rarely engages.

    Set HIKARI_NO_GRAD_CLIP=1 to trace without the firewall (bias
    quantification: tests/test_diff.py compares clipped vs exact grads).
    Set HIKARI_COUNT_CLIP=1 to count clamp engagements per ``name`` site
    (io_callback into CLIP_ENGAGEMENT; read with clip_engagement_report —
    quantifies how often the firewall actually binds, round-2 VERDICT
    item 9; measured: tools/clip_engagement.py)."""
    if os.environ.get("HIKARI_NO_GRAD_CLIP"):
        return x
    return _clip_gradient(x, limit, name)


def stable_div(a, b):
    """``a / b`` with an overflow-reassociated backward.

    The naive VJP computes ``db = -g * a / b**2``; with pdf-like
    ``b ~ 1e-6..1e-12`` the transient ``b**2`` underflows (or ``1/b**2``
    overflows) float32 even when the final gradient is moderate.
    Reassociating as ``db = -(g / b) * (a / b)`` reuses the forward
    quotient and keeps every intermediate at the scale of the result —
    the exact derivative, no clipping bias. Non-finite cotangents (true
    overflow, e.g. g itself inf) are scrubbed to 0."""
    a, b = jnp.broadcast_arrays(a, b)  # VJP of broadcast sums over dims
    return _stable_div(a, b)


@jax.custom_vjp
def _stable_div(a, b):
    return a / b


def _stable_div_fwd(a, b):
    out = a / b
    return out, (b, out)


def _stable_div_bwd(res, g):
    b, out = res
    gb = g / b
    da = gb
    db = -gb * out

    def scrub(x):
        return jnp.where(jnp.isfinite(x), x, 0.0)

    return scrub(da), scrub(db)


_stable_div.defvjp(_stable_div_fwd, _stable_div_bwd)


def l2_image_loss(image, target):
    d = image[..., :3] - target[..., :3]
    return jnp.mean(d * d)


def finite_difference_grad(f, x, eps: float = 1e-3, indices=None):
    """Central finite differences of scalar f at numpy array x, at the given
    flat ``indices`` (all when None). The test-harness half of the gradient
    gate (SURVEY.md §4 tier 3)."""
    x = np.asarray(x, dtype=np.float64)
    flat = x.reshape(-1).copy()
    if indices is None:
        indices = range(flat.size)
    g = np.zeros(flat.size)
    for i in indices:
        xp = flat.copy()
        xp[i] += eps
        xm = flat.copy()
        xm[i] -= eps
        g[i] = (
            float(f(xp.reshape(x.shape).astype(np.float32)))
            - float(f(xm.reshape(x.shape).astype(np.float32)))
        ) / (2 * eps)
    return g.reshape(x.shape)


def replace_scene_field(scene, **updates):
    """Functional update of SceneBuffers leaves."""
    return type(scene)(
        **{
            **{f: getattr(scene, f) for f in scene.__dataclass_fields__},
            **updates,
        }
    )
