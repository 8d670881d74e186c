"""RGB -> CIELab conversion.

Behavioral spec: device helper ``rgb2lab`` (``clMVDE/clcode.cl:21-59``) applied
per pixel by kernel ``cvt`` (``clcode.cl:125-151``).  The live path does NOT
apply sRGB gamma linearization (that is the dead ``rgb2lab_alternative``,
``clcode.cl:62-121``, kept here behind ``srgb_linearize=True`` since the
reference preserved it as an experiment).

Input convention: the reference receives OpenCV BGR byte images and treats
``.s0`` as blue (``clcode.cl:25-27`` with ``loadImageIn`` at
``file_handler.cpp:6-15``).  Here we take RGB uint8 (the natural order for
PNG loaders) and do the channel bookkeeping internally, scaling by the exact
float constant ``0.0039216`` the reference uses (not 1/255).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# Exact constants from clcode.cl:25-50.
_SCALE = 0.0039216
_EPSILON = 0.008856
_KAPPA = 903.3
_WHITE = (0.950456, 1.0, 1.088754)
_RGB2XYZ = (
    (0.412453, 0.357580, 0.180423),
    (0.212671, 0.715160, 0.072169),
    (0.019334, 0.119193, 0.950227),
)


def _f_cbrt(t: jax.Array) -> jax.Array:
    """The CIE f() transfer: cube root above epsilon, linear below
    (clcode.cl:44-50)."""
    return jnp.where(
        t > _EPSILON,
        jnp.cbrt(jnp.maximum(t, 0.0)),
        (_KAPPA * t + 16.0) / 116.0,
    )


@partial(jax.jit, static_argnames=("srgb_linearize",))
def rgb_to_lab(rgb: jax.Array, *, srgb_linearize: bool = False) -> jax.Array:
    """Convert RGB (uint8 or float in [0,255]) to CIELab, D65 white.

    ``rgb``: ``(..., 3)`` with channels in R,G,B order.
    Returns float32 ``(..., 3)`` Lab.
    """
    x = rgb.astype(jnp.float32) * _SCALE
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    if srgb_linearize:  # dead-path variant, clcode.cl:72-88
        def lin(c):
            return jnp.where(c > 0.04045, ((c + 0.055) / 1.055) ** 2.4, c / 12.92)
        r, g, b = lin(r), lin(g), lin(b)

    m = _RGB2XYZ
    X = r * m[0][0] + g * m[0][1] + b * m[0][2]
    Y = r * m[1][0] + g * m[1][1] + b * m[1][2]
    Z = r * m[2][0] + g * m[2][1] + b * m[2][2]

    fx = _f_cbrt(X / _WHITE[0])
    fy = _f_cbrt(Y / _WHITE[1])
    fz = _f_cbrt(Z / _WHITE[2])

    L = 116.0 * fy - 16.0
    A = 500.0 * (fx - fy)
    B = 200.0 * (fy - fz)
    return jnp.stack([L, A, B], axis=-1)
