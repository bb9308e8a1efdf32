"""The DSO affine brightness-transfer model (a, b) with exposure folding.

Convention (reference: include/AffLight.h): each frame has (a, b) mapping
the global irradiance to the frame: I_frame = exp(a) * I_global + b.
The frame-to-frame transfer from F to T is
    I_T ~= rel_a * I_F + rel_b,
    rel_a = exp(a_T - a_F) * (t_T / t_F),   rel_b = b_T - rel_a * b_F.
"""

from __future__ import annotations

import jax.numpy as jnp


def from_to(exposure_f, exposure_t, aff_f, aff_t):
    """Relative (a, b) from frame F to frame T (AffLight.h:27-35).

    aff_f, aff_t: (..., 2) arrays [a, b]; exposures: scalars/arrays.
    Zero exposures fall back to 1 (matching the reference)."""
    exposure_f = jnp.asarray(exposure_f, jnp.float32)
    exposure_t = jnp.asarray(exposure_t, jnp.float32)
    bad = (exposure_f == 0) | (exposure_t == 0)
    ef = jnp.where(bad, 1.0, exposure_f)
    et = jnp.where(bad, 1.0, exposure_t)
    a = jnp.exp(aff_t[..., 0] - aff_f[..., 0]) * et / ef
    b = aff_t[..., 1] - a * aff_f[..., 1]
    return jnp.stack([a, b], axis=-1)
