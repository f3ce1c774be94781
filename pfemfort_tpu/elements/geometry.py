"""Batched isoparametric geometry (device-side, jnp).

The TPU-native replacement for the reference's per-element
computeBasisFunctions2D/3D (/root/reference/src/elementutilitiesbasisfuncs.F:
165-234, 430-538): Jacobians, determinants and physical gradients for ALL
elements at ALL Gauss points in one shot.  Elements ride the vector lanes;
the tiny (pdim x pdim) inverses are closed-form and unrolled.

Index conventions (matching the Fortran):
  J[e,g,a,d] = sum_i dNdu[g,a,i] * coords[e,i,d]     ("B" in the reference)
  gradN[e,g,d,i] = sum_a inv(J)[e,g,d,a] * dNdu[g,a,i]
  det[e,g] = det(J[e,g])                              ("Jac")
"""

from __future__ import annotations

import jax.numpy as jnp


def jacobians(coords_e: jnp.ndarray, dNdu: jnp.ndarray) -> jnp.ndarray:
    """J (E,G,pdim,ndim) from coords_e (E,npe,ndim) and dNdu (G,pdim,npe)."""
    return jnp.einsum("gai,eid->egad", dNdu, coords_e)


def _det_inv_2x2(J):
    a, b = J[..., 0, 0], J[..., 0, 1]
    c, d = J[..., 1, 0], J[..., 1, 1]
    det = a * d - b * c
    inv = jnp.stack([
        jnp.stack([d, -b], axis=-1),
        jnp.stack([-c, a], axis=-1),
    ], axis=-2) / det[..., None, None]
    return det, inv


def _det_inv_3x3(J):
    a = J[..., 0, 0]; b = J[..., 0, 1]; c = J[..., 0, 2]
    d = J[..., 1, 0]; e = J[..., 1, 1]; f = J[..., 1, 2]
    g = J[..., 2, 0]; h = J[..., 2, 1]; i = J[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    inv = jnp.stack([
        jnp.stack([A, -(b * i - c * h), (b * f - c * e)], axis=-1),
        jnp.stack([B, (a * i - c * g), -(a * f - c * d)], axis=-1),
        jnp.stack([C, -(a * h - b * g), (a * e - b * d)], axis=-1),
    ], axis=-2) / det[..., None, None]
    return det, inv


def grads_and_det(coords_e: jnp.ndarray, dNdu):
    """Physical gradients and Jacobian determinants, all elements/points.

    Args:
      coords_e: (E, npe, ndim) element nodal coordinates.
      dNdu:     (G, pdim, npe) parametric derivatives (static table).
    Returns:
      gradN: (E, G, ndim, npe)  physical derivatives dN/dx_d,
      det:   (E, G)             Jacobian determinant ("Jac").
    """
    dNdu = jnp.asarray(dNdu, dtype=coords_e.dtype)
    J = jacobians(coords_e, dNdu)
    if J.shape[-1] == 2:
        det, inv = _det_inv_2x2(J)
    else:
        det, inv = _det_inv_3x3(J)
    gradN = jnp.einsum("egda,gai->egdi", inv, dNdu)
    return gradN, det
