"""Batched linear-elasticity element kernels (device-side, jnp).

TPU-native redesign of the reference's elasticity element subroutines
(/root/reference/src/elementutilitieselasticity2D.F,
 /root/reference/src/elementutilitieselasticity3D.F): fused tensor
contractions over all elements.

Reference conventions honored (quirks and all, documented here):
  * Implicit 2D tria uses the PLANE-STRESS D with D33 = E(1-nu)/(1-nu^2)
    (elasticity2D.F:61-66); explicit 2D kernels use PLANE STRAIN
    (elasticity2D.F:202-206).  Note the reference's D33 has no 1/2 factor
    while its B-matrix rows carry engineering shear — we reproduce that
    exactly in `dmat_plane_stress`.
  * Explicit residual kernels compute stress from TENSORIAL shear strain
    (0.5*(du_c/dx_d + du_d/dx_c); elasticity2D.F:254-257,
    elasticity3D.F:127-133) — reproduced in `elasticity_residual`.
  * Body force enters the implicit RHS as dvol*N*bforce (no density;
    elasticity2D.F:146-149) but the explicit residual as dens*dvol*N*bforce
    (elasticity2D.F:268-271) — callers pick via the `dens` argument.
  * Lumped mass is the row-sum of the consistent mass
    (elasticity2D.F:353-360).  The reference's tetra stiffness/mass declare
    nGP=8 but define only point 1 (elasticity3D.F:272,305,416,429 — reads of
    uninitialized rule data); we use the intended correct 1-pt rule.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from pfemfort_tpu.elements.basis import tabulate_basis
from pfemfort_tpu.elements.geometry import grads_and_det

# ---------------------------------------------------------------------------
# Constitutive matrices
# ---------------------------------------------------------------------------


def dmat_plane_stress(E: float, nu: float) -> np.ndarray:
    """Plane-stress D exactly as the reference implicit tria kernel builds it
    (elasticity2D.F:61-66), including D33 = b1*(1-nu) (no 1/2)."""
    b1 = E / (1.0 - nu * nu)
    return np.array([
        [b1, b1 * nu, 0.0],
        [b1 * nu, b1, 0.0],
        [0.0, 0.0, b1 * (1.0 - nu)],
    ])


def dmat_plane_strain(E: float, nu: float) -> np.ndarray:
    """Plane-strain D (elasticity2D.F:203-206)."""
    b1 = E / ((1.0 + nu) * (1.0 - 2.0 * nu))
    return np.array([
        [b1 * (1 - nu), b1 * nu, 0.0],
        [b1 * nu, b1 * (1 - nu), 0.0],
        [0.0, 0.0, b1 * (1 - 2 * nu) * 0.5],
    ])


def dmat_3d(E: float, nu: float) -> np.ndarray:
    """Isotropic 3D D, Voigt order (xx, yy, zz, xy, yz, zx)
    (elasticity3D.F:62-71)."""
    b1 = E / ((1.0 + nu) * (1.0 - 2.0 * nu))
    mu = b1 * (1.0 - 2.0 * nu) / 2.0
    D = np.zeros((6, 6))
    D[:3, :3] = b1 * nu
    np.fill_diagonal(D[:3, :3], b1 * (1.0 - nu))
    D[3, 3] = D[4, 4] = D[5, 5] = mu
    return D


def _bsel(ndim: int) -> np.ndarray:
    """T[s,c,d]: engineering B-matrix selector, B[s,(j,c)] = T[s,c,d] dN_j/dx_d.

    Voigt rows: 2D (xx, yy, xy); 3D (xx, yy, zz, xy, yz, zx) — matching the
    reference B layout (elasticity2D.F:126-133, elasticity3D.F:359-371).
    """
    if ndim == 2:
        T = np.zeros((3, 2, 2))
        T[0, 0, 0] = 1.0
        T[1, 1, 1] = 1.0
        T[2, 0, 1] = 1.0
        T[2, 1, 0] = 1.0
        return T
    T = np.zeros((6, 3, 3))
    T[0, 0, 0] = 1.0
    T[1, 1, 1] = 1.0
    T[2, 2, 2] = 1.0
    T[3, 0, 1] = 1.0
    T[3, 1, 0] = 1.0
    T[4, 1, 2] = 1.0
    T[4, 2, 1] = 1.0
    T[5, 0, 2] = 1.0
    T[5, 2, 0] = 1.0
    return T


def _ssel(ndim: int) -> np.ndarray:
    """S[s,c,d]: strain selector with TENSORIAL shear (0.5 factors), the form
    the reference's residual kernels use for stress evaluation."""
    S = _bsel(ndim).copy()
    nd = 2 if ndim == 2 else 3
    S[nd:] *= 0.5
    return S


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------


def elasticity_stiffness(
    coords_e: jnp.ndarray,
    etype: str,
    D: np.ndarray,
    thickness: float = 1.0,
    bforce: Optional[Sequence[float]] = None,
    ngp: Optional[int] = None,
):
    """K = sum_g dvol B^T D B and body-force vector F = sum_g dvol N b.

    DOF layout per element: node-major, component-fast — (i, c) -> i*ndof + c,
    matching the reference's TI=(ii-1)*ndof+c (elasticity2D.F:127-133).
    Returns K (E, ns, ns), F (E, ns) with ns = npe*ndim.
    """
    dtype = coords_e.dtype
    _, wts, N, dNdu = tabulate_basis(etype, ngp)
    ndim = dNdu.shape[1]
    npe = dNdu.shape[2]
    T = jnp.asarray(_bsel(ndim), dtype=dtype)
    Dj = jnp.asarray(np.asarray(D, dtype=np.float64), dtype=dtype)
    wts = jnp.asarray(wts, dtype=dtype)
    Nj = jnp.asarray(N, dtype=dtype)

    gradN, det = grads_and_det(coords_e, dNdu)
    dvol = wts[None, :] * det * thickness  # (E, G)

    B = jnp.einsum("scd,egdj->egsjc", T, gradN)  # (E,G,S,npe,ndim)
    DB = jnp.einsum("st,egtjc->egsjc", Dj, B)
    K = jnp.einsum("eg,egsia,egsjc->eiajc", dvol, B, DB)
    ns = npe * ndim
    K = K.reshape(K.shape[0], ns, ns)

    if bforce is None:
        F = jnp.zeros((K.shape[0], ns), dtype=dtype)
    else:
        b = jnp.asarray(np.asarray(bforce, dtype=np.float64), dtype=dtype)
        F = jnp.einsum("eg,gi,c->eic", dvol, Nj, b).reshape(K.shape[0], ns)
    return K, F


def elasticity_residual(
    coords_e: jnp.ndarray,
    disp_e: jnp.ndarray,
    etype: str,
    D: np.ndarray,
    dens: float,
    bforce: jnp.ndarray,
    thickness: float = 1.0,
    ngp: Optional[int] = None,
) -> jnp.ndarray:
    """Explicit-dynamics residual F = dens*dvol*N*b - B^T sigma for all elems.

    disp_e: (E, npe, ndim) element nodal displacements.
    bforce: (ndim,) traced array (time-dependent pulse in the drivers).
    Stress uses tensorial shear strain, exactly like the reference residual
    kernels (elasticity2D.F:254-271, elasticity3D.F:127-150).
    Returns F (E, ns).
    """
    dtype = coords_e.dtype
    _, wts, N, dNdu = tabulate_basis(etype, ngp)
    ndim = dNdu.shape[1]
    npe = dNdu.shape[2]
    T = jnp.asarray(_bsel(ndim), dtype=dtype)
    S = jnp.asarray(_ssel(ndim), dtype=dtype)
    Dj = jnp.asarray(np.asarray(D, dtype=np.float64), dtype=dtype)
    wts = jnp.asarray(wts, dtype=dtype)
    Nj = jnp.asarray(N, dtype=dtype)

    gradN, det = grads_and_det(coords_e, dNdu)
    dvol = wts[None, :] * det * thickness  # (E, G)

    # grad_disp[e,g,c,d] = sum_i disp[e,i,c] dN_i/dx_d
    gd = jnp.einsum("eic,egdi->egcd", disp_e, gradN)
    strain = jnp.einsum("scd,egcd->egs", S, gd)
    stress = jnp.einsum("st,egt->egs", Dj, strain)

    Fint = jnp.einsum("eg,scd,egdi,egs->eic", dvol, T, gradN, stress)
    b = jnp.asarray(bforce, dtype=dtype)
    Fbody = dens * jnp.einsum("eg,gi,c->eic", dvol, Nj, b)
    return (Fbody - Fint).reshape(coords_e.shape[0], npe * ndim)


def lumped_mass(
    coords_e: jnp.ndarray,
    etype: str,
    dens: float,
    ndof: int,
    ngp: Optional[int] = None,
) -> jnp.ndarray:
    """Row-sum lumped mass vector per element, (E, npe*ndof).

    M[(i,c)] = sum_g dens * w_g |J|_g * N_i * (sum_j N_j), replicated over
    dofs — the row-sum of the reference's block-diagonal consistent mass
    (elasticity2D.F:334-360).
    """
    dtype = coords_e.dtype
    _, wts, N, dNdu = tabulate_basis(etype, ngp)
    wts = jnp.asarray(wts, dtype=dtype)
    Nj = jnp.asarray(N, dtype=dtype)
    _, det = grads_and_det(coords_e, dNdu)
    dvol = wts[None, :] * det * dens  # (E, G)
    rowsum = Nj.sum(axis=1)  # (G,) == 1 for partition-of-unity bases
    Mnode = jnp.einsum("eg,gi,g->ei", dvol, Nj, rowsum)  # (E, npe)
    return jnp.repeat(Mnode, ndof, axis=1)


def quad_hg_residual(
    coords_e: jnp.ndarray,
    disp_e: jnp.ndarray,
    velo_e: jnp.ndarray,
    E: float,
    nu: float,
    dens: float,
    bforce: jnp.ndarray,
    thickness: float = 0.025,
    hg_visc: float = 1.0,
    wave_speed: float = 50.0,
) -> jnp.ndarray:
    """1-point quad residual with viscous hourglass control.

    Re-implements ResidualElasticityLinearQuadHG
    (/root/reference/src/elementutilitieselasticity2D.F:700-889): closed-form
    midpoint B-matrix, PLANE-STRESS stress from tensorial shear strain, and
    the viscous hourglass force H = -0.25*hg_visc*dens*c*sqrt(A) * (Gamma.v)
    with Gamma = [+1,-1,+1,-1] and the hard-coded wave-speed override
    m_WAVES = 50.0 (elasticity2D.F:869) and thick = 0.025 (:734).

    coords_e/disp_e/velo_e: (E_, 4, 2).  Returns (E_, 8).
    """
    dtype = coords_e.dtype
    x = coords_e[:, :, 0]
    y = coords_e[:, :, 1]
    area = 0.5 * ((x[:, 2] - x[:, 0]) * (y[:, 3] - y[:, 1])
                  + (x[:, 1] - x[:, 3]) * (y[:, 2] - y[:, 0]))
    fact = 2.0 * area
    dNdx = jnp.stack([
        (y[:, 1] - y[:, 3]) / fact,
        (y[:, 2] - y[:, 0]) / fact,
        -(y[:, 1] - y[:, 3]) / fact,
        -(y[:, 2] - y[:, 0]) / fact,
    ], axis=1)
    dNdy = jnp.stack([
        (x[:, 3] - x[:, 1]) / fact,
        (x[:, 0] - x[:, 2]) / fact,
        -(x[:, 3] - x[:, 1]) / fact,
        -(x[:, 0] - x[:, 2]) / fact,
    ], axis=1)
    Dj = jnp.asarray(dmat_plane_stress(E, nu), dtype=dtype)

    ux, uy = disp_e[:, :, 0], disp_e[:, :, 1]
    g11 = jnp.sum(ux * dNdx, axis=1)
    g12 = jnp.sum(ux * dNdy, axis=1)
    g21 = jnp.sum(uy * dNdx, axis=1)
    g22 = jnp.sum(uy * dNdy, axis=1)
    strain = jnp.stack([g11, g22, 0.5 * (g12 + g21)], axis=1)
    stress = strain @ Dj.T

    dvol = area * thickness
    Nmid = 0.25
    b = jnp.asarray(bforce, dtype=dtype)
    Fx = (dens * dvol * Nmid)[:, None] * b[0] \
        - dvol[:, None] * (dNdx * stress[:, 0:1] + dNdy * stress[:, 2:3])
    Fy = (dens * dvol * Nmid)[:, None] * b[1] \
        - dvol[:, None] * (dNdx * stress[:, 2:3] + dNdy * stress[:, 1:2])

    # Hourglass viscous force
    hg = 0.25 * hg_visc * dens * wave_speed * jnp.sqrt(jnp.abs(area))
    vx, vy = velo_e[:, :, 0], velo_e[:, :, 1]
    gamma = jnp.asarray([1.0, -1.0, 1.0, -1.0], dtype=dtype)
    H1 = -jnp.sum(vx * gamma, axis=1) * hg
    H2 = -jnp.sum(vy * gamma, axis=1) * hg
    Fx = Fx + H1[:, None] * gamma[None, :]
    Fy = Fy + H2[:, None] * gamma[None, :]

    return jnp.stack([Fx, Fy], axis=2).reshape(coords_e.shape[0], 8)
