"""Incompressible Navier-Stokes: explicit fractional-step (Chorin) solver.

The reference ships only abandoned scaffolding for this capability
(cfdexplicittria6node.F calls a nonexistent residual and its update is
commented out; elementutilitiescfd.F does not compile — SURVEY §2.2).  This
module provides a WORKING equal-order tria3 fractional-step scheme, built
from the same ingredients the reference intended (lumped velocity mass,
nodal momentum residual, pressure Poisson solve):

  1. u* = u^n + dt M_L^{-1} R(u^n)        momentum: convection + viscosity
  2. L p = (1/dt) ∫ N div u*              pressure Poisson (our DIA CG)
  3. u^{n+1} = u* - dt M_L^{-1} G p       projection

All element operations are batched element-minor kernels; the pressure solve
reuses the assembled Poisson operator (static geometry => assembled once).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from pfemfort_tpu.assembly.assemble import assemble_matrix, assemble_rhs
from pfemfort_tpu.assembly.pattern import build_pattern
from pfemfort_tpu.dofs.dofmap import build_dofmap
from pfemfort_tpu.elements.basis import tabulate_basis
from pfemfort_tpu.elements.geometry import grads_and_det, to_element_minor
from pfemfort_tpu.elements.poisson import poisson_element_matrices
from pfemfort_tpu.mesh.core import Mesh
from pfemfort_tpu.solve.cg import cg_solve, jacobi_preconditioner
from pfemfort_tpu.sparse.ops import operator_and_diag


class NSResult(NamedTuple):
    velocity: np.ndarray   # (n_node, 2)
    pressure: np.ndarray   # (n_node,)
    div_history: np.ndarray  # (n_sample,) max |div u| over time
    times: np.ndarray


def _momentum_residual(coords_em, gradN, dvol, Nj, u_em, v_em, nu_visc):
    """R_i = -int N_i (u . grad)u - nu int gradN_i . grad u, per component.

    u_em/v_em (npe, E) nodal velocity components; returns (npe, E) x 2.
    """
    G, pdim, npe, _ = gradN.shape
    # velocity and gradient at gauss points
    ug = sum(Nj[:, i][:, None] * u_em[i][None, :] for i in range(npe))
    vg = sum(Nj[:, i][:, None] * v_em[i][None, :] for i in range(npe))
    dudx = sum(gradN[:, 0, i, :] * u_em[i][None, :] for i in range(npe))
    dudy = sum(gradN[:, 1, i, :] * u_em[i][None, :] for i in range(npe))
    dvdx = sum(gradN[:, 0, i, :] * v_em[i][None, :] for i in range(npe))
    dvdy = sum(gradN[:, 1, i, :] * v_em[i][None, :] for i in range(npe))
    conv_u = ug * dudx + vg * dudy      # (G, E)
    conv_v = ug * dvdx + vg * dvdy

    Ru = []
    Rv = []
    for i in range(npe):
        ru = sum(dvol[g] * (-Nj[g, i] * conv_u[g]
                            - nu_visc * (gradN[g, 0, i, :] * dudx[g]
                                         + gradN[g, 1, i, :] * dudy[g]))
                 for g in range(G))
        rv = sum(dvol[g] * (-Nj[g, i] * conv_v[g]
                            - nu_visc * (gradN[g, 0, i, :] * dvdx[g]
                                         + gradN[g, 1, i, :] * dvdy[g]))
                 for g in range(G))
        Ru.append(ru)
        Rv.append(rv)
    return jnp.stack(Ru), jnp.stack(Rv)


def fractional_step_ns(
    mesh: Mesh,
    velocity_bc: np.ndarray,   # (n, 3) [node, dof(0|1), value]
    nu_visc: float,
    dt: float,
    nsteps: int,
    pressure_pin: Optional[int] = None,
    u0: Optional[np.ndarray] = None,
    rtol_p: float = 1e-8,
    sample_every: int = 10,
    dtype=None,
) -> NSResult:
    """Run the fractional-step scheme on a tria3 mesh.

    velocity_bc fixes velocity components (e.g. lid-driven cavity walls).
    pressure_pin: node whose pressure is fixed to 0 (default: node 0).
    """
    assert mesh.etype == "tria3", "fractional-step NS implemented for tria3"
    if dtype is None:
        dtype = jnp.zeros(0).dtype
    n = mesh.n_node
    if pressure_pin is None:
        pressure_pin = 0

    # --- static tables -----------------------------------------------------
    _, wts, N, dNdu = tabulate_basis("tria3", 1)
    coords_em = jnp.asarray(to_element_minor(mesh.elem_coords()),
                            dtype=dtype)
    gradN, det = grads_and_det(coords_em, dNdu)
    wts_j = jnp.asarray(wts, dtype=dtype)
    dvol = wts_j[:, None] * det          # (G, E)
    Nj = np.asarray(N, dtype=np.float64)

    conn_t = jnp.asarray(mesh.conn.T.astype(np.int32))   # (npe, E)
    npe = mesh.npe
    G = dNdu.shape[0]

    # lumped velocity mass (per node, density 1)
    Mn_e = jnp.stack([sum(float(Nj[g, i]) * dvol[g] for g in range(G))
                      for i in range(npe)])              # (npe, E)
    M = jax.ops.segment_sum(Mn_e.reshape(-1), conn_t.reshape(-1),
                            num_segments=n)
    Minv = jnp.where(M > 0, 1.0 / M, 1.0)

    # pressure Poisson operator: Dirichlet pin at one node
    pin_bc = np.array([[pressure_pin, 0, 0.0]])
    dof_p = build_dofmap(mesh, 1, pin_bc)
    pat_p = build_pattern(dof_p.elem_dof, dof_p.total_dof)
    Kp, _ = poisson_element_matrices(coords_em, "tria3")
    Ap = assemble_matrix(Kp, pat_p)
    op_p, diag_p = operator_and_diag(Ap)
    scatter_p = jnp.asarray(dof_p.assy_for_soln)  # reduced row -> node

    # velocity BC masks
    vbc_mask = np.zeros((n, 2), dtype=bool)
    vbc_val = np.zeros((n, 2))
    if velocity_bc is not None and len(velocity_bc):
        nn = velocity_bc[:, 0].astype(np.int64)
        dd = velocity_bc[:, 1].astype(np.int64)
        vbc_mask[nn, dd] = True
        vbc_val[nn, dd] = velocity_bc[:, 2]
    vbc_mask = jnp.asarray(vbc_mask)
    vbc_val = jnp.asarray(vbc_val, dtype=dtype)

    Njd = jnp.asarray(Nj, dtype=dtype)

    def nodal_div_rhs(u, v):
        """b_i = int N_i div(u) over the mesh (n,)."""
        u_em = u[conn_t]
        v_em = v[conn_t]
        dudx = sum(gradN[:, 0, i, :] * u_em[i][None, :] for i in range(npe))
        dvdy = sum(gradN[:, 1, i, :] * v_em[i][None, :] for i in range(npe))
        div_g = dudx + dvdy                              # (G, E)
        Fe = jnp.stack([sum(dvol[g] * Njd[g, i] * div_g[g]
                            for g in range(G)) for i in range(npe)])
        return jax.ops.segment_sum(Fe.reshape(-1), conn_t.reshape(-1),
                                   num_segments=n), div_g

    def pressure_gradient(p):
        """(G p)_i = int N_i grad p -> nodal vectors (n,) x 2 (weak form
        with sign matching -dt Minv G p update via integration by parts:
        int N_i dp/dx)."""
        p_em = p[conn_t]
        dpdx = sum(gradN[:, 0, i, :] * p_em[i][None, :] for i in range(npe))
        dpdy = sum(gradN[:, 1, i, :] * p_em[i][None, :] for i in range(npe))
        Fx = jnp.stack([sum(dvol[g] * Njd[g, i] * dpdx[g]
                            for g in range(G)) for i in range(npe)])
        Fy = jnp.stack([sum(dvol[g] * Njd[g, i] * dpdy[g]
                            for g in range(G)) for i in range(npe)])
        gx = jax.ops.segment_sum(Fx.reshape(-1), conn_t.reshape(-1),
                                 num_segments=n)
        gy = jax.ops.segment_sum(Fy.reshape(-1), conn_t.reshape(-1),
                                 num_segments=n)
        return gx, gy

    def apply_vbc(u, v):
        u = jnp.where(vbc_mask[:, 0], vbc_val[:, 0], u)
        v = jnp.where(vbc_mask[:, 1], vbc_val[:, 1], v)
        return u, v

    @jax.jit
    def step(carry, _):
        u, v, p = carry
        # 1. explicit momentum
        u_em = u[conn_t]
        v_em = v[conn_t]
        Ru_e, Rv_e = _momentum_residual(coords_em, gradN, dvol, Njd,
                                        u_em, v_em, nu_visc)
        Ru = jax.ops.segment_sum(Ru_e.reshape(-1), conn_t.reshape(-1),
                                 num_segments=n)
        Rv = jax.ops.segment_sum(Rv_e.reshape(-1), conn_t.reshape(-1),
                                 num_segments=n)
        us = u + dt * Minv * Ru
        vs = v + dt * Minv * Rv
        us, vs = apply_vbc(us, vs)
        # 2. pressure Poisson.  Note the sign: the discrete div-of-gradient
        # D M^-1 G approximates -L (integration by parts flips the sign),
        # so removing the divergence requires  L p = -(1/dt) int N div u*.
        bdiv, _ = nodal_div_rhs(us, vs)
        b_red = (-bdiv / dt)[scatter_p]
        p_red, _ = cg_solve(op_p, b_red,
                            x0=p[scatter_p],
                            precond=jacobi_preconditioner(diag_p),
                            rtol=rtol_p, maxiter=2000)
        p_full = jnp.zeros((n,), dtype=us.dtype).at[scatter_p].set(p_red)
        # 3. projection
        gx, gy = pressure_gradient(p_full)
        un = us - dt * Minv * gx
        vn = vs - dt * Minv * gy
        un, vn = apply_vbc(un, vn)
        _, div_g = nodal_div_rhs(un, vn)
        maxdiv = jnp.max(jnp.abs(div_g))
        return (un, vn, p_full), maxdiv

    if u0 is None:
        u = jnp.zeros((n,), dtype=dtype)
        v = jnp.zeros((n,), dtype=dtype)
    else:
        u = jnp.asarray(u0[:, 0], dtype=dtype)
        v = jnp.asarray(u0[:, 1], dtype=dtype)
    u, v = apply_vbc(u, v)
    p = jnp.zeros((n,), dtype=dtype)

    (u, v, p), divs = jax.lax.scan(step, (u, v, p), None, length=nsteps)

    vel = np.stack([np.asarray(u, dtype=np.float64),
                    np.asarray(v, dtype=np.float64)], axis=1)
    return NSResult(
        velocity=vel,
        pressure=np.asarray(p, dtype=np.float64),
        div_history=np.asarray(divs),
        times=np.arange(nsteps) * dt,
    )
