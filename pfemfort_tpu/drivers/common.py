"""Shared implicit-solve pipeline: dofmap -> pattern -> assemble -> Krylov.

This is the single skeleton every reference driver re-implements inline
(read files -> DOF maps -> preallocate -> assemble -> solve -> gather;
/root/reference/src/triapoissonserialimpl1.F and 14 siblings).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pfemfort_tpu.assembly.assemble import (
    assemble_ell_values,
    assemble_rhs,
    dirichlet_rhs_correction,
)
from pfemfort_tpu.assembly.pattern import AssemblyPattern, build_pattern
from pfemfort_tpu.dofs.dofmap import DofMap, build_dofmap
from pfemfort_tpu.mesh.core import Mesh
from pfemfort_tpu.solve.cg import (
    SolveStats,
    bicgstab_solve,
    cg_solve,
    jacobi_preconditioner,
)
from pfemfort_tpu.sparse.dia import dia_diagonal, ell_to_dia, spmv_dia
from pfemfort_tpu.sparse.spmv import extract_diagonal, spmv_ell


class ImplicitResult(NamedTuple):
    u_full: np.ndarray        # (n_node*ndof,) solution incl. BC values
    u_reduced: jax.Array      # (total_dof,) device solution
    stats: SolveStats
    timings: dict


def solve_implicit(
    mesh: Mesh,
    ndof: int,
    dirichlet: np.ndarray,
    element_fn: Callable,
    force_bc: Optional[np.ndarray] = None,
    dtype=None,
    rtol: float = 1e-8,
    atol: float = 0.0,
    maxiter: Optional[int] = None,
    method: str = "cg",
) -> ImplicitResult:
    """Assemble and solve K u = F for one element kernel.

    Args:
      element_fn: coords_e (E,npe,ndim) -> (Ke (E,ns,ns), Fe_src (E,ns)).
      dirichlet:  (n,3) [node, dof, value] rows (0-based).
      force_bc:   optional (n,3) nodal point loads added to the rhs
                  (the reference's ForceBC files,
                  /root/reference/src/triaelasticityparallelimpl1.F:976-987).
      method:     'cg' (reference default, solverpetsc.F:187) or 'bicgstab'.
    """
    if dtype is None:
        dtype = jnp.zeros(0).dtype  # respect jax_enable_x64
    t0 = time.perf_counter()
    dofmap = build_dofmap(mesh, ndof, dirichlet)
    pattern = build_pattern(dofmap.elem_dof, dofmap.total_dof)
    t_pattern = time.perf_counter() - t0

    coords_e = jnp.asarray(mesh.elem_coords(), dtype=dtype)
    ubc_e = jnp.asarray(
        dofmap.bc_values_full[dofmap.elem_nodedof], dtype=dtype)
    ell_cols = jnp.asarray(pattern.ell_cols)

    fvec = np.zeros(dofmap.total_dof, dtype=np.float64)
    if force_bc is not None and len(force_bc):
        rows = dofmap.node_dof[force_bc[:, 0].astype(np.int64),
                               force_bc[:, 1].astype(np.int64)]
        keep = rows >= 0
        np.add.at(fvec, rows[keep], force_bc[keep, 2])
    fvec = jnp.asarray(fvec, dtype=dtype)

    if maxiter is None:
        maxiter = max(10 * dofmap.total_dof, 1000)
    solver = cg_solve if method == "cg" else bicgstab_solve

    use_dia = pattern.dia is not None

    @jax.jit
    def assemble_and_solve(coords_e, ubc_e, fvec):
        Ke, Fe_src = element_fn(coords_e)
        A = assemble_ell_values(Ke, pattern, ell_cols)
        Fe = Fe_src + dirichlet_rhs_correction(Ke, ubc_e)
        b = assemble_rhs(Fe, pattern) + fvec
        if use_dia:
            # Lattice-structured pattern: gather-free diagonal SpMV
            Ad = ell_to_dia(pattern.dia, A.vals)
            operator = lambda x: spmv_dia(Ad, x)
            diag = dia_diagonal(Ad)
        else:
            operator = lambda x: spmv_ell(A, x)
            diag = extract_diagonal(A)
        u, stats = solver(
            operator,
            b,
            precond=jacobi_preconditioner(diag),
            rtol=rtol,
            atol=atol,
            maxiter=maxiter,
        )
        return u, stats

    t1 = time.perf_counter()
    u, stats = assemble_and_solve(coords_e, ubc_e, fvec)
    u = jax.block_until_ready(u)
    t_solve = time.perf_counter() - t1

    u_full = dofmap.expand_solution(np.asarray(u, dtype=np.float64))
    return ImplicitResult(
        u_full=u_full,
        u_reduced=u,
        stats=jax.tree.map(lambda a: np.asarray(a), stats),
        timings=dict(pattern_s=t_pattern, solve_s=t_solve),
    )
