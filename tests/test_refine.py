"""Mixed-precision iterative refinement tests (f32 inner, f64 outer)."""

import jax
import jax.numpy as jnp
import numpy as np

from pfemfort_tpu.assembly.assemble import (
    assemble_matrix,
    assemble_rhs,
    dirichlet_rhs_correction,
)
from pfemfort_tpu.assembly.pattern import build_pattern
from pfemfort_tpu.dofs.dofmap import build_dofmap
from pfemfort_tpu.elements.poisson import poisson_element_matrices
from pfemfort_tpu.mesh import generate
from pfemfort_tpu.solve.cg import jacobi_preconditioner
from pfemfort_tpu.solve.refine import cg_with_refinement
from pfemfort_tpu.sparse.dia import dia_diagonal, spmv_dia


def _system(dtype):
    mesh, dbc = generate.box_tet(0, 1, 6, 0, 1, 6, 0, 1, 6)
    dofmap = build_dofmap(mesh, 1, dbc)
    pattern = build_pattern(dofmap.elem_dof, dofmap.total_dof)
    from pfemfort_tpu.elements.geometry import to_element_minor
    coords_e = jnp.asarray(to_element_minor(mesh.elem_coords()),
                           dtype=dtype)
    Ke, Fe = poisson_element_matrices(coords_e, "tetra4", source=-6.0)
    Ad = assemble_matrix(Ke, pattern)
    ubc = jnp.asarray(dofmap.bc_values_full[dofmap.elem_nodedof].T,
                      dtype=dtype)
    b = assemble_rhs(Fe + dirichlet_rhs_correction(Ke, ubc), pattern)
    return mesh, dofmap, Ad, b


def test_refinement_reaches_1e10():
    mesh, dofmap, Ad64, b64 = _system(jnp.float64)
    _, _, Ad32, _ = _system(jnp.float32)

    x, stats = cg_with_refinement(
        op64=lambda v: spmv_dia(Ad64, v),
        op32=lambda v: spmv_dia(Ad32, v),
        b64=b64,
        precond32=jacobi_preconditioner(dia_diagonal(Ad32)),
        rtol=1e-10,
        inner_rtol=1e-5,
    )
    assert stats.converged, stats
    assert stats.relres <= 1e-10
    # true f64 residual check
    r = np.asarray(b64 - spmv_dia(Ad64, x))
    assert np.linalg.norm(r) / np.linalg.norm(np.asarray(b64)) <= 1e-10
    # and the solution is the manufactured one
    u_full = dofmap.expand_solution(np.asarray(x))
    u_exact = (mesh.coords ** 2).sum(axis=1)
    assert np.abs(u_full - u_exact).max() < 1e-7


def test_plain_f32_cg_cannot_reach_1e10():
    """Sanity: without refinement, f32 CG stalls well above 1e-10 —
    demonstrating the refinement is doing real work."""
    from pfemfort_tpu.solve.cg import cg_solve

    _, _, Ad32, _ = _system(jnp.float32)
    mesh, dofmap, Ad64, b64 = _system(jnp.float64)
    b32 = b64.astype(jnp.float32)
    x32, st = cg_solve(lambda v: spmv_dia(Ad32, v), b32,
                       precond=jacobi_preconditioner(dia_diagonal(Ad32)),
                       rtol=1e-10, maxiter=2000)
    r = np.asarray(b64 - spmv_dia(Ad64, x32.astype(jnp.float64)))
    relres = np.linalg.norm(r) / np.linalg.norm(np.asarray(b64))
    assert relres > 1e-10  # f32 floor
