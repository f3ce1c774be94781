"""DIA diagonal-format SpMV tests: must agree exactly with ELL."""

import jax.numpy as jnp
import numpy as np
import pytest

from pfemfort_tpu.assembly.assemble import assemble_ell_values
from pfemfort_tpu.assembly.pattern import build_pattern
from pfemfort_tpu.dofs.dofmap import build_dofmap
from pfemfort_tpu.drivers.poisson import solve_poisson
from pfemfort_tpu.elements.poisson import poisson_element_matrices
from pfemfort_tpu.elements.elasticity import dmat_3d, elasticity_stiffness
from pfemfort_tpu.mesh import generate
from pfemfort_tpu.sparse.dia import dia_diagonal, ell_to_dia, spmv_dia
from pfemfort_tpu.sparse.spmv import extract_diagonal, spmv_ell


def _system(mesh, ndof, dbc, element_fn):
    dofmap = build_dofmap(mesh, ndof, dbc)
    pattern = build_pattern(dofmap.elem_dof, dofmap.total_dof)
    Ke, _ = element_fn(jnp.asarray(mesh.elem_coords()))
    A = assemble_ell_values(Ke, pattern, jnp.asarray(pattern.ell_cols))
    return dofmap, pattern, A


def test_box_tet_pattern_is_dia():
    mesh, dbc = generate.box_tet(0, 1, 6, 0, 1, 6, 0, 1, 6)
    dofmap, pattern, A = _system(
        mesh, 1, dbc, lambda c: poisson_element_matrices(c, "tetra4"))
    assert pattern.dia is not None
    assert len(pattern.dia.offsets) == 15  # the 6-tet split stencil

    Ad = ell_to_dia(pattern.dia, A.vals)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(pattern.n_rows))
    y_ell = np.asarray(spmv_ell(A, x))
    y_dia = np.asarray(spmv_dia(Ad, x))
    assert np.allclose(y_ell, y_dia, atol=1e-12)
    assert np.allclose(np.asarray(dia_diagonal(Ad)),
                       np.asarray(extract_diagonal(A)))


def test_rect_tria_pattern_is_dia():
    mesh = generate.rect_tria(0, 1, 10, 0, 1, 10)
    b = generate.boundary_nodes(mesh)
    dbc = np.stack([b.astype(float), np.zeros(len(b)), np.zeros(len(b))], 1)
    dofmap, pattern, A = _system(
        mesh, 1, dbc, lambda c: poisson_element_matrices(c, "tria3"))
    assert pattern.dia is not None
    Ad = ell_to_dia(pattern.dia, A.vals)
    x = jnp.asarray(np.random.default_rng(1).standard_normal(pattern.n_rows))
    assert np.allclose(np.asarray(spmv_ell(A, x)),
                       np.asarray(spmv_dia(Ad, x)), atol=1e-12)


def test_elasticity_3d_pattern_dia_or_fallback():
    """3D elasticity: if the plan qualifies it must match ELL; the solver
    must work either way."""
    mesh, _ = generate.box_tet(0, 1, 3, 0, 1, 3, 0, 1, 3)
    base = np.nonzero(np.isclose(mesh.coords[:, 0], 0))[0]
    dbc = np.array([[n, d, 0.0] for n in base for d in (0, 1, 2)])
    D = dmat_3d(240.565, 0.3)
    dofmap, pattern, A = _system(
        mesh, 3, dbc, lambda c: elasticity_stiffness(c, "tetra4", D))
    if pattern.dia is not None:
        Ad = ell_to_dia(pattern.dia, A.vals)
        x = jnp.asarray(
            np.random.default_rng(2).standard_normal(pattern.n_rows))
        assert np.allclose(np.asarray(spmv_ell(A, x)),
                           np.asarray(spmv_dia(Ad, x)), atol=1e-9)


def test_unstructured_mesh_falls_back_to_ell():
    """A randomly perturbed-connectivity mesh should not qualify for DIA
    (or if it does, results still agree) — and solve_poisson must work."""
    mesh, dbc = generate.box_tet(0, 1, 3, 0, 1, 3, 0, 1, 3)
    # random node permutation destroys the lattice offsets
    rng = np.random.default_rng(3)
    perm = rng.permutation(mesh.n_node).astype(np.int32)
    mesh2 = mesh.renumbered(perm)
    dbc2 = dbc.copy()
    dbc2[:, 0] = perm[dbc[:, 0].astype(np.int64)]
    res = solve_poisson(mesh2, dbc2, rtol=1e-10)
    assert res.stats.converged
    u_exact = (mesh2.coords ** 2).sum(axis=1)
    assert np.abs(res.u_full - u_exact).max() < 1e-8


def test_solve_poisson_uses_dia_and_matches():
    """Same answer through the driver with and without the DIA fast path."""
    mesh, dbc = generate.box_tet(0, 1, 4, 0, 1, 4, 0, 1, 4)
    res = solve_poisson(mesh, dbc, rtol=1e-11)
    u_exact = (mesh.coords ** 2).sum(axis=1)
    assert np.abs(res.u_full - u_exact).max() < 1e-8
