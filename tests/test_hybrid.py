"""Hybrid DIA + slot-gather split: the plan must reproduce the ELL SpMV
exactly, collapse to pure DIA on scrambled lattices, and compose its two
source maps correctly (sparse/hybrid.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pfemfort_tpu.assembly.assemble import assemble_matrix
from pfemfort_tpu.assembly.pattern import build_pattern
from pfemfort_tpu.dofs.dofmap import build_dofmap
from pfemfort_tpu.elements.geometry import to_element_minor
from pfemfort_tpu.elements.poisson import poisson_element_matrices
from pfemfort_tpu.mesh import generate
from pfemfort_tpu.sparse.hybrid import (
    apply_hybrid_reference,
    build_best_hybrid,
    build_hybrid_plan,
)
from pfemfort_tpu.sparse.spmv import spmv_ell


def _scrambled_system(n, seed=0):
    mesh, dbc = generate.box_tet(0, 1, n, 0, 1, n, 0, 1, n)
    perm = np.random.default_rng(seed).permutation(mesh.n_node)
    mesh = mesh.renumbered(perm.astype(np.int64))
    dbc = dbc.copy()
    dbc[:, 0] = perm[dbc[:, 0].astype(np.int64)]
    dofmap = build_dofmap(mesh, 1, dbc)
    pattern = build_pattern(dofmap.elem_dof, dofmap.total_dof, layout="ell")
    coords_em = jnp.asarray(to_element_minor(mesh.elem_coords()),
                            dtype=jnp.float32)
    Ke, _ = poisson_element_matrices(coords_em, "tetra4", source=-6.0)
    A = assemble_matrix(Ke, pattern)
    rows_xyz = mesh.coords[dofmap.assy_for_soln]
    return mesh, pattern, A, rows_xyz


def test_hybrid_collapses_to_pure_dia_on_scrambled_lattice():
    """Geometric-lex ordering recovers the lattice stencil exactly: every
    nonzero lands on a dense diagonal and the remainder is EMPTY — the
    whole SpMV rides the 730 GB/s DIA kernel with NO row-count cap."""
    mesh, pattern, A, rows_xyz = _scrambled_system(8)
    plan = build_best_hybrid(pattern, coords_rows=rows_xyz)
    assert plan.sg is None, (plan.D, plan.nnz_rem)
    assert 1 <= plan.D <= 20
    assert plan.nnz_dia == int(np.sum(np.asarray(A.vals) != 0)) or \
        plan.nnz_dia >= pattern.nnz - 1  # pattern nnz incl. stored zeros

    rng = np.random.default_rng(1)
    x = rng.normal(size=pattern.n_rows).astype(np.float64)
    y_ref = np.asarray(spmv_ell(A, jnp.asarray(x, jnp.float64)))
    xp = x[plan.order]
    y_p = apply_hybrid_reference(plan, np.asarray(A.vals, np.float64), xp)
    np.testing.assert_allclose(y_p, y_ref[plan.order], atol=1e-12)


def test_hybrid_matches_ell_spmv_on_delaunay():
    """Genuinely unstructured mesh: the split (some diagonals + slot-gather
    remainder) must still reproduce the ELL SpMV bit-for-bit in f64."""
    from scipy.spatial import Delaunay

    from pfemfort_tpu.mesh.core import Mesh

    rng = np.random.default_rng(3)
    n = 7
    g = np.linspace(0, 1, n + 1)
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    pts = np.stack([X, Y, Z], axis=-1).reshape(-1, 3)
    interior = ((pts > 1e-9) & (pts < 1 - 1e-9)).all(axis=1)
    pts[interior] += rng.uniform(-0.25, 0.25, (int(interior.sum()), 3)) / n
    tri = Delaunay(pts)
    conn = tri.simplices.astype(np.int64)
    a, b, c, d = (pts[conn[:, i]] for i in range(4))
    vol6 = np.einsum("ij,ij->i", np.cross(b - a, c - a), d - a)
    conn[vol6 < 0] = conn[vol6 < 0][:, [0, 2, 1, 3]]
    conn = conn[np.abs(vol6) > 1e-12]
    mesh = Mesh("tetra4", pts, conn.astype(np.int32))
    hull = np.unique(tri.convex_hull)
    dbc = np.stack([hull, np.zeros(len(hull)), np.zeros(len(hull))], axis=1)

    dofmap = build_dofmap(mesh, 1, dbc)
    pattern = build_pattern(dofmap.elem_dof, dofmap.total_dof, layout="ell")
    coords_em = jnp.asarray(to_element_minor(mesh.elem_coords()),
                            dtype=jnp.float64)
    Ke, _ = poisson_element_matrices(coords_em, "tetra4", source=-6.0)
    A = assemble_matrix(Ke, pattern)
    rows_xyz = mesh.coords[dofmap.assy_for_soln]

    plan = build_best_hybrid(pattern, coords_rows=rows_xyz)
    assert plan.D >= 1          # the main diagonal is always 100% full
    assert plan.nnz_dia + plan.nnz_rem == pattern.nnz

    x = np.random.default_rng(4).normal(size=pattern.n_rows)
    y_ref = np.asarray(spmv_ell(A, jnp.asarray(x)))
    y_p = apply_hybrid_reference(plan, np.asarray(A.vals, np.float64),
                                 x[plan.order])
    np.testing.assert_allclose(y_p, y_ref[plan.order], atol=1e-12)


def test_hybrid_unordered_random_ell():
    """order=None path + a pattern with a deliberately low-fill band mix:
    equality against a dense product, and the threshold actually splits."""
    rng = np.random.default_rng(7)
    n, K = 400, 9
    cols = np.full((n, K), n, dtype=np.int64)
    dense = np.zeros((n, n))
    vals = np.zeros((n, K))
    for i in range(n):
        # always the diagonal; band +-1 at ~60% fill; far random couplings
        cands = [i]
        if i + 1 < n and rng.uniform() < 0.6:
            cands.append(i + 1)
        if i - 1 >= 0 and rng.uniform() < 0.6:
            cands.append(i - 1)
        cands += list(rng.choice(n, size=3, replace=False))
        cands = sorted(set(cands))[:K]
        for k, c in enumerate(cands):
            cols[i, k] = c
            v = rng.normal()
            vals[i, k] = v
            dense[i, c] += v
    plan = build_hybrid_plan(cols, n, order=None, fill_threshold=0.3)
    assert plan.D >= 1 and plan.sg is not None
    assert plan.nnz_dia + plan.nnz_rem == int((cols < n).sum())
    x = rng.normal(size=n)
    y_p = apply_hybrid_reference(plan, vals, x)
    np.testing.assert_allclose(y_p, dense @ x, atol=1e-10)


def test_hybrid_zero_threshold_equals_full_dia():
    """fill_threshold=0 extracts EVERY occupied diagonal on a small banded
    system (remainder empty), exercising the max_d cap path too."""
    rng = np.random.default_rng(9)
    n, K = 200, 5
    cols = np.full((n, K), n, dtype=np.int64)
    vals = np.zeros((n, K))
    dense = np.zeros((n, n))
    for i in range(n):
        cands = sorted({i, max(i - 2, 0), min(i + 3, n - 1)})
        for k, c in enumerate(cands):
            cols[i, k] = c
            v = rng.normal()
            vals[i, k] = v
            dense[i, c] += v
    plan = build_hybrid_plan(cols, n, order=None, fill_threshold=0.0)
    assert plan.sg is None or plan.sg.V <= 8
    x = rng.normal(size=n)
    np.testing.assert_allclose(apply_hybrid_reference(plan, vals, x),
                               dense @ x, atol=1e-10)
