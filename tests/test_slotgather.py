"""Slot-gather ELL SpMV plan: host re-packing semantics vs direct ELL.

The Pallas kernel itself needs a real TPU (Mosaic gather lowerings); these
tests validate the plan construction + the value packing + the reference
executor on CPU, which pin down exactly what the kernel computes.  The
compiled kernel is exercised by bench.py's unstructured stage on hardware.
"""

import numpy as np

from pfemfort_tpu.sparse.slotgather import (
    SlotGatherPlan, apply_slotgather_reference, build_slotgather_plan,
    rcm_order)


def _ell_spmv_np(cols, vals, x, n_rows):
    m = cols < n_rows
    xs = np.where(m, x[np.clip(cols, 0, n_rows - 1)], 0.0)
    return (np.where(m, vals, 0.0) * xs).sum(axis=1)


def _pack_np(plan: SlotGatherPlan, vals):
    vflat = vals.reshape(-1)
    return np.where(plan.src >= 0, vflat[np.clip(plan.src, 0, None)],
                    0.0).astype(vals.dtype)


def _roundtrip(cols, n_rows, order=None, seed=0):
    rng = np.random.default_rng(seed)
    N, K = cols.shape
    vals = rng.standard_normal((N, K)).astype(np.float32)
    x = rng.standard_normal((n_rows,)).astype(np.float32)
    y_ref = _ell_spmv_np(cols, vals, x, n_rows)
    plan = build_slotgather_plan(cols, n_rows, order=order)
    valsv = _pack_np(plan, vals)
    if order is not None:
        y = apply_slotgather_reference(plan, valsv, x[order])
        y_ref = y_ref[order]
    else:
        y = apply_slotgather_reference(plan, valsv, x)
    scale = max(np.abs(y_ref).max(), 1e-30)
    return np.abs(y - y_ref).max() / scale, plan


def test_random_pattern_matches_ell():
    rng = np.random.default_rng(1)
    N, K = 1000, 6
    cols = np.sort(rng.integers(0, N, (N, K)), axis=1).astype(np.int64)
    cols[::5, -1] = N + 7            # padded slots
    err, _ = _roundtrip(cols, N)
    assert err < 1e-5


def test_banded_pattern_small_v():
    N, K = 5000, 9
    offs = np.arange(-4, 5)
    cols = np.clip(np.sort(np.arange(N)[:, None] + offs, axis=1),
                   0, N - 1).astype(np.int64)
    err, plan = _roundtrip(cols, N)
    assert err < 1e-5
    # a +-4 band stays within ~2 aligned windows per tile
    assert plan.V <= 4 * ((K + 7) // 8 * 8)
    assert plan.G <= 8


def test_tet_mesh_rcm_order_compact_plan():
    from pfemfort_tpu.assembly.pattern import build_pattern
    from pfemfort_tpu.dofs.dofmap import build_dofmap
    from pfemfort_tpu.mesh import generate

    n = 10
    mesh, dbc = generate.box_tet(0, 1, n, 0, 1, n, 0, 1, n)
    perm = np.random.default_rng(2).permutation(mesh.n_node)
    mesh = mesh.renumbered(perm.astype(np.int64))
    dbc = dbc.copy()
    dbc[:, 0] = perm[dbc[:, 0].astype(np.int64)]
    dofmap = build_dofmap(mesh, 1, dbc)
    pattern = build_pattern(dofmap.elem_dof, dofmap.total_dof, layout="ell")
    order = rcm_order(pattern.indptr, pattern.indices, pattern.n_rows)
    err, plan = _roundtrip(pattern.ell_cols.astype(np.int64),
                           pattern.n_rows, order=order)
    assert err < 1e-5
    # RCM keeps the permuted lattice's plan compact (identity ordering on
    # this mesh yields V ~ hundreds)
    assert plan.V <= 64
    err_raw, plan_raw = _roundtrip(pattern.ell_cols.astype(np.int64),
                                   pattern.n_rows)
    assert err_raw < 1e-5
    assert plan.V <= plan_raw.V


def test_packed_values_sum_to_matrix():
    """Every nonzero lands in exactly one (tile, v, lane) slot."""
    rng = np.random.default_rng(3)
    N, K = 640, 5
    cols = np.sort(rng.integers(0, N, (N, K)), axis=1).astype(np.int64)
    plan = build_slotgather_plan(cols, N)
    vals = rng.standard_normal((N, K)).astype(np.float32)
    valsv = _pack_np(plan, vals)
    assert valsv.shape == (plan.T, plan.V, 128)
    assert np.isclose(valsv.sum(), vals.sum(), rtol=1e-5)
    src = plan.src[plan.src >= 0]
    assert len(np.unique(src)) == len(src) == N * K


def test_reference_executor_cg_converges():
    """The plan operator drives a plain CG on an SPD banded system."""
    N = 2000
    offs = np.arange(-2, 3)
    cols = np.clip(np.sort(np.arange(N)[:, None] + offs, axis=1),
                   0, N - 1).astype(np.int64)
    vals = np.where(cols == np.arange(N)[:, None], 5.0, -1.0
                    ).astype(np.float32)
    plan = build_slotgather_plan(cols, N)
    valsv = _pack_np(plan, vals)
    op = lambda v: apply_slotgather_reference(plan, valsv, v)
    rng = np.random.default_rng(4)
    b = rng.standard_normal(N).astype(np.float32)
    x = np.zeros(N, np.float32)
    r = b - op(x)
    p = r.copy()
    rs = r @ r
    for _ in range(200):
        Ap = op(p)
        a = rs / (p @ Ap)
        x += a * p
        r -= a * Ap
        rs2 = r @ r
        if np.sqrt(rs2) < 1e-5 * np.linalg.norm(b):
            break
        p = r + (rs2 / rs) * p
        rs = rs2
    assert np.sqrt(r @ r) < 1e-4 * np.linalg.norm(b)
    y_ref = _ell_spmv_np(cols, vals, x, N)
    assert np.abs(y_ref - b).max() < 1e-3


def test_pad_plan_unequal_dims_stack():
    """pad_plan to uniform (T, V, G): the max-V plan receives extra pad
    groups with NO new virtual rows — those must stage the scratch region,
    not re-stage real rows V-8..V-1 from window 0 (which silently corrupted
    the max-V shard of a stacked multi-shard plan)."""
    from pfemfort_tpu.sparse.slotgather import pad_plan, uniform_dims

    rng = np.random.default_rng(7)
    N = 16384
    # plan A: wide band -> large V, few window groups
    offs = np.arange(-12, 13)
    colsA = np.clip(np.sort(np.arange(N)[:, None] + offs, axis=1),
                    0, N - 1).astype(np.int64)
    # plan B: few virtual rows but spread over far-apart aligned windows
    # (each its own q) -> small V, MANY groups
    lanes = np.arange(N, dtype=np.int64) % 128
    colsB = np.stack([b * 8 * 128 + lanes for b in (0, 3, 7, 11)],
                     axis=1)
    colsB = np.minimum(colsB, N - 1)
    plans = [build_slotgather_plan(colsA, N), build_slotgather_plan(colsB, N)]
    assert plans[0].V > plans[1].V          # A is the max-V plan
    T, V, G = uniform_dims(plans)
    assert G > plans[0].G                   # A needs extra (row-less) groups
    for cols, plan in zip((colsA, colsB), plans):
        vals = rng.standard_normal(cols.shape).astype(np.float32)
        x = rng.standard_normal(N).astype(np.float32)
        y_ref = _ell_spmv_np(cols, vals, x, N)
        padded = pad_plan(plan, T, V, G)
        y = apply_slotgather_reference(padded, _pack_np(padded, vals), x)
        scale = max(np.abs(y_ref).max(), 1e-30)
        assert np.abs(y - y_ref).max() / scale < 1e-5


def test_coord_lex_order_beats_rcm_on_lattice():
    """build_best_plan: the geometric lex candidate must win (smaller V) on
    a scrambled lattice mesh and still compute the correct SpMV."""
    from pfemfort_tpu.assembly.pattern import build_pattern
    from pfemfort_tpu.dofs.dofmap import build_dofmap
    from pfemfort_tpu.mesh import generate
    from pfemfort_tpu.sparse.slotgather import build_best_plan

    n = 10
    mesh, dbc = generate.box_tet(0, 1, n, 0, 1, n, 0, 1, n)
    perm = np.random.default_rng(6).permutation(mesh.n_node)
    mesh = mesh.renumbered(perm.astype(np.int64))
    dbc = dbc.copy()
    dbc[:, 0] = perm[dbc[:, 0].astype(np.int64)]
    dofmap = build_dofmap(mesh, 1, dbc)
    pattern = build_pattern(dofmap.elem_dof, dofmap.total_dof, layout="ell")
    plan = build_best_plan(pattern,
                           coords_rows=mesh.coords[dofmap.assy_for_soln])
    rcm = rcm_order(pattern.indptr, pattern.indices, pattern.n_rows)
    plan_rcm = build_slotgather_plan(pattern.ell_cols, pattern.n_rows,
                                     order=rcm)
    assert plan.V <= plan_rcm.V
    # correctness through the reference executor in the winning order
    rng = np.random.default_rng(7)
    N, K = pattern.n_rows, pattern.ell_k
    vals = rng.standard_normal((N, K)).astype(np.float32)
    x = rng.standard_normal(N).astype(np.float32)
    y = apply_slotgather_reference(plan, _pack_np(plan, vals), x[plan.order])
    y_ref = _ell_spmv_np(pattern.ell_cols.astype(np.int64), vals, x,
                         N)[plan.order]
    scale = max(np.abs(y_ref).max(), 1e-30)
    assert np.abs(y - y_ref).max() / scale < 1e-5
