"""Native C++ component tests (skipped if the library isn't built)."""

import os
import subprocess

import numpy as np
import pytest

from pfemfort_tpu import native
from pfemfort_tpu.mesh import generate, io as mesh_io
from pfemfort_tpu.parallel.partition import rcb_partition

pytestmark = pytest.mark.skipif(
    not native.available(), reason="libpfemnative.so not built "
    "(make -C pfemfort_tpu/native)")

BUILD = os.path.join(os.path.dirname(native.__file__), "build")


def test_native_rcb_matches_python_balance():
    pts = np.random.default_rng(0).uniform(size=(2000, 3))
    for k in (2, 4, 7):
        p_nat = native.rcb_partition(pts, k)
        counts = np.bincount(p_nat, minlength=k)
        assert counts.min() > 0
        assert counts.max() - counts.min() <= 2000 // k // 2 + 2


def test_native_greedy_balanced():
    mesh, _ = generate.box_tet(0, 1, 4, 0, 1, 4, 0, 1, 4)
    part = native.greedy_partition(mesh.conn, mesh.n_node, 3, 4)
    counts = np.bincount(part, minlength=4)
    assert counts.min() >= counts.max() - counts.max() // 2
    cut = native.edge_cut(mesh.conn, mesh.n_node, 3, part)
    assert cut > 0


def test_native_gen_matches_python_generator(tmp_path):
    prefix = str(tmp_path / "nat")
    native.gen_tet_mesh(0, 1, 3, 0, 2, 3, 0, 1, 3, prefix)
    mesh_n, dbc_n, _ = mesh_io.read_problem(prefix)
    mesh_p, dbc_p = generate.box_tet(0, 1, 3, 0, 2, 3, 0, 1, 3)
    assert np.allclose(mesh_n.coords, mesh_p.coords, atol=1e-8)
    assert (mesh_n.conn == mesh_p.conn).all()
    # same boundary set and values
    dn = {(int(r[0]), int(r[1])): r[2] for r in dbc_n}
    dp = {(int(r[0]), int(r[1])): r[2] for r in dbc_p}
    assert set(dn) == set(dp)
    for k in dn:
        assert abs(dn[k] - dp[k]) < 1e-8


def test_native_cli_partition(tmp_path):
    prefix = str(tmp_path / "box")
    native.gen_tet_mesh(0, 1, 3, 0, 1, 3, 0, 1, 3, prefix)
    out = subprocess.run(
        [os.path.join(BUILD, "pfem_partition"), "3", "4", "0", "4",
         prefix + "-nodes.dat", prefix + "-elems.dat",
         str(tmp_path / "part.vtk")],
        capture_output=True, text=True)
    assert out.returncode == 0, out.stderr
    assert "edge-cut" in out.stdout
    text = open(str(tmp_path / "part.vtk")).read()
    assert "SCALARS procid int 1" in text


def test_native_ell_pattern_matches_numpy():
    """The C++ radix-sort pattern builder must equal the numpy builder
    bit-for-bit (same CSR, ELL, scatter permutation and segment ids)."""
    import numpy as np

    from pfemfort_tpu import native
    from pfemfort_tpu.assembly import pattern as pat
    from pfemfort_tpu.dofs.dofmap import build_dofmap
    from pfemfort_tpu.mesh import generate

    if not native.available():
        import pytest
        pytest.skip("native library not built")
    mesh, dbc = generate.box_tet(0, 1, 5, 0, 1, 5, 0, 1, 8)
    perm = np.random.default_rng(0).permutation(mesh.n_node)
    mesh = mesh.renumbered(perm.astype(np.int64))
    dbc = dbc.copy()
    dbc[:, 0] = perm[dbc[:, 0].astype(np.int64)]
    for ndof in (1, 3):
        dm = build_dofmap(mesh, ndof, dbc)
        a = pat.build_pattern(dm.elem_dof, dm.total_dof, layout="ell")
        orig = native.ell_pattern
        native.ell_pattern = lambda *x, **k: None
        try:
            b = pat.build_pattern(dm.elem_dof, dm.total_dof, layout="ell")
        finally:
            native.ell_pattern = orig
        assert (a.nnz, a.ell_k) == (b.nnz, b.ell_k)
        for f in ("indptr", "indices", "ell_cols", "mat_perm",
                  "mat_segids"):
            np.testing.assert_array_equal(
                np.asarray(getattr(a, f)), np.asarray(getattr(b, f)),
                err_msg=f)


def test_native_sg_plan_matches_numpy():
    """The C++ per-tile slot-gather plan builder must equal the numpy
    builder bit-for-bit across banded / random / RCM-ordered / rectangular
    (ghost-extended) patterns."""
    import numpy as np

    from pfemfort_tpu import native
    from pfemfort_tpu.sparse import slotgather as sgm

    if not native.available():
        import pytest
        pytest.skip("native library not built")

    def compare(cols, n_rows, order=None, n_cols=None, sub=32):
        a = sgm.build_slotgather_plan(cols, n_rows, order=order,
                                      n_cols=n_cols, sub=sub)
        orig = native.sg_plan
        native.sg_plan = lambda *x, **k: None
        try:
            b = sgm.build_slotgather_plan(cols, n_rows, order=order,
                                          n_cols=n_cols, sub=sub)
        finally:
            native.sg_plan = orig
        assert (a.T, a.V, a.G) == (b.T, b.V, b.G)
        for f in ("qsel", "vstart", "rsel", "eps", "src"):
            np.testing.assert_array_equal(getattr(a, f), getattr(b, f),
                                          err_msg=f)

    rng = np.random.default_rng(1)
    N, K = 2000, 6
    cols = np.sort(rng.integers(0, N, (N, K)), axis=1).astype(np.int64)
    cols[::5, -1] = N + 7
    compare(cols, N)
    offs = np.arange(-4, 5)
    band = np.clip(np.sort(np.arange(N)[:, None] + offs, axis=1),
                   0, N - 1).astype(np.int64)
    compare(band, N)
    rect = np.sort(rng.integers(0, 2400, (N, 8)), axis=1).astype(np.int64)
    compare(rect, N, n_cols=2400, sub=8)


def test_partition_quality_edge_cut_delaunay():
    """Partition-quality regression (the reference reports METIS objval,
    meshpartitioncpp.cpp:339): on a genuinely unstructured Delaunay mesh
    both RCB and greedy must cut FAR fewer dual-graph edges than a random
    balanced partition — edge cut drives ghost volume and therefore ICI
    traffic in every distributed solve."""
    from scipy.spatial import Delaunay

    from pfemfort_tpu.mesh.core import Mesh
    from pfemfort_tpu.parallel.partition import partition_elements

    if not native.available():
        import pytest
        pytest.skip("native library unavailable")

    rng = np.random.default_rng(5)
    n = 10
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

    S = 8
    cuts = {}
    for method in ("rcb", "greedy"):
        part = partition_elements(mesh, S, method=method)
        counts = np.bincount(part, minlength=S)
        assert counts.min() > 0
        cuts[method] = native.edge_cut(mesh.conn, mesh.n_node, 3, part)
    rand = rng.permutation(np.arange(mesh.n_elem) % S).astype(np.int32)
    cuts["random"] = native.edge_cut(mesh.conn, mesh.n_node, 3, rand)

    assert cuts["rcb"] > 0 and cuts["greedy"] > 0
    # pin the quality ratio: geometric/graph partitions must beat random
    # by >= 2x (they achieve ~5-10x on this mesh; 2x leaves slack for rng)
    assert cuts["rcb"] < 0.5 * cuts["random"], cuts
    assert cuts["greedy"] < 0.5 * cuts["random"], cuts
