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
