"""Pallas DIA SpMV kernel vs the XLA reference implementation.

Runs in interpreter mode on CPU (tests force jax_platforms=cpu); the
compiled kernel is exercised by bench.py on the real chip.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from pfemfort_tpu.assembly.assemble import assemble_matrix
from pfemfort_tpu.assembly.pattern import build_pattern
from pfemfort_tpu.dofs.dofmap import build_dofmap
from pfemfort_tpu.elements.geometry import to_element_minor
from pfemfort_tpu.elements.poisson import poisson_element_matrices
from pfemfort_tpu.mesh import generate
from pfemfort_tpu.sparse.dia import spmv_dia
from pfemfort_tpu.sparse.pallas_spmv import spmv_dia_pallas


def _dia_system(n=6):
    mesh, dbc = generate.box_tet(0, 1, n, 0, 1, n, 0, 1, n)
    dofmap = build_dofmap(mesh, 1, dbc)
    pattern = build_pattern(dofmap.elem_dof, dofmap.total_dof)
    Ke, _ = poisson_element_matrices(
        jnp.asarray(to_element_minor(mesh.elem_coords())), "tetra4")
    return assemble_matrix(Ke, pattern)


def test_pallas_dia_matches_xla_single_block():
    A = _dia_system(6)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(A.n_rows))
    y_ref = np.asarray(spmv_dia(A, x))
    y = np.asarray(spmv_dia_pallas(A, x, interpret=True))
    assert np.allclose(y, y_ref, atol=1e-12)


def test_pallas_dia_matches_xla_multi_block():
    A = _dia_system(8)
    x = jnp.asarray(np.random.default_rng(1).standard_normal(A.n_rows))
    y_ref = np.asarray(spmv_dia(A, x))
    # force several row blocks within one chunk
    y = np.asarray(spmv_dia_pallas(A, x, block_rows=8, interpret=True))
    assert np.allclose(y, y_ref, atol=1e-12)


def test_pallas_dia_matches_xla_chunked():
    """x larger than the VMEM budget: the XLA-level chunk wrapper."""
    A = _dia_system(10)
    x = jnp.asarray(np.random.default_rng(2).standard_normal(A.n_rows))
    y_ref = np.asarray(spmv_dia(A, x))
    # tiny budget -> several chunks (each >= one block + halo window)
    y = np.asarray(spmv_dia_pallas(A, x, block_rows=8, vmem_x_rows=32,
                                   interpret=True))
    assert np.allclose(y, y_ref, atol=1e-12)
