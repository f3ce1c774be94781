"""DIA (diagonal-offset) sparse format: the TPU-native SpMV for
lattice-structured FEM matrices.

After lexicographic node numbering, the reduced stiffness matrix of every
structured benchmark mesh (the reference's box tet meshes, tria grids) has a
SMALL fixed set of nonzero diagonals — e.g. exactly 15 offsets for the 6-tet
split 3D Poisson matrix.  SpMV then needs NO gathers at all:

    y[i] = sum_d vals[d, i] * x[i + off_d]

i.e. D shifted element-wise FMAs — pure VPU + sequential HBM streams, the
shape TPUs run at memory bandwidth.  This replaces the gather-based ELL SpMV
(sparse/spmv.py) whenever the pattern qualifies; unstructured meshes fall
back to ELL.  (PETSc's MPIAIJ CSR — solverpetsc.F:152-166 — has no such
fast path; this is a genuinely TPU-first design choice.)
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class DIAMatrix(NamedTuple):
    offsets: Tuple[int, ...]  # static diagonal offsets (col - row)
    vals: jax.Array           # (D, n_rows): vals[d, r] = A[r, r + off_d]
    n_rows: int


class DIAPlan(NamedTuple):
    """Host-built static map: ELL value array -> DIA value array."""

    offsets: Tuple[int, ...]
    src: np.ndarray  # (D * n_rows,) int: index into ell_vals.flat, or
                     # n_rows*ell_k (sentinel -> 0)
    n_rows: int


def build_dia_plan(indptr: np.ndarray, indices: np.ndarray, ell_k: int,
                   max_offsets: int = 128) -> Optional[DIAPlan]:
    """Detect diagonal structure in a CSR pattern; None if too irregular."""
    n_rows = len(indptr) - 1
    nnz = len(indices)
    row_deg = np.diff(indptr)
    rows = np.repeat(np.arange(n_rows, dtype=np.int64), row_deg)
    offs = indices.astype(np.int64) - rows
    uniq = np.unique(offs)
    if len(uniq) > max_offsets:
        return None
    # DIA storage cost vs ELL: D*N vs ell_k*N — accept if not much worse.
    if len(uniq) > 4 * ell_k:
        return None
    off_index = {int(o): d for d, o in enumerate(uniq)}
    d_of_entry = np.searchsorted(uniq, offs)
    within = np.arange(nnz, dtype=np.int64) - np.repeat(indptr[:-1], row_deg)
    ell_flat = rows * ell_k + within
    src = np.full(len(uniq) * n_rows, n_rows * ell_k, dtype=np.int64)
    src[d_of_entry * n_rows + rows] = ell_flat
    dt = np.int32 if n_rows * ell_k < 2**31 else np.int64
    return DIAPlan(offsets=tuple(int(o) for o in uniq),
                   src=src.astype(dt), n_rows=n_rows)


def ell_to_dia(plan: DIAPlan, ell_vals: jnp.ndarray) -> DIAMatrix:
    """Static gather converting assembled ELL values to DIA values."""
    flat = jnp.concatenate(
        [ell_vals.reshape(-1), jnp.zeros((1,), dtype=ell_vals.dtype)])
    vals = flat[jnp.asarray(plan.src)].reshape(len(plan.offsets), plan.n_rows)
    return DIAMatrix(offsets=plan.offsets, vals=vals, n_rows=plan.n_rows)


def spmv_dia(A: DIAMatrix, x: jnp.ndarray) -> jnp.ndarray:
    """y = A x as D shifted FMAs (no gathers)."""
    offs = A.offsets
    neg = max(0, -min(offs))
    pos = max(0, max(offs))
    n = A.n_rows
    xpad = jnp.concatenate([
        jnp.zeros((neg,), dtype=x.dtype), x,
        jnp.zeros((pos,), dtype=x.dtype)])
    y = jnp.zeros_like(x)
    for d, o in enumerate(offs):
        xs = jax.lax.slice_in_dim(xpad, neg + o, neg + o + n)
        y = y + A.vals[d] * xs
    return y


def dia_diagonal(A: DIAMatrix) -> jnp.ndarray:
    try:
        d0 = A.offsets.index(0)
    except ValueError:
        return jnp.zeros((A.n_rows,), dtype=A.vals.dtype)
    return A.vals[d0]


def spmv_dia_local(offsets: Tuple[int, ...], vals_local: jnp.ndarray,
                   x_global: jnp.ndarray, row0) -> jnp.ndarray:
    """Shard-local DIA SpMV: rows [row0, row0+P) against a gathered global x.

    x slices start at traced row0 + static offset -> dynamic_slice, still no
    per-element gathers.
    """
    P = vals_local.shape[1]
    offs = offsets
    neg = max(0, -min(offs))
    pos = max(0, max(offs))
    xpad = jnp.concatenate([
        jnp.zeros((neg,), dtype=x_global.dtype), x_global,
        jnp.zeros((pos,), dtype=x_global.dtype)])
    y = jnp.zeros((P,), dtype=x_global.dtype)
    for d, o in enumerate(offs):
        xs = jax.lax.dynamic_slice_in_dim(xpad, row0 + (neg + o), P)
        y = y + vals_local[d] * xs
    return y
