"""Static sparsity pattern + scatter plan (host-side, numpy, built once).

TPU-native replacement for the reference's two-pass MatSetValues flow
(sparsity INSERT pre-pass at /root/reference/src/triapoissonparallelimpl1.F:
814-825, ADD_VALUES assembly at :849-905): because the mesh is static, the
entire scatter is precomputed as
  * a permutation that sorts all element (row, col) contributions by their
    destination ELL slot, and
  * sorted segment ids for an `indices_are_sorted` segment-sum.
Device-side assembly is then: gather(Ke.flat, perm) -> segment_sum -> vals.
Dropped contributions (BC rows/cols, elem_dof == -1) map to a trailing
sentinel segment, exactly like PETSc's VEC_IGNORE_NEGATIVE_INDICES trick
(/root/reference/src/solverpetsc.F:142-143).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np

from pfemfort_tpu.sparse.dia import DIAPlan, build_dia_plan
from pfemfort_tpu.sparse.formats import ELLMatrix, round_up


@dataclasses.dataclass
class AssemblyPattern:
    n_rows: int
    nnz: int
    # CSR structure (host, for export/debug and ELL construction)
    indptr: np.ndarray    # (n_rows+1,) int64
    indices: np.ndarray   # (nnz,) int32
    # ELL structure
    ell_k: int
    ell_cols: np.ndarray  # (n_rows, ell_k) int32, pad = n_rows sentinel
    # Matrix scatter plan: element entries -> ELL flat positions
    mat_perm: np.ndarray      # (n_entries,) int32/int64 gather permutation
    mat_segids: np.ndarray    # (n_entries,) sorted ELL flat position ids
    mat_nsegs: int            # n_rows*ell_k + 1 (last = dropped sentinel)
    # RHS scatter plan: element rows -> reduced-dof positions
    rhs_perm: np.ndarray
    rhs_segids: np.ndarray
    rhs_nsegs: int            # n_rows + 1
    # Optional diagonal-offset structure (TPU fast path; sparse/dia.py)
    dia: Optional[DIAPlan] = None


def _csr_from_elem_dof(elem_dof: np.ndarray, n_rows: int):
    """Unique (row, col) pairs over all element dof pairs with both >= 0."""
    ns = elem_dof.shape[1]
    rows = np.repeat(elem_dof, ns, axis=1).ravel()       # (E, ns*ns) i-major
    cols = np.tile(elem_dof, (1, ns)).ravel()
    valid = (rows >= 0) & (cols >= 0)
    keys = rows.astype(np.int64) * n_rows + cols.astype(np.int64)
    uk = np.unique(keys[valid])
    indices = (uk % n_rows).astype(np.int32)
    urows = (uk // n_rows).astype(np.int64)
    counts = np.bincount(urows, minlength=n_rows)
    indptr = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(counts, out=indptr[1:])
    return indptr, indices, uk, rows, cols, valid


def build_pattern(elem_dof: np.ndarray, n_rows: int,
                  lane_pad: int = 8) -> AssemblyPattern:
    """Build CSR/ELL pattern and static scatter plans from elem_dof.

    elem_dof: (n_elem, ns) int32 reduced equation ids with -1 sentinels.
    """
    elem_dof = np.asarray(elem_dof)
    E, ns = elem_dof.shape
    indptr, indices, uk, rows, cols, valid = _csr_from_elem_dof(
        elem_dof, n_rows)
    nnz = indices.shape[0]

    # --- ELL structure ---------------------------------------------------
    row_deg = np.diff(indptr)
    ell_k = int(round_up(max(int(row_deg.max(initial=0)), 1), lane_pad))
    ell_cols = np.full((n_rows, ell_k), n_rows, dtype=np.int32)
    # position of each CSR entry within its row
    within = np.arange(nnz, dtype=np.int64) - np.repeat(indptr[:-1], row_deg)
    csr_row = np.repeat(np.arange(n_rows, dtype=np.int64), row_deg)
    ell_cols[csr_row, within] = indices
    csr_to_ellflat = csr_row * ell_k + within  # (nnz,)

    # --- matrix scatter plan ---------------------------------------------
    # Each element entry (flattened e, i, j order) -> ELL flat position.
    keys = rows.astype(np.int64) * n_rows + cols.astype(np.int64)
    # Map each valid key to its CSR index via searchsorted on unique keys.
    csr_pos = np.searchsorted(uk, keys[valid])
    dropped_id = n_rows * ell_k
    dest = np.full(E * ns * ns, dropped_id, dtype=np.int64)
    dest[valid] = csr_to_ellflat[csr_pos]
    mat_perm = np.argsort(dest, kind="stable")
    mat_segids = dest[mat_perm]

    # --- rhs scatter plan -------------------------------------------------
    rdest = elem_dof.ravel().astype(np.int64)
    rdest[rdest < 0] = n_rows
    rhs_perm = np.argsort(rdest, kind="stable")
    rhs_segids = rdest[rhs_perm]

    idx_dtype = np.int32 if E * ns * ns < 2**31 else np.int64
    dia = build_dia_plan(indptr, indices, ell_k)
    return AssemblyPattern(
        n_rows=n_rows,
        nnz=nnz,
        indptr=indptr,
        indices=indices,
        ell_k=ell_k,
        ell_cols=ell_cols,
        mat_perm=mat_perm.astype(idx_dtype),
        mat_segids=mat_segids.astype(idx_dtype if dropped_id < 2**31 else np.int64),
        mat_nsegs=n_rows * ell_k + 1,
        rhs_perm=rhs_perm.astype(idx_dtype),
        rhs_segids=rhs_segids.astype(np.int32 if n_rows < 2**31 else np.int64),
        rhs_nsegs=n_rows + 1,
        dia=dia,
    )
