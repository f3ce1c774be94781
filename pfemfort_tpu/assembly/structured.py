"""Structured slice-add assembly: scatter-free stiffness assembly for
generated box-tet meshes.

For the mesh the reference's generator produces (box -> 6 tets per hex,
lexicographic node numbering; genTetranovtk.cpp:203-208), every element
entry's destination is a FIXED lattice shift of the hex index: element
e = (hex, class c), its node i sits at hex_base + corner_offset(c, i), and
the (row, col) pair lands on diagonal offset(c,i,j) at a translated copy of
the hex lattice.  Assembly therefore reduces to 6*npe^2 = 96 STATIC
slice-adds of dense (nez, ney, nex) blocks into the (D, nnz, nny, nnx) DIA
value lattice — no scatters, no gathers, pure streaming adds at HBM
bandwidth.  This is the assembly analog of the DIA SpMV fast path and the
speed-of-light formulation of the reference's MatSetValues loop for its own
benchmark meshes.

Only valid for the FULL node-dof system (rows = lattice node ids), i.e. the
MatZeroRows BC mode (assembly/fullsystem.py).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

from pfemfort_tpu.mesh.generate import _TET_SPLIT
from pfemfort_tpu.sparse.dia import DIAMatrix


class StructuredPlan(NamedTuple):
    nex: int
    ney: int
    nez: int
    ndof: int
    offsets: Tuple[int, ...]          # DIA offsets (flat dof-id differences)
    # per entry: (class, n_row, n_col, d, rz, ry, rx, ci) where n_row/n_col
    # are flat element dof slots (i*ndof+ci, j*ndof+cj)
    entries: Tuple[Tuple[int, int, int, int, int, int, int, int], ...]
    # per (class, n_row, rz, ry, rx, ci) for the rhs
    rhs_entries: Tuple[Tuple[int, int, int, int, int, int], ...]


def _corner_bits(k: int) -> Tuple[int, int, int]:
    """pts[k] of the reference generator: (bx, by, bz) lattice bits."""
    return (k & 1, (k >> 1) & 1, (k >> 2) & 1)


def build_structured_plan(nex: int, ney: int, nez: int,
                          ndof: int = 1) -> StructuredPlan:
    nnx, nny = nex + 1, ney + 1
    sy, sz = nnx, nnx * nny

    def node_off(corner):
        bx, by, bz = _corner_bits(corner)
        return bx + by * sy + bz * sz, (bz, by, bx)

    offsets = set()
    entries = []
    rhs_entries = []
    for c in range(6):
        corners = _TET_SPLIT[c]
        for i in range(4):
            oi, (rz, ry, rx) = node_off(int(corners[i]))
            for ci in range(ndof):
                rhs_entries.append((c, i * ndof + ci, rz, ry, rx, ci))
                for j in range(4):
                    oj, _ = node_off(int(corners[j]))
                    for cj in range(ndof):
                        o = (oj - oi) * ndof + (cj - ci)
                        offsets.add(o)
                        entries.append((c, i * ndof + ci, j * ndof + cj,
                                        o, rz, ry, rx, ci))
    offs = tuple(sorted(offsets))
    idx = {o: d for d, o in enumerate(offs)}
    entries = tuple((c, nr, nc, idx[o], rz, ry, rx, ci)
                    for (c, nr, nc, o, rz, ry, rx, ci) in entries)
    return StructuredPlan(nex=nex, ney=ney, nez=nez, ndof=ndof,
                          offsets=offs, entries=entries,
                          rhs_entries=tuple(rhs_entries))


def assemble_dia_structured(Ke: jnp.ndarray,
                            plan: StructuredPlan) -> DIAMatrix:
    """Ke (ns, ns, E) with e = hex*6 + class -> DIA over the node lattice.

    6*ns^2 static slice-adds; zero scatters.  The DIA lattice is viewed as
    (D, nnz, nny, nnx, ndof); entry (class, n_row, n_col) lands on diagonal
    d at the translated hex block for component ci.
    """
    nex, ney, nez = plan.nex, plan.ney, plan.nez
    nnx, nny, nnz_ = nex + 1, ney + 1, nez + 1
    ndof = plan.ndof
    ns = 4 * ndof
    D = len(plan.offsets)
    n = nnx * nny * nnz_ * ndof
    vals = jnp.zeros((D, nnz_, nny, nnx, ndof), dtype=Ke.dtype)
    Kc = Ke.reshape(ns, ns, -1, 6)  # (nr, nc, hex, class); hex = (iz,iy,ix)
    for (c, nr, nc, d, rz, ry, rx, ci) in plan.entries:
        blk = Kc[nr, nc, :, c].reshape(nez, ney, nex)
        vals = vals.at[d, rz:rz + nez, ry:ry + ney, rx:rx + nex, ci].add(blk)
    return DIAMatrix(vals=vals.reshape(D, n), offsets=plan.offsets, n_rows=n)


def assemble_rhs_structured(Fe: jnp.ndarray,
                            plan: StructuredPlan) -> jnp.ndarray:
    """Fe (ns, E) -> full nodal-dof rhs (n,), 6*ns static slice-adds."""
    nex, ney, nez = plan.nex, plan.ney, plan.nez
    nnx, nny, nnz_ = nex + 1, ney + 1, nez + 1
    ndof = plan.ndof
    ns = 4 * ndof
    rhs = jnp.zeros((nnz_, nny, nnx, ndof), dtype=Fe.dtype)
    Fc = Fe.reshape(ns, -1, 6)
    for (c, nr, rz, ry, rx, ci) in plan.rhs_entries:
        blk = Fc[nr, :, c].reshape(nez, ney, nex)
        rhs = rhs.at[rz:rz + nez, ry:ry + ney, rx:rx + nex, ci].add(blk)
    return rhs.reshape(-1)
