"""Device-side assembly: statically-permuted gather + sorted segment-sum.

Replaces MatSetValues/VecSetValues + MatAssemblyBegin/End
(/root/reference/src/solverpetsc.F:328-468) with pure-functional scatter-adds
whose index sets were precomputed by assembly/pattern.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pfemfort_tpu.assembly.pattern import AssemblyPattern
from pfemfort_tpu.sparse.formats import ELLMatrix


def assemble_ell_values(Ke: jnp.ndarray, pattern: AssemblyPattern,
                        ell_cols: jnp.ndarray) -> ELLMatrix:
    """Sum all element stiffness entries into a padded-ELL value array.

    Ke: (E, ns, ns).  The static `mat_perm` gather orders contributions by
    destination slot; the sorted segment-sum then reduces duplicates.  The
    final segment collects every dropped (BC) contribution and is discarded.
    """
    contrib = Ke.reshape(-1)[jnp.asarray(pattern.mat_perm)]
    sums = jax.ops.segment_sum(
        contrib,
        jnp.asarray(pattern.mat_segids),
        num_segments=pattern.mat_nsegs,
        indices_are_sorted=True,
    )
    vals = sums[:-1].reshape(pattern.n_rows, pattern.ell_k)
    return ELLMatrix(cols=ell_cols, vals=vals, n_cols=pattern.n_rows)


def assemble_rhs(Fe: jnp.ndarray, pattern: AssemblyPattern) -> jnp.ndarray:
    """Scatter-add element vectors (E, ns) into the reduced rhs (n_rows,)."""
    contrib = Fe.reshape(-1)[jnp.asarray(pattern.rhs_perm)]
    sums = jax.ops.segment_sum(
        contrib,
        jnp.asarray(pattern.rhs_segids),
        num_segments=pattern.rhs_nsegs,
        indices_are_sorted=True,
    )
    return sums[:-1]


def dirichlet_rhs_correction(Ke: jnp.ndarray, ubc_e: jnp.ndarray) -> jnp.ndarray:
    """Element-level Dirichlet elimination into the RHS.

    F_e[i] = - sum_j K_e[i,j] * ubc_e[j]  where ubc_e carries applied values
    on BC slots and 0 on free slots — the reference's in-assembly elimination
    (/root/reference/src/triapoissonserialimpl1.F:625-637).  Rows that are
    themselves BC dofs get dropped by the rhs scatter plan.
    """
    return -jnp.einsum("eij,ej->ei", Ke, ubc_e)


def scatter_full(Fe: jnp.ndarray, perm: jnp.ndarray, segids: jnp.ndarray,
                 n_full: int) -> jnp.ndarray:
    """Scatter-add element vectors into the FULL node-dof vector (explicit
    dynamics path: rhs is indexed by global node-dof, not reduced eq id —
    /root/reference/src/triaelasticityexplicit.F:1039-1054)."""
    contrib = Fe.reshape(-1)[perm]
    sums = jax.ops.segment_sum(
        contrib, segids, num_segments=n_full, indices_are_sorted=True)
    return sums
