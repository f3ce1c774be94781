"""Distributed CG over a device mesh via shard_map.

The reference's multi-rank solve is PETSc KSP CG over MPI: SpMV halo
exchange + dot-product allreduces (/root/reference/src/solverpetsc.F:476,
SURVEY §2.6).  Here the same CG body (solve/cg.py) runs inside `shard_map`:
  * rows of the padded ELL matrix are sharded over the 'shard' mesh axis,
  * SpMV gathers x with `all_gather` over ICI (halo-windowed ppermute is the
    planned optimization; all_gather is the correct general form),
  * dot products are local dots + `psum` — exactly PETSc's VecDot allreduce.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh as JMesh
from jax.sharding import NamedSharding, PartitionSpec as P

from pfemfort_tpu.parallel.halo import halo_width, spmv_dia_halo
from pfemfort_tpu.solve.cg import cg_solve, jacobi_preconditioner


def distributed_cg_solve(
    device_mesh: JMesh,
    cols: jax.Array,       # (n_rows_padded, K) int32, global column ids
    vals: jax.Array,       # (n_rows_padded, K)
    b: jax.Array,          # (n_rows_padded,)
    rtol: float = 1e-8,
    maxiter: int = 10_000,
    axis: str = "shard",
):
    """Run Jacobi-preconditioned CG with rows sharded over `axis`.

    Returns (x (n_rows_padded,), SolveStats) with x fully replicated.
    """
    n_rows = cols.shape[0]

    def local_diag(cols_l, vals_l, row0):
        rows = row0 + jnp.arange(cols_l.shape[0], dtype=cols_l.dtype)[:, None]
        return jnp.sum(jnp.where(cols_l == rows, vals_l, 0), axis=1)

    def body(cols_l, vals_l, b_l):
        idx = jax.lax.axis_index(axis)
        rows_local = cols_l.shape[0]
        row0 = (idx * rows_local).astype(cols_l.dtype)

        def operator(x_l):
            x_full = jax.lax.all_gather(x_l, axis, tiled=True)
            xp = jnp.concatenate(
                [x_full, jnp.zeros((1,), dtype=x_full.dtype)])
            return jnp.sum(vals_l * xp[cols_l], axis=1)

        def dot(a, c):
            return jax.lax.psum(
                jnp.dot(a, c, precision=jax.lax.Precision.HIGHEST), axis)

        def dot2(a, c, d, e):
            # single fused reduction for two inner products
            pair = jnp.stack([
                jnp.dot(a, c, precision=jax.lax.Precision.HIGHEST),
                jnp.dot(d, e, precision=jax.lax.Precision.HIGHEST)])
            pair = jax.lax.psum(pair, axis)
            return pair[0], pair[1]

        diag = local_diag(cols_l, vals_l, row0)
        x_l, stats = cg_solve(
            operator, b_l,
            precond=jacobi_preconditioner(diag),
            rtol=rtol, maxiter=maxiter, dot=dot, dot2=dot2)
        return x_l, stats

    mapped = jax.shard_map(
        body,
        mesh=device_mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis)),
        out_specs=(P(axis), P()),
    )
    return jax.jit(mapped)(cols, vals, b)


def distributed_cg_solve_dia(
    device_mesh: JMesh,
    offsets,               # static tuple of diagonal offsets
    dia_vals: jax.Array,   # (D, n_rows_padded)
    b: jax.Array,          # (n_rows_padded,)
    rtol: float = 1e-8,
    maxiter: int = 10_000,
    axis: str = "shard",
):
    """CG with the halo-exchange DIA SpMV: per-iteration comm is two
    ppermute shifts of the halo width W = max|offset| (plus psum dots)
    instead of an all_gather of the full vector — the overlap-friendly
    'interior SpMV + neighbor halo' structure PETSc uses over MPI
    (SURVEY §5 'long-context' row).
    """
    n_rows = b.shape[0]
    n_shards = device_mesh.devices.size
    rows_per_shard = n_rows // n_shards
    w = halo_width(offsets)
    use_halo = w <= rows_per_shard
    try:
        d0 = list(offsets).index(0)
    except ValueError:
        d0 = None

    def body(vals_l, b_l):
        if use_halo:
            def operator(x_l):
                return spmv_dia_halo(offsets, vals_l, x_l, w, axis)
        else:
            # halo wider than a shard (tiny shards): gather the whole x and
            # slice at the shard's global row offset
            from pfemfort_tpu.sparse.dia import spmv_dia_local

            def operator(x_l):
                x_full = jax.lax.all_gather(x_l, axis, tiled=True)
                row0 = jax.lax.axis_index(axis) * rows_per_shard
                return spmv_dia_local(offsets, vals_l, x_full, row0)

        def dot(a, c):
            return jax.lax.psum(
                jnp.dot(a, c, precision=jax.lax.Precision.HIGHEST), axis)

        def dot2(a, c, d, e):
            pair = jnp.stack([
                jnp.dot(a, c, precision=jax.lax.Precision.HIGHEST),
                jnp.dot(d, e, precision=jax.lax.Precision.HIGHEST)])
            pair = jax.lax.psum(pair, axis)
            return pair[0], pair[1]

        diag = vals_l[d0] if d0 is not None else jnp.zeros_like(b_l)
        x_l, stats = cg_solve(
            operator, b_l,
            precond=jacobi_preconditioner(diag),
            rtol=rtol, maxiter=maxiter, dot=dot, dot2=dot2)
        return x_l, stats

    mapped = jax.shard_map(
        body,
        mesh=device_mesh,
        in_specs=(P(None, axis), P(axis)),
        out_specs=(P(axis), P()),
    )
    return jax.jit(mapped)(dia_vals, b)


def shard_arrays(device_mesh: JMesh, axis: str, *arrays):
    """Place arrays with their leading dim sharded over `axis`."""
    out = []
    for a in arrays:
        spec = P(axis, *([None] * (a.ndim - 1)))
        out.append(jax.device_put(a, NamedSharding(device_mesh, spec)))
    return tuple(out)
