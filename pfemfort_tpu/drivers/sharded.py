"""Multi-device implicit solve: partition -> assemble -> distributed CG.

The TPU analog of the reference's parallel drivers
(tetrapoissonparallelimpl1 et al., SURVEY §3.1): slab/RCB partition replaces
METIS, shard-contiguous renumbering replaces node_start/node_end, and the
distributed CG replaces PETSc KSP over MPI.  Prefers the halo-exchange DIA
SpMV (O(halo) ppermute per iteration); falls back to the all_gather ELL path
for unstructured numbering.
"""

from __future__ import annotations

import time
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pfemfort_tpu.assembly.assemble import (
    assemble_matrix,
    assemble_rhs,
    dirichlet_rhs_correction,
)
from pfemfort_tpu.drivers.common import ImplicitResult
from pfemfort_tpu.mesh.core import Mesh
from pfemfort_tpu.parallel.shard import ShardedSystem, build_sharded_system
from pfemfort_tpu.parallel.shard_cg import (
    distributed_cg_solve,
    distributed_cg_solve_dia,
    shard_arrays,
)
from pfemfort_tpu.sparse.dia import DIAMatrix


def solve_implicit_sharded(
    mesh: Mesh,
    ndof: int,
    dirichlet: np.ndarray,
    element_fn: Callable,
    n_shards: Optional[int] = None,
    device_mesh=None,
    force_bc: Optional[np.ndarray] = None,
    dtype=None,
    rtol: float = 1e-8,
    maxiter: int = 10_000,
    partition_method: str = "slab",
) -> ImplicitResult:
    if dtype is None:
        dtype = jnp.zeros(0).dtype
    if device_mesh is None:
        devs = jax.devices()
        n_shards = n_shards or len(devs)
        device_mesh = jax.sharding.Mesh(
            np.array(devs[:n_shards]), ("shard",))
    n_shards = device_mesh.devices.size

    t0 = time.perf_counter()
    sys_ = build_sharded_system(mesh, ndof, dirichlet, n_shards,
                                method=partition_method)
    t_pattern = time.perf_counter() - t0

    from pfemfort_tpu.elements.geometry import to_element_minor
    coords_em = jnp.asarray(to_element_minor(mesh.elem_coords()),
                            dtype=dtype)
    ubc_e = jnp.asarray(
        sys_.dofmap.bc_values_full[sys_.dofmap.elem_nodedof].T, dtype=dtype)

    Ke, Fe_src = element_fn(coords_em)
    A = assemble_matrix(Ke, sys_.pattern)
    b = assemble_rhs(Fe_src + dirichlet_rhs_correction(Ke, ubc_e),
                     sys_.pattern)
    if force_bc is not None and len(force_bc):
        fvec = np.zeros(sys_.dofmap.total_dof, dtype=np.float64)
        rows = sys_.dofmap.node_dof[force_bc[:, 0].astype(np.int64),
                                    force_bc[:, 1].astype(np.int64)]
        keep = rows >= 0
        np.add.at(fvec, rows[keep], force_bc[keep, 2])
        b = b + jnp.asarray(sys_.expand_rhs(fvec), dtype=dtype)

    t1 = time.perf_counter()
    if isinstance(A, DIAMatrix):
        from jax.sharding import NamedSharding, PartitionSpec as P
        vals_s = jax.device_put(
            A.vals, NamedSharding(device_mesh, P(None, "shard")))
        b_s, = shard_arrays(device_mesh, "shard", b)
        x, stats = distributed_cg_solve_dia(
            device_mesh, A.offsets, vals_s, b_s,
            rtol=rtol, maxiter=maxiter)
    else:
        cols_s, vals_s, b_s = shard_arrays(device_mesh, "shard",
                                           A.cols, A.vals, b)
        x, stats = distributed_cg_solve(device_mesh, cols_s, vals_s, b_s,
                                        rtol=rtol, maxiter=maxiter)
    x = jax.block_until_ready(x)
    t_solve = time.perf_counter() - t1

    x_orig = sys_.reduce_solution(np.asarray(x, dtype=np.float64))
    u_full = sys_.dofmap.expand_solution(x_orig)
    return ImplicitResult(
        u_full=u_full,
        u_reduced=jnp.asarray(x_orig),
        stats=jax.tree.map(lambda a: np.asarray(a), stats),
        timings=dict(pattern_s=t_pattern, solve_s=t_solve),
    )
