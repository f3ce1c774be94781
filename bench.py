"""Benchmark harness: prints one JSON line for the driver.

Headline metric: SpMV throughput (nnz/s) on the flagship 3D tet Poisson
system — the hot loop of the reference's KSPSolve (SURVEY §6 / BASELINE.md).
Also measures assembly throughput (elems/s) and runs a full CG solve.

vs_baseline: the reference publishes no numbers (BASELINE.json published={}),
so the baseline is an estimate of PETSc MPIAIJ SpMV on one modern CPU socket:
~12 bytes of traffic per nnz at ~12 GB/s effective memory bandwidth
=> ~1.0e9 nnz/s.  vs_baseline = measured / 1.0e9.
"""

import json
import sys
import time

import numpy as np

BASELINE_NNZ_PER_S = 1.0e9


def main():
    import jax
    import jax.numpy as jnp

    from pfemfort_tpu.assembly.assemble import (
        assemble_ell_values,
        assemble_rhs,
        dirichlet_rhs_correction,
    )
    from pfemfort_tpu.assembly.pattern import build_pattern
    from pfemfort_tpu.dofs.dofmap import build_dofmap
    from pfemfort_tpu.elements.poisson import poisson_element_matrices
    from pfemfort_tpu.mesh import generate
    from pfemfort_tpu.solve.cg import cg_solve, jacobi_preconditioner
    from pfemfort_tpu.sparse.dia import dia_diagonal, ell_to_dia, spmv_dia
    from pfemfort_tpu.sparse.spmv import extract_diagonal, spmv_ell

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 72
    dtype = jnp.float32

    mesh, dbc = generate.box_tet(0, 1, n, 0, 1, n, 0, 1, n)
    dofmap = build_dofmap(mesh, 1, dbc)
    pattern = build_pattern(dofmap.elem_dof, dofmap.total_dof)

    coords_e = jnp.asarray(mesh.elem_coords(), dtype=dtype)
    ubc_e = jnp.asarray(dofmap.bc_values_full[dofmap.elem_nodedof],
                        dtype=dtype)
    ell_cols = jnp.asarray(pattern.ell_cols)

    @jax.jit
    def assemble(coords_e, ubc_e):
        Ke, Fe_src = poisson_element_matrices(coords_e, "tetra4")
        A = assemble_ell_values(Ke, pattern, ell_cols)
        b = assemble_rhs(Fe_src + dirichlet_rhs_correction(Ke, ubc_e),
                         pattern)
        return A, b

    # --- assembly throughput ---
    A, b = jax.block_until_ready(assemble(coords_e, ubc_e))  # compile+warm
    t0 = time.perf_counter()
    reps_a = 3
    for _ in range(reps_a):
        A, b = assemble(coords_e, ubc_e)
    jax.block_until_ready((A, b))
    t_asm = (time.perf_counter() - t0) / reps_a
    elems_per_s = mesh.n_elem / t_asm

    # --- SpMV throughput (DIA fast path when the pattern qualifies) ---
    nnz = pattern.nnz
    x = jnp.ones((dofmap.total_dof,), dtype=dtype)
    use_dia = pattern.dia is not None

    def make_op(A_vals):
        if use_dia:
            Ad = ell_to_dia(pattern.dia, A_vals)
            return (lambda v: spmv_dia(Ad, v)), dia_diagonal(Ad)
        Am = A._replace(vals=A_vals)
        return (lambda v: spmv_ell(Am, v)), extract_diagonal(Am)

    @jax.jit
    def spmv_chain(A_vals, x, iters=50):
        op, _ = make_op(A_vals)

        def body(i, x):
            y = op(x)
            return y / (jnp.max(jnp.abs(y)) + 1e-30)
        return jax.lax.fori_loop(0, iters, body, x)

    y = jax.block_until_ready(spmv_chain(A.vals, x))
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        y = spmv_chain(A.vals, x)
    jax.block_until_ready(y)
    t_spmv = (time.perf_counter() - t0) / (reps * 50)
    nnz_per_s = nnz / t_spmv

    # --- full CG solve ---
    @jax.jit
    def solve(A_vals, b):
        op, diag = make_op(A_vals)
        return cg_solve(op, b,
                        precond=jacobi_preconditioner(diag),
                        rtol=1e-6, maxiter=2000)
    u, stats = jax.block_until_ready(solve(A.vals, b))
    t0 = time.perf_counter()
    u, stats = jax.block_until_ready(solve(A.vals, b))
    t_solve = time.perf_counter() - t0

    result = {
        "metric": "spmv_nnz_per_s",
        "value": float(nnz_per_s),
        "unit": "nnz/s",
        "vs_baseline": float(nnz_per_s / BASELINE_NNZ_PER_S),
        "detail": {
            "mesh": f"tet {n}x{n}x{n}x6 = {mesh.n_elem} elems",
            "n_dof": int(dofmap.total_dof),
            "nnz": int(nnz),
            "ell_k": int(pattern.ell_k),
            "spmv_format": "dia" if use_dia else "ell",
            "dia_offsets": len(pattern.dia.offsets) if use_dia else 0,
            "assembly_elems_per_s": float(elems_per_s),
            "assembly_s": float(t_asm),
            "spmv_s": float(t_spmv),
            "cg_iters": int(np.asarray(stats.iters)),
            "cg_relres": float(np.asarray(stats.relres)),
            "cg_solve_s": float(t_solve),
            "dtype": "float32",
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
