"""Benchmark harness: prints one JSON line for the driver.

Headline metric: SpMV throughput (nnz/s) on the flagship 3D tet Poisson
system — the hot loop of the reference's KSPSolve (SURVEY §6 / BASELINE.md).
Also measures assembly throughput (elems/s), a full f32 CG solve, and the
mixed-precision refined solve to the reference's 1e-8 double-precision
target.

vs_baseline: the reference publishes no numbers (BASELINE.json published={}),
so the baseline is an estimate of PETSc MPIAIJ SpMV on one modern CPU socket:
~12 bytes of traffic per nnz at ~12 GB/s effective memory bandwidth
=> ~1.0e9 nnz/s.  vs_baseline = measured / 1.0e9.
"""

import json
import sys
import time


def _log(msg):
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def _sync(*arrays):
    """Force completion: scalar readback (block_until_ready is unreliable
    on the axon remote platform — it can return before execution)."""
    import jax.numpy as jnp
    return [float(jnp.sum(a)) for a in arrays]

import numpy as np

BASELINE_NNZ_PER_S = 1.0e9


def main():
    import jax

    jax.config.update("jax_enable_x64", True)  # for the f64 refinement outer
    # Persistent compile cache: the axon remote-compile tunnel costs minutes
    # per kernel; cached reruns skip it entirely.
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from pfemfort_tpu.assembly.assemble import (
        assemble_matrix,
        assemble_rhs,
        dirichlet_rhs_correction,
    )
    from pfemfort_tpu.assembly.pattern import build_pattern
    from pfemfort_tpu.dofs.dofmap import build_dofmap, reduced_lattice
    from pfemfort_tpu.elements.geometry import to_element_minor
    from pfemfort_tpu.elements.poisson import poisson_element_matrices
    from pfemfort_tpu.mesh import generate
    from pfemfort_tpu.solve.cg import cg_solve, jacobi_preconditioner
    from pfemfort_tpu.solve.refine import cg_with_refinement
    from pfemfort_tpu.sparse.ops import operator_and_diag

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    dtype = jnp.float32

    t_host0 = time.perf_counter()
    mesh, dbc = generate.box_tet(0, 1, n, 0, 1, n, 0, 1, n)
    dofmap = build_dofmap(mesh, 1, dbc)
    pattern = build_pattern(dofmap.elem_dof, dofmap.total_dof,
                            lattice=reduced_lattice(mesh, dofmap))
    t_host = time.perf_counter() - t_host0
    _log(f"host setup {t_host:.1f}s, E={mesh.n_elem}, N={dofmap.total_dof}, layout={pattern.layout}")

    coords_e = jnp.asarray(to_element_minor(mesh.elem_coords()),
                           dtype=dtype)
    ubc_e = jnp.asarray(dofmap.bc_values_full[dofmap.elem_nodedof].T,
                        dtype=dtype)

    @jax.jit
    def assemble(coords_e, ubc_e):
        Ke, Fe_src = poisson_element_matrices(coords_e, "tetra4",
                                              source=-6.0)
        A = assemble_matrix(Ke, pattern)
        b = assemble_rhs(Fe_src + dirichlet_rhs_correction(Ke, ubc_e),
                         pattern)
        return A, b

    # --- assembly throughput ---
    t0 = time.perf_counter()
    A, b = assemble(coords_e, ubc_e)  # compile+warm
    _sync(A.vals, b)
    _log(f"assemble compile+run {time.perf_counter()-t0:.1f}s")
    t_asm = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        A, b = assemble(coords_e, ubc_e)
        _sync(A.vals, b)
        t_asm = min(t_asm, time.perf_counter() - t0)
    elems_per_s = mesh.n_elem / t_asm
    _log(f"assembly {t_asm*1e3:.0f}ms -> {elems_per_s/1e6:.1f}M elems/s")

    # nnz of the assembled operator (count nonzero DIA slots on device)
    if pattern.layout == "dia":
        nnz = int(jnp.sum(A.vals != 0))
    else:
        nnz = pattern.nnz

    # --- SpMV throughput ---
    x = jnp.ones((dofmap.total_dof,), dtype=dtype)

    @jax.jit
    def spmv_chain(A_vals, x, iters=50):
        op, _ = operator_and_diag(A._replace(vals=A_vals))

        def body(i, x):
            y = op(x)
            return y / (jnp.max(jnp.abs(y)) + 1e-30)
        return jax.lax.fori_loop(0, iters, body, x)

    t0 = time.perf_counter()
    y = jax.block_until_ready(spmv_chain(A.vals, x))
    _log(f"spmv compile {time.perf_counter()-t0:.1f}s")
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        y = spmv_chain(A.vals, x)
    jax.block_until_ready(y)
    t_spmv = (time.perf_counter() - t0) / (reps * 50)
    nnz_per_s = nnz / t_spmv
    _log(f"spmv {t_spmv*1e6:.0f}us -> {nnz_per_s/1e9:.2f} Gnnz/s")

    # --- Pallas DIA SpMV kernel (x window DMA'd to VMEM once per block) ---
    pallas_nnz_per_s = 0.0
    if pattern.layout == "dia":
        try:
            from pfemfort_tpu.sparse.pallas_spmv import spmv_dia_pallas

            @jax.jit
            def pspmv_chain(A_vals, x, iters=50):
                Am = A._replace(vals=A_vals)

                def body(i, x):
                    y = spmv_dia_pallas(Am, x)
                    return y / (jnp.max(jnp.abs(y)) + 1e-30)
                return jax.lax.fori_loop(0, iters, body, x)

            yp = pspmv_chain(A.vals, x)
            _sync(yp)
            err = float(jnp.max(jnp.abs(
                spmv_dia_pallas(A._replace(vals=A.vals), x)
                - spmv_chain(A.vals, x, 1))))
            t0 = time.perf_counter()
            for _ in range(reps):
                yp = pspmv_chain(A.vals, x)
            _sync(yp)
            t_p = (time.perf_counter() - t0) / (reps * 50)
            pallas_nnz_per_s = nnz / t_p
            _log(f"pallas spmv {t_p*1e6:.0f}us -> "
                 f"{pallas_nnz_per_s/1e9:.2f} Gnnz/s")
        except Exception as ex:  # keep bench robust if Mosaic rejects
            _log(f"pallas spmv unavailable: {type(ex).__name__}: "
                 f"{str(ex)[:120]}")
    nnz_per_s = max(nnz_per_s, pallas_nnz_per_s)

    # --- structured slice-add assembly (the scatter-free fast path the
    # generated box meshes unlock; full-system rows) ---
    structured_elems_per_s = 0.0
    if mesh.structure is not None:
        from pfemfort_tpu.assembly.structured import (
            assemble_dia_structured, build_structured_plan)
        from pfemfort_tpu.elements.geometry import to_element_minor as _em

        plan = build_structured_plan(n, n, n)

        @jax.jit
        def assemble_structured(coords_e):
            Ke, _ = poisson_element_matrices(coords_e, "tetra4",
                                             source=-6.0)
            return assemble_dia_structured(Ke, plan)

        t0 = time.perf_counter()
        As = assemble_structured(coords_e)
        _sync(As.vals)
        _log(f"structured assemble compile+run {time.perf_counter()-t0:.1f}s")
        t_s = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            As = assemble_structured(coords_e)
            _sync(As.vals)
            t_s = min(t_s, time.perf_counter() - t0)
        structured_elems_per_s = mesh.n_elem / t_s
        _log(f"structured assembly {t_s*1e3:.0f}ms -> "
             f"{structured_elems_per_s/1e6:.1f}M elems/s")
        del As

    # --- full f32 CG solve ---
    @jax.jit
    def solve(A_vals, b):
        op, diag = operator_and_diag(A._replace(vals=A_vals))
        return cg_solve(op, b,
                        precond=jacobi_preconditioner(diag),
                        rtol=1e-6, maxiter=5000)
    t0 = time.perf_counter()
    u, stats = solve(A.vals, b)
    _sync(u)
    _log(f"cg compile+run {time.perf_counter()-t0:.1f}s")
    t0 = time.perf_counter()
    u, stats = solve(A.vals, b)
    _sync(u)
    t_solve = time.perf_counter() - t0
    _log(f"cg f32 {t_solve:.2f}s, {int(np.asarray(stats.iters))} iters")

    # --- geometric-multigrid CG on the full-node lattice system (the
    # PC=hypre analog; solve/multigrid.py) ---
    mg_iters, mg_solve_s = -1, float("inf")
    if mesh.structure is not None:
        from pfemfort_tpu.assembly.fullsystem import zero_dirichlet_rows
        from pfemfort_tpu.assembly.structured import (
            assemble_rhs_structured, build_structured_plan)
        from pfemfort_tpu.dofs.dofmap import build_dofmap as _bd
        from pfemfort_tpu.solve.multigrid import (
            build_gmg, gmg_preconditioner)

        element_fn = lambda c: poisson_element_matrices(
            c, "tetra4", source=-6.0)
        bc_mask_np = ~dofmap.free_mask_full()
        t0 = time.perf_counter()
        mg = build_gmg(mesh, 1, bc_mask_np, element_fn, dtype=dtype)
        plan_mg = build_structured_plan(n, n, n)
        bc_mask_j = jnp.asarray(bc_mask_np)
        bc_vals_j = jnp.asarray(dofmap.bc_values_full, dtype=dtype)
        _log(f"mg setup {time.perf_counter()-t0:.1f}s "
             f"({len(mg[0].mats)} levels)")

        @jax.jit
        def solve_mg(coords_e, mg_arrays):
            Ke, Fe_src = poisson_element_matrices(coords_e, "tetra4",
                                                  source=-6.0)
            from pfemfort_tpu.assembly.structured import (
                assemble_dia_structured)
            Af = assemble_dia_structured(Ke, plan_mg)
            bf = assemble_rhs_structured(Fe_src, plan_mg)
            Af, bf = zero_dirichlet_rows(Af, bf, bc_mask_j, bc_vals_j)
            opf, _ = operator_and_diag(Af)
            x0 = jnp.where(bc_mask_j, bc_vals_j, 0.0)
            return cg_solve(opf, bf, x0=x0,
                            precond=gmg_preconditioner(mg_arrays, mg[1]),
                            rtol=1e-6, maxiter=100)

        t0 = time.perf_counter()
        umg, mstats = solve_mg(coords_e, mg[0])
        _sync(umg)
        _log(f"mg-cg compile+run {time.perf_counter()-t0:.1f}s")
        t0 = time.perf_counter()
        umg, mstats = solve_mg(coords_e, mg[0])
        _sync(umg)
        mg_solve_s = time.perf_counter() - t0
        mg_iters = int(np.asarray(mstats.iters))
        err_mg = float(jnp.max(jnp.abs(
            umg - jnp.asarray((mesh.coords ** 2).sum(axis=1), dtype=dtype))))
        _log(f"mg-cg f32 {mg_solve_s:.2f}s, {mg_iters} iters, "
             f"nodal err {err_mg:.1e}")
        del umg

    # --- mixed-precision refined solve to 1e-8 (true f64 residual) ---
    coords64 = jnp.asarray(to_element_minor(mesh.elem_coords()),
                           dtype=jnp.float64)
    ubc64 = jnp.asarray(dofmap.bc_values_full[dofmap.elem_nodedof].T,
                        dtype=jnp.float64)
    A64, b64 = assemble(coords64, ubc64)
    op64, _ = operator_and_diag(A64)
    op32, diag32 = operator_and_diag(A)
    t0 = time.perf_counter()
    x64, rstats = cg_with_refinement(
        op64, op32, b64,
        precond32=jacobi_preconditioner(diag32),
        rtol=1e-8, inner_rtol=1e-5)
    _sync(x64)
    t_refine = time.perf_counter() - t0
    _log(f"refined solve {t_refine:.1f}s")
    u_exact = (mesh.coords ** 2).sum(axis=1)
    u_full = dofmap.expand_solution(np.asarray(x64))
    nodal_err = float(np.abs(u_full - u_exact).max())

    result = {
        "metric": "spmv_nnz_per_s",
        "value": float(nnz_per_s),
        "unit": "nnz/s",
        "vs_baseline": float(nnz_per_s / BASELINE_NNZ_PER_S),
        "detail": {
            "mesh": f"tet {n}x{n}x{n}x6 = {mesh.n_elem} elems",
            "n_dof": int(dofmap.total_dof),
            "nnz": int(nnz),
            "layout": pattern.layout,
            "dia_offsets": pattern.n_offsets,
            "host_setup_s": float(t_host),
            "assembly_elems_per_s": float(elems_per_s),
            "structured_assembly_elems_per_s": float(structured_elems_per_s),
            "assembly_s": float(t_asm),
            "spmv_s": float(t_spmv),
            "spmv_pallas_nnz_per_s": float(pallas_nnz_per_s),
            "cg_f32_iters": int(np.asarray(stats.iters)),
            "cg_f32_relres": float(np.asarray(stats.relres)),
            "cg_f32_solve_s": float(t_solve),
            "mg_cg_iters": mg_iters,
            "mg_cg_solve_s": float(mg_solve_s),
            "refined_inner_iters": int(rstats.total_inner_iters),
            "refined_outer_iters": int(rstats.outer_iters),
            "refined_relres_f64": float(rstats.relres),
            "refined_solve_s": float(t_refine),
            "nodal_err_vs_exact": nodal_err,
            "dtype": "float32 (+f64 refinement)",
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
