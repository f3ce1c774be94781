"""Mixed-precision iterative refinement: f32 CG inner, f64 residual outer.

The reference runs fully in double precision and targets 1e-8 relative
residuals (solverpetsc.F / PETSc defaults).  TPU f64 is software-emulated and
slow, so the TPU-native strategy (SURVEY §7 'Hard parts') is:
  * inner solves in f32 (full-speed MXU/VPU/HBM),
  * outer residual r = b - A x in f64 (emulated, but once per outer cycle),
  * accumulate the solution in f64.
Classical iterative refinement converges to f64-level residuals as long as
CG contracts the error by more than the f32 rounding floor each cycle.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pfemfort_tpu.solve.cg import SolveStats, cg_solve


class RefineStats(NamedTuple):
    outer_iters: int
    total_inner_iters: int
    relres: float          # final f64 relative residual
    converged: bool


def cg_with_refinement(
    op64: Callable,       # x(f64) -> A x in f64
    op32: Callable,       # x(f32) -> A x in f32
    b64: jnp.ndarray,
    precond32: Optional[Callable] = None,
    rtol: float = 1e-8,
    inner_rtol: float = 1e-5,
    max_outer: int = 20,
    inner_maxiter: int = 10_000,
    x0: Optional[jnp.ndarray] = None,
):
    """Solve A x = b to f64 relative residual `rtol` with f32 inner CG.

    `x0`: optional f64 initial guess (the full-system BC-carrying start);
    inner corrections then live on the zero-BC subspace."""
    b64 = b64.astype(jnp.float64)
    bnorm = float(jnp.linalg.norm(b64))
    if bnorm == 0.0:
        return jnp.zeros_like(b64), RefineStats(0, 0, 0.0, True)

    inner = jax.jit(lambda r32: cg_solve(
        op32, r32, precond=precond32, rtol=inner_rtol,
        maxiter=inner_maxiter))
    resid = jax.jit(lambda x64: b64 - op64(x64))

    if x0 is None:
        x64 = jnp.zeros_like(b64)
        r64 = b64
    else:
        x64 = x0.astype(jnp.float64)
        r64 = resid(x64)
    total_inner = 0
    relres = 1.0
    for outer in range(max_outer):
        relres = float(jnp.linalg.norm(r64)) / bnorm
        if relres <= rtol:
            return x64, RefineStats(outer, total_inner, relres, True)
        # scale the residual so the f32 inner solve sees O(1) magnitudes
        scale = float(jnp.max(jnp.abs(r64)))
        scale = scale if scale > 0 else 1.0
        d32, st = inner((r64 / scale).astype(jnp.float32))
        total_inner += int(np.asarray(st.iters))
        x64 = x64 + scale * d32.astype(jnp.float64)
        r64 = resid(x64)
    relres = float(jnp.linalg.norm(r64)) / bnorm
    return x64, RefineStats(max_outer, total_inner, relres, relres <= rtol)
