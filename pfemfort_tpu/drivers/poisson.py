"""Poisson drivers: the TPU equivalents of triapoissonserialimpl1/2/3,
triapoissonparallelimpl1/2 and tetrapoissonparallelimpl1."""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from pfemfort_tpu.drivers.common import (
    ImplicitResult,
    solve_implicit,
    solve_implicit_fullsystem,
)
from pfemfort_tpu.elements.poisson import poisson_element_matrices
from pfemfort_tpu.mesh.core import Mesh

# The reference drivers hard-code the source term: 0 for the 2D problems
# (elementutilitiespoisson.F:83) and -6 for the 3D manufactured solution
# u = x^2+y^2+z^2 (elementutilitiespoisson.F:172).
_DEFAULT_SOURCE = {"tetra4": -6.0}


def solve_poisson(
    mesh: Mesh,
    dirichlet: np.ndarray,
    kappa: Optional[Sequence[float]] = None,
    source=None,
    af: float = 1.0,
    dtype=None,
    rtol: float = 1e-8,
    maxiter: Optional[int] = None,
    method: str = "cg",
    bc_mode: str = "reduced",
    refine: bool = False,
) -> ImplicitResult:
    """Solve -div(kappa grad u) = source with Dirichlet BCs.

    Matches the reference drivers' defaults: kappa = 1 per axis, source 0
    (2D) / -6 (tetra4), CG + (block-)Jacobi to relative tolerance.

    bc_mode: 'reduced' eliminates BC dofs from the system (impl1/impl2
    semantics); 'full' keeps the full-size system with MatZeroRows identity
    rows (impl3 semantics, triapoissonserialimpl3.F:557-558).
    refine: mixed-precision f32-inner/f64-outer iterative refinement.
    """
    if source is None:
        source = _DEFAULT_SOURCE.get(mesh.etype, 0.0)

    def element_fn(coords_e):
        return poisson_element_matrices(
            coords_e, mesh.etype, kappa=kappa, af=af, source=source)

    if bc_mode == "full":
        return solve_implicit_fullsystem(
            mesh, 1, dirichlet, element_fn,
            dtype=dtype, rtol=rtol, maxiter=maxiter, method=method)
    return solve_implicit(
        mesh, 1, dirichlet, element_fn,
        dtype=dtype, rtol=rtol, maxiter=maxiter, method=method,
        refine=refine)
