"""Uniform operator interface over the sparse formats."""

from __future__ import annotations

from typing import Callable, Tuple, Union

import jax
import jax.numpy as jnp

from pfemfort_tpu.sparse.dia import DIAMatrix, dia_diagonal, spmv_dia
from pfemfort_tpu.sparse.formats import ELLMatrix
from pfemfort_tpu.sparse.spmv import extract_diagonal, spmv_ell

Matrix = Union[DIAMatrix, ELLMatrix]


def pallas_enabled() -> bool:
    """Global Pallas routing gate: real TPU backend AND the debug escape
    hatch PFEMFORT_NO_PALLAS is unset (ADVICE r4: the Pallas-in-shard_map
    paths cannot be exercised by CPU CI, so on-chip debugging needs a way
    to force the portable XLA forms everywhere)."""
    import os

    if os.environ.get("PFEMFORT_NO_PALLAS"):
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _use_pallas(A: DIAMatrix) -> bool:
    """Route the DIA SpMV through the Pallas kernel on real TPU backends
    (2.5x+ the XLA stencil's bandwidth; sparse/pallas_spmv.py).  CPU (tests)
    and other backends keep the portable XLA path."""
    return (pallas_enabled() and A.vals.dtype == jnp.float32
            and A.n_rows >= 1 << 14)


def dia_operator(A: DIAMatrix) -> Callable:
    """x -> A x with the fastest available backend-specific kernel.

    Call this OUTSIDE any iteration loop: on TPU it pre-pads the value
    stream for the Pallas kernel once (a full D*N HBM copy that must not
    re-run per SpMV)."""
    if _use_pallas(A):
        from pfemfort_tpu.sparse.pallas_spmv import (
            apply_dia_pallas, prepare_dia_pallas)
        P = prepare_dia_pallas(A)
        return lambda x: apply_dia_pallas(P, x)
    return lambda x: spmv_dia(A, x)


def operator_and_diag(A: Matrix) -> Tuple[Callable, jnp.ndarray]:
    """(x -> A x, diag(A)) for either sparse format."""
    if isinstance(A, DIAMatrix):
        return dia_operator(A), dia_diagonal(A)
    return (lambda x: spmv_ell(A, x)), extract_diagonal(A)
