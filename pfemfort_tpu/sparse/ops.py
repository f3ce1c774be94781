"""Uniform operator interface over the sparse formats."""

from __future__ import annotations

from typing import Callable, Tuple, Union

import jax.numpy as jnp

from pfemfort_tpu.sparse.dia import DIAMatrix, dia_diagonal, spmv_dia
from pfemfort_tpu.sparse.formats import ELLMatrix
from pfemfort_tpu.sparse.spmv import extract_diagonal, spmv_ell

Matrix = Union[DIAMatrix, ELLMatrix]


def operator_and_diag(A: Matrix) -> Tuple[Callable, jnp.ndarray]:
    """(x -> A x, diag(A)) for either sparse format."""
    if isinstance(A, DIAMatrix):
        return (lambda x: spmv_dia(A, x)), dia_diagonal(A)
    return (lambda x: spmv_ell(A, x)), extract_diagonal(A)
