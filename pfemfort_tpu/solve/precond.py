"""Preconditioners beyond scalar Jacobi.

The reference's PETSc defaults are block-Jacobi with one ILU block per MPI
rank (/root/reference/src/solverpetsc.F:206) and plain ILU for the serial
drivers (triapoissonserialimpl1.F:696).  ILU's sequential triangular solves
are the opposite of what a TPU wants; the TPU-native substitutes are:

  * point-block Jacobi — nodal (ndof x ndof) blocks with closed-form
    inverses (captures elasticity's inter-component coupling);
  * CHEBYSHEV polynomial preconditioning — z = p_k(D^{-1}A) D^{-1} r, a
    fixed-degree polynomial of the Jacobi-scaled operator: k extra SpMVs
    per application, zero sequential dependencies, SPD-preserving, and the
    standard smoothed-iteration answer to "ILU-class strength without
    triangular solves" on wide-vector hardware.  This is the preconditioner
    for genuinely unstructured meshes where geometric multigrid does not
    apply.
"""

from __future__ import annotations

from typing import Callable, Tuple, Union

import jax.numpy as jnp
import numpy as np

from pfemfort_tpu.sparse.dia import DIAMatrix
from pfemfort_tpu.sparse.formats import ELLMatrix


def _block_diag_from_dia(A: DIAMatrix, bs: int) -> jnp.ndarray:
    """Extract nodal blocks (bs, bs, N/bs) from a DIA matrix.

    Entry (r, r+o) belongs to a diagonal block iff r//bs == (r+o)//bs; only
    offsets with |o| < bs can contribute.
    """
    n = A.n_rows
    bs_ = bs
    nb = n // bs_
    assert nb * bs_ == n, "n_rows must be divisible by block size"
    blocks = jnp.zeros((bs_, bs_, nb), dtype=A.vals.dtype)
    # Row r = rm + k*bs sits in block k at local row rm; entry with offset o
    # stays in the block iff 0 <= rm + o < bs — a STATIC condition per
    # (o, rm), so extraction is pure strided slicing.
    for d, o in enumerate(A.offsets):
        if abs(o) >= bs_:
            continue
        for rm in range(bs_):
            cm = rm + o
            if 0 <= cm < bs_:
                blocks = blocks.at[rm, cm].add(A.vals[d, rm::bs_])
    return blocks


def _inv_blocks(Bk: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of (bs, bs, nb) blocks for bs in {1, 2, 3}."""
    bs = Bk.shape[0]
    if bs == 1:
        return jnp.where(Bk != 0, 1.0 / Bk, 1.0)
    if bs == 2:
        a, b = Bk[0, 0], Bk[0, 1]
        c, d = Bk[1, 0], Bk[1, 1]
        det = a * d - b * c
        det = jnp.where(det != 0, det, 1.0)
        return jnp.stack([
            jnp.stack([d, -b]), jnp.stack([-c, a])]) / det
    if bs == 3:
        a = Bk[0, 0]; b = Bk[0, 1]; c = Bk[0, 2]
        d = Bk[1, 0]; e = Bk[1, 1]; f = Bk[1, 2]
        g = Bk[2, 0]; h = Bk[2, 1]; i = Bk[2, 2]
        A_ = e * i - f * h
        B_ = -(d * i - f * g)
        C_ = d * h - e * g
        det = a * A_ + b * B_ + c * C_
        det = jnp.where(det != 0, det, 1.0)
        return jnp.stack([
            jnp.stack([A_, -(b * i - c * h), (b * f - c * e)]),
            jnp.stack([B_, (a * i - c * g), -(a * f - c * d)]),
            jnp.stack([C_, -(a * h - b * g), (a * e - b * d)]),
        ]) / det
    raise ValueError(f"block size {bs} not supported (use 1, 2 or 3)")


def block_jacobi_preconditioner(A: Union[DIAMatrix, ELLMatrix],
                                block_size: int) -> Callable:
    """z = blockdiag(A)^{-1} r with nodal (ndof x ndof) blocks.

    Requires n_rows divisible by block_size (reduced systems of vector
    problems with per-node BC elimination may break nodal alignment — caller
    should fall back to scalar Jacobi in that case).
    """
    if isinstance(A, ELLMatrix):
        # build blocks from ELL: entry (r, c) in-block iff same node
        n = A.n_rows
        bs = block_size
        nb = n // bs
        rows = jnp.arange(n)[:, None]
        inblk = (A.cols // bs) == (rows // bs)
        valid = A.cols < A.n_cols
        cmod = jnp.where(inblk & valid, A.cols % bs, bs)  # bs = dropped
        contrib = jnp.where(inblk & valid, A.vals, 0.0)
        blocks = jnp.zeros((bs, bs, nb), dtype=A.vals.dtype)
        for rm in range(bs):
            for cm in range(bs):
                mask = (cmod[rm::bs] == cm)
                blocks = blocks.at[rm, cm].set(
                    jnp.sum(jnp.where(mask, contrib[rm::bs], 0.0), axis=1))
    else:
        blocks = _block_diag_from_dia(A, block_size)
    inv = _inv_blocks(blocks)
    bs = block_size

    def apply(r):
        rb = r.reshape(-1, bs).T                     # (bs, nb)
        zb = sum(inv[:, d, :] * rb[d][None, :] for d in range(bs))
        return zb.T.reshape(-1)

    return apply


def estimate_lmax_jacobi(operator: Callable, diag: jnp.ndarray,
                         iters: int = 12) -> jnp.ndarray:
    """Largest eigenvalue of D^{-1}A by power iteration (traced, jit-safe).

    Deterministic start vector; `iters` SpMVs once per solve setup."""
    import jax

    dinv = jnp.where(diag != 0, 1.0 / diag, 1.0)
    n = diag.shape[0]
    v0 = jnp.sin(jnp.arange(n, dtype=diag.dtype) + 1.0)
    v0 = v0 / jnp.linalg.norm(v0)

    def body(i, carry):
        v, lam = carry
        w = dinv * operator(v)
        nw = jnp.linalg.norm(w)
        return (w / jnp.where(nw > 0, nw, 1.0), nw)

    _, lam = jax.lax.fori_loop(0, iters, body, (v0, jnp.array(1.0,
                                                              diag.dtype)))
    return lam


def chebyshev_preconditioner(operator: Callable, diag: jnp.ndarray,
                             lmax=None, lmin=None,
                             degree: int = 3) -> Callable:
    """z = p_k(D^{-1}A) D^{-1} r: Chebyshev polynomial of the Jacobi-scaled
    operator over [lmin, lmax].

    Fixed linear SPD operator (safe inside CG); `degree` SpMVs per
    application.  Default bounds: lmax from power iteration * 1.05,
    lmin = lmax / 30 (the standard smoother convention — clustering the
    high end is what helps CG).
    """
    dinv = jnp.where(diag != 0, 1.0 / diag, 1.0)
    if lmax is None:
        lmax = estimate_lmax_jacobi(operator, diag) * 1.05
    if lmin is None:
        lmin = lmax / 30.0
    theta = 0.5 * (lmax + lmin)
    delta = 0.5 * (lmax - lmin)
    sigma1 = theta / delta

    def apply(r):
        rd = dinv * r
        z = rd / theta
        d = z
        rho = 1.0 / sigma1
        for _ in range(1, degree):
            rho_new = 1.0 / (2.0 * sigma1 - rho)
            resid = rd - dinv * operator(z)
            d = (rho_new * rho) * d + (2.0 * rho_new / delta) * resid
            z = z + d
            rho = rho_new
        return z

    return apply
