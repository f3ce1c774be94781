"""Pallas TPU kernel for the DIA SpMV.

The XLA version (sparse/dia.py:spmv_dia) re-reads a shifted copy of x from
HBM for every diagonal (D ~ 15 overlapping streams) and lays 1-D vectors on
a single sublane, capping it near 1/8 of HBM bandwidth.  This kernel views
the row space as a 2-D (R, 128) array — full (8, 128) f32 tiles — and runs
ONE pallas_call over a (chunk, block) grid:

  * vals stream through the BlockSpec pipeline in (D, rb, 128) blocks,
    indexed globally (no XLA-level slicing — a sliced operand would
    materialize a full copy of the 15N-float vals array and double the
    traffic, which measurement showed dominates);
  * x is pre-duplicated ONCE into non-overlapping per-chunk windows
    (chunk + halo rows; the duplication costs ~N + nchunks*halo floats,
    ~1/D of the vals stream) and each window sits VMEM-resident for all the
    row blocks of its chunk;
  * a flat shift by o = q*128 + r becomes a sublane-shifted read plus one
    circular lane `pltpu.roll` stitched by a select.

x traffic drops from D*N to ~2N, leaving vals (D*N) as the only irreducible
stream — a sequential read of (D+3)N floats, the shape TPUs run at memory
bandwidth.

NOTE: manual `make_async_copy` DMA from a pl.ANY/HBM operand crashes the
TPU worker on this runtime — everything here goes through BlockSpec
pipelines and VMEM-resident operands instead.

Replaces the hot loop of the reference's KSPSolve MatMult
(/root/reference/src/solverpetsc.F:476).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pfemfort_tpu.sparse.dia import DIAMatrix

LANES = 128


def _kernel(vals_ref, x_ref, y_ref, *, offsets: Tuple[int, ...],
            wrow: int, rb: int):
    i = pl.program_id(1)
    acc = jnp.zeros((rb, LANES), dtype=y_ref.dtype)
    for d, o in enumerate(offsets):
        op = o + wrow * LANES
        qo, ro = op // LANES, op % LANES
        if ro == 0:
            xs = x_ref[0, pl.ds(i * rb + qo, rb), :]
        else:
            seg = x_ref[0, pl.ds(i * rb + qo, rb + 1), :]
            # rolled[r, c] = seg[r, (c + ro) % 128]
            rolled = pltpu.roll(seg, LANES - ro, axis=1)
            col = jax.lax.broadcasted_iota(jnp.int32, (rb, LANES), 1)
            xs = jnp.where(col < LANES - ro, rolled[:rb], rolled[1:rb + 1])
        acc = acc + vals_ref[d] * xs
    y_ref[:] = acc


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PallasDIA:
    """Pre-padded, (D, Rpad, 128)-shaped DIA values + static kernel geometry.

    Building this ONCE per solve matters: the zero-pad of `vals` to the chunk
    grid is a full HBM copy of the D*N value stream; done inside the operator
    closure it re-executes EVERY CG iteration (XLA does not hoist the big
    loop-invariant pad out of the while-loop), measured to cap the SpMV at
    ~98 GB/s at N=7.9M vs ~660 GB/s with the pad hoisted here.
    """
    vals2d: jax.Array           # (D, Rpad, LANES)
    offsets: Tuple[int, ...] = dataclasses.field(metadata=dict(static=True))
    n: int = dataclasses.field(metadata=dict(static=True))
    wrow: int = dataclasses.field(metadata=dict(static=True))
    rb: int = dataclasses.field(metadata=dict(static=True))
    Rc: int = dataclasses.field(metadata=dict(static=True))
    nchunks: int = dataclasses.field(metadata=dict(static=True))
    interpret: bool = dataclasses.field(metadata=dict(static=True))


def _fit_block_rows(D: int, block_rows: int) -> int:
    """Row-block size that keeps the streamed (D, rb, 128) vals block
    within the TPU's scoped-VMEM limit (16 MB; double-buffered, so budget
    ~4 MB per block).  D <= 128 keeps the default 256; wide extractions
    (the AMG coarse operators pull hundreds of diagonals) shrink rb."""
    cap = (4 * (1 << 20)) // max(D * LANES * 4, 1)
    return max(8, min(block_rows, (cap // 8) * 8))


def prepare_dia_pallas(A: DIAMatrix,
                       block_rows: int = 256,
                       vmem_x_rows: int = 2048,
                       interpret: bool = False) -> PallasDIA:
    """Pad + reshape the DIA values once (one streamed copy, amortized over
    every subsequent `apply_dia_pallas` call)."""
    offs = A.offsets
    D = len(offs)
    n = A.n_rows
    w_raw = max(max(offs), -min(offs), 0)
    wrow = w_raw // LANES + 1          # halo rows each side (covers lanes)
    rb = _fit_block_rows(D, block_rows)
    # chunk size: multiple of rb, x window (chunk + 2*wrow + 1 rows) in VMEM
    Rc = max(((vmem_x_rows - 2 * wrow - 1) // rb) * rb, rb)
    R = pl.cdiv(n, LANES)
    nchunks = pl.cdiv(R, Rc)
    Rpad = nchunks * Rc
    npad = Rpad * LANES

    vals = A.vals
    if npad != n:
        vals = jnp.pad(vals, ((0, 0), (0, npad - n)))
    return PallasDIA(vals2d=vals.reshape(D, Rpad, LANES),
                     offsets=offs, n=n, wrow=wrow, rb=rb, Rc=Rc,
                     nchunks=nchunks, interpret=interpret)


def prepare_dia_pallas_np(vals_np, offsets, n_rows: int,
                          block_rows: int = 256,
                          vmem_x_rows: int = 2048,
                          dtype=None) -> PallasDIA:
    """Host-side (numpy) variant of `prepare_dia_pallas` for STATIC value
    blocks (preconditioner matrices): the pad/reshape happens in numpy and
    only the finished plane ships to the device.  Building with eager jnp
    ops costs one remote-tunnel compile PER OP — measured ~10 s per tiny
    preconditioner block on the axon backend."""
    import numpy as _np

    offs = tuple(int(o) for o in offsets)
    D = len(offs)
    n = int(n_rows)
    w_raw = max(max(offs), -min(offs), 0)
    wrow = w_raw // LANES + 1
    rb = _fit_block_rows(D, block_rows)
    Rc = max(((vmem_x_rows - 2 * wrow - 1) // rb) * rb, rb)
    R = -(-n // LANES)
    nchunks = -(-R // Rc)
    Rpad = nchunks * Rc
    npad = Rpad * LANES
    v = _np.asarray(vals_np)
    if dtype is not None:
        v = v.astype(dtype)
    if npad != n:
        v = _np.pad(v, ((0, 0), (0, npad - n)))
    return PallasDIA(vals2d=jnp.asarray(v.reshape(D, Rpad, LANES)),
                     offsets=offs, n=n, wrow=wrow, rb=rb, Rc=Rc,
                     nchunks=nchunks, interpret=False)


def apply_dia_pallas(P: PallasDIA, x: jnp.ndarray) -> jnp.ndarray:
    """y = A x with VMEM-resident x chunk windows and streamed vals blocks."""
    n = P.n
    wrow = P.wrow
    npad = P.nchunks * P.Rc * LANES
    xpad = jnp.concatenate([
        jnp.zeros((wrow * LANES,), dtype=x.dtype), x,
        jnp.zeros(((wrow + 1) * LANES + npad - n,), dtype=x.dtype)])
    return _apply_dia_pallas_padded(P, xpad)


def apply_dia_pallas_halo(P: PallasDIA, x_l: jnp.ndarray,
                          left: jnp.ndarray,
                          right: jnp.ndarray) -> jnp.ndarray:
    """y_l = A_l [left | x_l | right]: the halo-exchange form of the kernel
    for row-sharded DIA (parallel/halo.py) — identical compute, with the
    ring-neighbor halo values taking the place of the zero pad.

    left/right are the (w,) halo vectors with w <= wrow*LANES."""
    w = left.shape[0]
    n = P.n
    wrow = P.wrow
    npad = P.nchunks * P.Rc * LANES
    assert w <= wrow * LANES
    xpad = jnp.concatenate([
        jnp.zeros((wrow * LANES - w,), dtype=x_l.dtype), left, x_l, right,
        jnp.zeros(((wrow + 1) * LANES + npad - n - w,), dtype=x_l.dtype)])
    return _apply_dia_pallas_padded(P, xpad)


def _apply_dia_pallas_padded(P: PallasDIA, xpad: jnp.ndarray) -> jnp.ndarray:
    D = len(P.offsets)
    n, wrow, rb, Rc, nchunks = P.n, P.wrow, P.rb, P.Rc, P.nchunks
    Rpad = nchunks * Rc
    bpc = Rc // rb                     # blocks per chunk
    Rcw = Rc + 2 * wrow + 1            # window rows per chunk

    xpad2d = xpad.reshape(-1, LANES)   # (Rpad + 2*wrow + 1, 128)
    # non-overlapping window copies: (nchunks, Rcw, 128)
    xwins = jnp.stack([
        jax.lax.slice_in_dim(xpad2d, c * Rc, c * Rc + Rcw, axis=0)
        for c in range(nchunks)])

    y = pl.pallas_call(
        functools.partial(_kernel, offsets=P.offsets, wrow=wrow, rb=rb),
        grid=(nchunks, bpc),
        in_specs=[
            pl.BlockSpec((D, rb, LANES), lambda c, i: (0, c * bpc + i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Rcw, LANES), lambda c, i: (c, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rb, LANES), lambda c, i: (c * bpc + i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Rpad, LANES), xpad.dtype),
        interpret=P.interpret,
    )(P.vals2d, xwins)
    return y.reshape(-1)[:n]


def spmv_dia_pallas(A: DIAMatrix, x: jnp.ndarray,
                    block_rows: int = 256,
                    vmem_x_rows: int = 2048,
                    interpret: bool = False) -> jnp.ndarray:
    """One-shot y = A x (pads vals per call — for repeated products over the
    same matrix, `prepare_dia_pallas` + `apply_dia_pallas` skips the pad)."""
    return apply_dia_pallas(
        prepare_dia_pallas(A, block_rows, vmem_x_rows, interpret), x)
