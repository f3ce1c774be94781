"""Pallas TPU kernels for the DIA SpMV.

The XLA version (sparse/dia.py:spmv_dia) re-reads a shifted copy of x from
HBM for every diagonal (D ~ 15 overlapping streams) and lays 1-D vectors on
a single sublane, capping it near 1/8 of HBM bandwidth.  These kernels view
the row space as a 2-D (R, 128) array — full (8, 128) f32 tiles — stream the
vals in (D, Rb, 128) blocks, and DMA each x window into VMEM ONCE.  A flat
shift by o becomes two static 2-D slices stitched with a lane rotate
(o = q*128 + r: rows shift by q, lanes rotate by r), so all D shifted FMAs
run against the VMEM-resident window.  x traffic drops from D*N to ~N,
leaving vals (D*N) as the only irreducible stream — the kernel is then a
pure sequential read of D*N + 2N floats, the shape TPUs run at memory
bandwidth.

Replaces the hot loop of the reference's KSPSolve MatMult
(/root/reference/src/solverpetsc.F:476).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pfemfort_tpu.sparse.dia import DIAMatrix

LANES = 128


def _shifted(xw, qo: int, ro: int, rb: int):
    """Window rows [qo, qo+rb) shifted ro lanes: flat view xw[qo*128+ro :].

    The lane part is one circular `pltpu.roll` + a select between the two
    adjacent row views (Mosaic rejects unaligned lane-dim concatenates)."""
    if ro == 0:
        return xw[qo:qo + rb, :]
    seg = xw[qo:qo + rb + 1, :]                     # (rb+1, 128)
    rolled = pltpu.roll(seg, LANES - ro, axis=1)    # [r, c] = seg[r,(c+ro)%128]
    col = jax.lax.broadcasted_iota(jnp.int32, (rb, LANES), 1)
    return jnp.where(col < LANES - ro, rolled[:rb], rolled[1:rb + 1])


def _kernel2d(vals_ref, xpad_hbm, y_ref, x_scratch, sem,
              *, offsets: Tuple[int, ...], wrow: int, rb: int):
    i = pl.program_id(0)
    dma = pltpu.make_async_copy(
        xpad_hbm.at[pl.ds(i * rb, rb + 2 * wrow + 1), :],
        x_scratch,
        sem,
    )
    dma.start()
    dma.wait()
    xw = x_scratch[:]
    acc = jnp.zeros((rb, LANES), dtype=y_ref.dtype)
    for d, o in enumerate(offsets):
        op = o + wrow * LANES
        qo, ro = op // LANES, op % LANES
        acc = acc + vals_ref[d] * _shifted(xw, qo, ro, rb)
    y_ref[:] = acc


def spmv_dia_pallas(A: DIAMatrix, x: jnp.ndarray,
                    block_rows: int = 1024,
                    interpret: bool = False) -> jnp.ndarray:
    """y = A x with 2-D tiling and a single VMEM x window per row block."""
    offs = A.offsets
    D = len(offs)
    n = A.n_rows
    w_raw = max(max(offs), -min(offs), 0)
    wrow = w_raw // LANES + 1          # halo rows each side (covers lane part)
    R = pl.cdiv(n, LANES)
    rb = min(block_rows, R)
    nblocks = pl.cdiv(R, rb)
    Rpad = nblocks * rb
    npad = Rpad * LANES

    vals = A.vals
    if npad != n:
        vals = jnp.pad(vals, ((0, 0), (0, npad - n)))
    vals = vals.reshape(D, Rpad, LANES)
    xpad = jnp.concatenate([
        jnp.zeros((wrow * LANES,), dtype=x.dtype), x,
        jnp.zeros(((wrow + 1) * LANES + npad - n,), dtype=x.dtype)])
    xpad = xpad.reshape(-1, LANES)

    y = pl.pallas_call(
        functools.partial(_kernel2d, offsets=offs, wrow=wrow, rb=rb),
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((D, rb, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((rb, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Rpad, LANES), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((rb + 2 * wrow + 1, LANES), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(vals, xpad)
    return y.reshape(-1)[:n]
