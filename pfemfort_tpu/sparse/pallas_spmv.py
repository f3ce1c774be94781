"""Pallas TPU kernel for the DIA SpMV.

The XLA version (sparse/dia.py:spmv_dia) re-reads a shifted copy of x from
HBM for every diagonal (D ~ 15 overlapping streams) and lays 1-D vectors on
a single sublane, capping it near 1/8 of HBM bandwidth.  This kernel views
the row space as a 2-D (R, 128) array — full (8, 128) f32 tiles — keeps the
(haloed) x resident in VMEM for the whole call, and streams vals in
(D, rb, 128) blocks.  A flat shift by o becomes a sublane-shifted read plus
one circular lane `pltpu.roll` stitched by a select (o = q*128 + r), so all
D shifted FMAs run against VMEM data.  x traffic drops from D*N to ~N,
leaving vals (D*N) as the only irreducible stream — a pure sequential read
of D*N + 2N floats, the shape TPUs run at memory bandwidth.

When x exceeds the VMEM budget the wrapper splits the rows into chunks at
the XLA level (each chunk's x window is a static slice); the extra x
traffic is ~1/D of the vals stream and does not change the bound.

NOTE: manual `make_async_copy` DMA from a pl.ANY/HBM operand crashes the
TPU worker on this runtime — everything here goes through BlockSpec
pipelines and VMEM-resident operands instead.

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


def _kernel(vals_ref, x_ref, y_ref, *, offsets: Tuple[int, ...],
            wrow: int, rb: int):
    i = pl.program_id(0)
    acc = jnp.zeros((rb, LANES), dtype=y_ref.dtype)
    for d, o in enumerate(offsets):
        op = o + wrow * LANES
        qo, ro = op // LANES, op % LANES
        if ro == 0:
            xs = x_ref[pl.ds(i * rb + qo, rb), :]
        else:
            seg = x_ref[pl.ds(i * rb + qo, rb + 1), :]
            # rolled[r, c] = seg[r, (c + ro) % 128]
            rolled = pltpu.roll(seg, LANES - ro, axis=1)
            col = jax.lax.broadcasted_iota(jnp.int32, (rb, LANES), 1)
            xs = jnp.where(col < LANES - ro, rolled[:rb], rolled[1:rb + 1])
        acc = acc + vals_ref[d] * xs
    y_ref[:] = acc


def _core(offsets, wrow: int, rb: int, vals2d, xwin, interpret: bool):
    """vals2d (D, Rc, 128), xwin (Rc + 2*wrow + 1, 128) -> y (Rc, 128)."""
    D, Rc, _ = vals2d.shape
    nblocks = Rc // rb
    return pl.pallas_call(
        functools.partial(_kernel, offsets=offsets, wrow=wrow, rb=rb),
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((D, rb, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # x resident
        ],
        out_specs=pl.BlockSpec((rb, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Rc, LANES), xwin.dtype),
        interpret=interpret,
    )(vals2d, xwin)


def spmv_dia_pallas(A: DIAMatrix, x: jnp.ndarray,
                    block_rows: int = 256,
                    vmem_x_rows: int = 8192,
                    interpret: bool = False) -> jnp.ndarray:
    """y = A x with VMEM-resident x windows and streamed vals blocks."""
    offs = A.offsets
    D = len(offs)
    n = A.n_rows
    w_raw = max(max(offs), -min(offs), 0)
    wrow = w_raw // LANES + 1          # halo rows each side (covers lanes)
    rb = block_rows
    # chunk size: multiple of rb, x window (chunk + 2*wrow + 1 rows) in VMEM
    Rc = max(((vmem_x_rows - 2 * wrow - 1) // rb) * rb, rb)
    R = pl.cdiv(n, LANES)
    nchunks = pl.cdiv(R, Rc)
    Rpad = nchunks * Rc
    npad = Rpad * LANES

    vals = A.vals
    if npad != n:
        vals = jnp.pad(vals, ((0, 0), (0, npad - n)))
    vals2d = vals.reshape(D, Rpad, LANES)
    xpad = jnp.concatenate([
        jnp.zeros((wrow * LANES,), dtype=x.dtype), x,
        jnp.zeros(((wrow + 1) * LANES + npad - n,), dtype=x.dtype)])
    xpad2d = xpad.reshape(-1, LANES)   # (Rpad + 2*wrow + 1, 128)

    if nchunks == 1:
        y = _core(offs, wrow, rb, vals2d, xpad2d, interpret)
        return y.reshape(-1)[:n]

    parts = []
    for c in range(nchunks):
        vals_c = jax.lax.slice_in_dim(vals2d, c * Rc, (c + 1) * Rc, axis=1)
        xwin = jax.lax.slice_in_dim(xpad2d, c * Rc,
                                    (c + 1) * Rc + 2 * wrow + 1, axis=0)
        parts.append(_core(offs, wrow, rb, vals_c, xwin, interpret))
    return jnp.concatenate(parts, axis=0).reshape(-1)[:n]
