"""Pallas TPU kernel for the DIA SpMV.

The XLA version (sparse/dia.py:spmv_dia) re-reads a shifted copy of x from
HBM for every diagonal (D ~ 15 overlapping streams).  This kernel tiles the
rows, DMAs each x window (block + 2W halo) into VMEM ONCE, and performs all
D shifted multiply-adds against the VMEM-resident window — x traffic drops
from D*N to ~N, leaving vals (D*N) as the only irreducible stream.

Grid: one program per row block.  vals arrives pre-blocked through the
BlockSpec pipeline; the x window is fetched with an explicit async DMA
because overlapping windows cannot be expressed as a BlockSpec tiling.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pfemfort_tpu.sparse.dia import DIAMatrix


def _kernel(vals_ref, xpad_hbm, y_ref, x_scratch, sem,
            *, offsets: Tuple[int, ...], w: int, block: int):
    i = pl.program_id(0)
    dma = pltpu.make_async_copy(
        xpad_hbm.at[pl.ds(i * block, block + 2 * w)],
        x_scratch,
        sem,
    )
    dma.start()
    dma.wait()
    acc = jnp.zeros((block,), dtype=y_ref.dtype)
    for d, o in enumerate(offsets):
        acc = acc + vals_ref[d, :] * x_scratch[pl.ds(w + o, block)]
    y_ref[:] = acc


def spmv_dia_pallas(A: DIAMatrix, x: jnp.ndarray,
                    block: int = 65536,
                    interpret: bool = False) -> jnp.ndarray:
    """y = A x with a single VMEM-resident x window per row block."""
    offs = A.offsets
    D = len(offs)
    n = A.n_rows
    w_raw = max(max(offs), -min(offs), 0)
    # Mosaic tiles 1-D f32 arrays at 1024 elements: the x-window DMA length
    # (block + 2w) and start (i*block) must both be 1024-aligned.
    w = ((w_raw + 511) // 512) * 512
    block = min(block, ((n + 1023) // 1024) * 1024)
    # VMEM budget: vals block D*block + window (block + 2w) floats
    nblocks = pl.cdiv(n, block)
    npad = nblocks * block

    vals = A.vals
    if npad != n:
        vals = jnp.pad(vals, ((0, 0), (0, npad - n)))
    xpad = jnp.concatenate([
        jnp.zeros((w,), dtype=x.dtype), x,
        jnp.zeros((w + npad - n,), dtype=x.dtype)])

    y = pl.pallas_call(
        functools.partial(_kernel, offsets=offs, w=w, block=block),
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((D, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((block,), lambda i: (i,),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((npad,), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((block + 2 * w,), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(vals, xpad)
    return y[:n]
