"""Hybrid DIA + slot-gather SpMV — the unstructured kernel, redesigned.

The windowed slot-gather kernel (sparse/slotgather.py) is VPU-ISSUE-bound
on its per-group staging loop (~200 cycles/tile at V=32, ~140 GB/s model —
17% of peak HBM), while the Pallas DIA kernel (sparse/pallas_spmv.py)
streams at ~730 GB/s.  The observation that fixes this: after a
bandwidth-reducing row ordering, most FEM nonzeros sit on a few DENSE
diagonals — on a scrambled generator lattice the geometric-lex ordering
recovers the stencil EXACTLY (every nonzero is on one of ~15 diagonals),
and even genuinely irregular meshes put 30-60% of entries on the main
diagonals.  So split, once per sparsity pattern:

    A  =  A_dia  +  A_rem

  * A_dia: every diagonal whose fill exceeds `fill_threshold` (a diagonal
    costs one N-float stream through the 730 GB/s DIA kernel whether full
    or not; a ~20% fill is the measured break-even against the remainder
    kernel's per-virtual-row issue cost);
  * A_rem: everything else, re-packed into a (much smaller) ELL block and
    run through the slot-gather kernel — its V collapses with the entries
    it no longer stages.

Both parts read the same x; y = y_dia + y_rem.  Values are re-packed from
the assembled (N, K) ELL value array per assembly (one device gather each,
amortized over the solve), so matrix-free re-assembly works unchanged.

Replaces the hot loop of the reference's format-agnostic PETSc MatMult
(/root/reference/src/solverpetsc.F:476) for unstructured meshes.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pfemfort_tpu.sparse.slotgather import (
    PallasSlotGather,
    SlotGatherPlan,
    apply_slotgather,
    apply_slotgather_reference,
    build_slotgather_plan,
    coord_lex_order,
    pack_values,
    permuted_sorted_cols,
    prepare_slotgather,
    rcm_order,
)


# ---------------------------------------------------------------------------
# host-side plan
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class HybridPlan:
    """Static split of an ELL pattern into dense diagonals + remainder."""
    n_rows: int
    offsets: Tuple[int, ...]       # extracted diagonals (permuted space)
    dia_src: np.ndarray            # (D, n_rows) int64 flat index into the
    #                                UN-permuted (N*K) values, or -1
    sg: Optional[SlotGatherPlan]   # remainder plan (already in permuted
    #                                space; its src indexes N*K directly)
    order: Optional[np.ndarray] = None
    inv_order: Optional[np.ndarray] = None
    nnz_dia: int = 0
    nnz_rem: int = 0

    @property
    def D(self) -> int:
        return len(self.offsets)


def build_hybrid_plan(ell_cols: np.ndarray, n_rows: int,
                      order: Optional[np.ndarray] = None,
                      fill_threshold: float = 0.2,
                      max_d: int = 48,
                      sub: int = 32,
                      sg_v_cap: Optional[int] = None
                      ) -> Optional[HybridPlan]:
    """Split the (ordered) pattern by per-diagonal fill.

    `fill_threshold`: minimum fraction of rows a diagonal must populate to
    be extracted.  Break-even estimate on v5e: one DIA diagonal streams
    N*4 B at ~730 GB/s (~5.5 us/M rows) while a slot-gather virtual row
    costs ~25 us/M rows of issue time, and a diagonal at fill f removes
    ~f virtual rows -> extract when f >~ 0.2.
    """
    N, K = ell_cols.shape
    cols, src_of_slot, inv = permuted_sorted_cols(ell_cols, n_rows, order,
                                                  n_rows)
    rows2d = np.arange(N, dtype=np.int64)[:, None]
    valid = cols < n_rows
    off = np.where(valid, cols - rows2d, 0)
    shift = n_rows - 1
    cnt = np.bincount((off + shift).ravel()[valid.ravel()],
                      minlength=2 * n_rows - 1)

    thresh = max(int(fill_threshold * N), 1)
    cand = np.nonzero(cnt >= thresh)[0]
    if len(cand) > max_d:
        cand = cand[np.argsort(cnt[cand], kind="stable")[::-1][:max_d]]
    offsets = tuple(int(o) for o in np.sort(cand - shift))
    D = len(offsets)

    if D == 0:
        plan = build_slotgather_plan(ell_cols, n_rows, order=order,
                                     sub=sub, v_cap=sg_v_cap)
        if plan is None:          # remainder over the caller's V budget
            return None
        return HybridPlan(n_rows=n_rows, offsets=(),
                          dia_src=np.zeros((0, n_rows), np.int64),
                          sg=plan, order=order, inv_order=plan.inv_order,
                          nnz_dia=0, nnz_rem=int(valid.sum()))

    off2d = np.full(2 * n_rows - 1, -1, dtype=np.int32)
    off2d[np.asarray(offsets, np.int64) + shift] = np.arange(
        D, dtype=np.int32)
    d_idx = np.where(valid, off2d[off + shift], -1)
    in_dia = d_idx >= 0

    dia_src = np.full((D, n_rows), -1, dtype=np.int64)
    rr = np.broadcast_to(rows2d, (N, K))
    dia_src[d_idx[in_dia], rr[in_dia]] = src_of_slot[in_dia]
    nnz_dia = int(in_dia.sum())

    rem = valid & ~in_dia
    nnz_rem = int(rem.sum())
    sg_plan = None
    if nnz_rem:
        k_rem = int(rem.sum(axis=1).max(initial=1))
        rem_cols = np.full((N, k_rem), n_rows, dtype=np.int64)
        rem_src = np.full((N, k_rem), -1, dtype=np.int64)
        within = np.cumsum(rem, axis=1) - 1
        rws, w = rr[rem], within[rem]
        rem_cols[rws, w] = cols[rem]
        rem_src[rws, w] = src_of_slot[rem]
        sg_plan = build_slotgather_plan(rem_cols, n_rows, order=None,
                                        sub=sub, v_cap=sg_v_cap)
        if sg_plan is None:       # remainder over the caller's V budget
            return None
        # compose: sg src indexes the compacted remainder block; remap to
        # the caller's (N, K) value array so ONE pack serves both parts
        ok = sg_plan.src >= 0
        sg_plan.src = np.where(
            ok, rem_src.reshape(-1)[np.clip(sg_plan.src, 0, None)], -1)

    return HybridPlan(n_rows=n_rows, offsets=offsets, dia_src=dia_src,
                      sg=sg_plan, order=order, inv_order=inv,
                      nnz_dia=nnz_dia, nnz_rem=nnz_rem)


def build_best_hybrid(pattern, coords_rows: Optional[np.ndarray] = None,
                      comp: Optional[np.ndarray] = None,
                      sub: int = 32,
                      fill_threshold: float = 0.2,
                      orderings: Tuple[str, ...] = ("lex", "rcm"),
                      ) -> HybridPlan:
    """Build hybrid plans over the candidate orderings and keep the one
    with the least modeled kernel time (D diagonals + 5x-weighted
    remainder virtual rows; the 5x is the measured issue-cost ratio).

    `orderings`: subset of {"lex", "rcm"} — large problems pass ("lex",)
    to skip the second full plan build (lex wins on every near-lattice
    mesh and costs one lexsort instead of a scipy RCM)."""
    cands = []
    if "lex" in orderings and coords_rows is not None:
        cands.append(coord_lex_order(np.asarray(coords_rows), comp))
    if "rcm" in orderings or not cands:
        cands.append(rcm_order(pattern.indptr, pattern.indices,
                               pattern.n_rows))
    plans = [build_hybrid_plan(pattern.ell_cols, pattern.n_rows, order=o,
                               fill_threshold=fill_threshold, sub=sub)
             for o in cands]

    def cost(p: HybridPlan):
        v = p.sg.V if p.sg is not None else 0
        g = p.sg.G if p.sg is not None else 0
        return (p.D + 5 * v, g)

    return min(plans, key=cost)


# ---------------------------------------------------------------------------
# reference executor (numpy; validates the split on CPU)
# ---------------------------------------------------------------------------

def apply_hybrid_reference(plan: HybridPlan, vals: np.ndarray,
                           x: np.ndarray) -> np.ndarray:
    """y = A_p x from the plan arrays alone.  `vals`: UN-permuted (N, K)
    ELL values; `x` lives in the plan's (permuted) row space."""
    flat = np.asarray(vals).reshape(-1)
    y = np.zeros(plan.n_rows, dtype=x.dtype)
    for d, o in enumerate(plan.offsets):
        src = plan.dia_src[d]
        m = src >= 0
        rr = np.nonzero(m)[0]
        cc = rr + o
        y[rr] += flat[src[rr]] * x[cc]
    if plan.sg is not None:
        mask = plan.sg.src >= 0
        valsv = flat[np.clip(plan.sg.src, 0, None)] * mask
        y = y + apply_slotgather_reference(plan.sg, valsv, x).astype(
            y.dtype)
    return y


# ---------------------------------------------------------------------------
# device side
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PallasHybrid:
    """Device-resident hybrid plan (a pytree; pass INTO jit — the index
    planes are tens of MB and must not become jaxpr constants)."""
    dia_src: jax.Array                     # (D, n_rows) int32, -1 empty
    sg: Optional[PallasSlotGather]         # None when the remainder is
    #                                        empty (pure-DIA case)
    offsets: Tuple[int, ...] = dataclasses.field(metadata=dict(static=True))
    n_rows: int = dataclasses.field(metadata=dict(static=True))


def prepare_hybrid(plan: HybridPlan) -> PallasHybrid:
    if plan.dia_src.size and plan.dia_src.max(initial=0) >= 2 ** 31:
        raise ValueError("hybrid plan exceeds int32 source indexing")
    sg = prepare_slotgather(plan.sg) if plan.sg is not None else None
    return PallasHybrid(
        dia_src=jnp.asarray(plan.dia_src.astype(np.int32)),
        sg=sg, offsets=plan.offsets, n_rows=plan.n_rows)


def hybrid_pack(P: PallasHybrid, vals):
    """(N, K) assembled ELL values -> (PallasDIA | None, sg value stream |
    None).  One gather per part per assembly, amortized over the solve.

    The results sit behind an optimization_barrier: callers use them
    inside a CG while_loop, and XLA is willing to fuse the pack's
    pad/gather into the loop body (the round-2 finding that capped the
    DIA SpMV at ~98 GB/s) — the barrier pins the packed streams as
    materialized loop invariants."""
    from pfemfort_tpu.sparse.dia import DIAMatrix
    from pfemfort_tpu.sparse.pallas_spmv import prepare_dia_pallas

    flat = jnp.reshape(vals, (-1,))
    Pd = None
    if P.offsets:
        mask = (P.dia_src >= 0).astype(vals.dtype)
        dia_vals = flat[jnp.clip(P.dia_src, 0, None)] * mask
        Pd = prepare_dia_pallas(DIAMatrix(
            vals=dia_vals, offsets=P.offsets, n_rows=P.n_rows,
            lattice=None))
    sgv = pack_values(P.sg, vals) if P.sg is not None else None
    streams = tuple(a for a in (None if Pd is None else Pd.vals2d, sgv)
                    if a is not None)
    if streams:
        parts = list(jax.lax.optimization_barrier(streams))
        if Pd is not None:
            Pd = dataclasses.replace(Pd, vals2d=parts.pop(0))
        if sgv is not None:
            sgv = parts.pop(0)
    return Pd, sgv


def apply_hybrid(P: PallasHybrid, packed, x: jnp.ndarray) -> jnp.ndarray:
    """y = A_p x (x in the plan's permuted space, length n_rows)."""
    from pfemfort_tpu.sparse.pallas_spmv import apply_dia_pallas

    Pd, sgv = packed
    y = None
    if Pd is not None:
        y = apply_dia_pallas(Pd, x)
    if P.sg is not None:
        ysg = apply_slotgather(P.sg, sgv, x)
        y = ysg if y is None else y + ysg
    if y is None:
        y = jnp.zeros_like(x)
    return y


def hybrid_supported(plan: HybridPlan, max_sg_rows: int = 1 << 21) -> bool:
    """Gate: Pallas available; the slot-gather part (if any) needs x
    VMEM-resident.  A pure-DIA hybrid (empty remainder) has NO row cap —
    the DIA kernel chunks x through VMEM windows at any size."""
    from pfemfort_tpu.sparse.ops import pallas_enabled

    if not pallas_enabled():
        return False
    if plan.sg is not None and plan.n_rows > max_sg_rows:
        return False
    return True
