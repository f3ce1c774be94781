"""Device-side (SPMD) recursive coordinate bisection — the ParMETIS analog.

The reference's distributed partitioner is ParMETIS_V3_PartMeshKway over MPI
(/root/reference/src/meshpartitionfortparmetis.cpp:393-413): each rank holds
a block of elements and the k-way partition is computed in parallel.  The
TPU-native equivalent is a DATA-PARALLEL RCB in pure jnp: the centroid array
can live sharded over the device mesh, and every step is elementwise math +
reductions, so XLA runs it SPMD with psum-style collectives inserted
automatically — no host gather of the mesh.

Algorithm: level-by-level weighted-median bisection.  All groups at a level
split in ONE vectorized pass: per-group axis extents via masked min/max,
split coordinate via an iterative histogram quantile (3 x 128 bins =
2^21 resolution), proportional fractions to support any n_parts.  The
result matches host RCB's balance within the histogram resolution.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def _group_quantile(x, gid, frac, n_groups, lo, hi, rounds: int = 3,
                    bins: int = 128):
    """Per-group approximate `frac`-quantile of x by iterative histogram
    refinement.  x (n,), gid (n,) int32, frac (n_groups,), lo/hi (n_groups,).
    Returns (n_groups,) split values."""
    n = x.shape[0]
    one = jnp.ones((n,), dtype=jnp.float32)
    total = jax.ops.segment_sum(one, gid, num_segments=n_groups)
    target = frac * total
    for _ in range(rounds):
        width = jnp.maximum(hi - lo, 1e-30)
        # bin of each element within its group's current window; elements
        # outside the window are masked out (their rank is already folded
        # into `target` from earlier rounds)
        t = (x - lo[gid]) / width[gid]
        inside = (t >= 0.0) & (t < 1.0)
        b = jnp.clip((t * bins).astype(jnp.int32), 0, bins - 1)
        hist = jax.ops.segment_sum(
            jnp.where(inside, one, 0.0), gid * bins + b,
            num_segments=n_groups * bins
        ).reshape(n_groups, bins)
        cum = jnp.cumsum(hist, axis=1)
        # first bin where cumulative count reaches the target
        reached = cum >= target[:, None]
        idx = jnp.argmax(reached, axis=1)
        # count below the chosen bin -> refine target within it
        below = jnp.where(idx > 0,
                          jnp.take_along_axis(
                              cum, jnp.maximum(idx - 1, 0)[:, None],
                              axis=1)[:, 0],
                          0.0)
        target = target - below
        lo2 = lo + idx.astype(lo.dtype) * width / bins
        hi2 = lo2 + width / bins
        lo, hi = lo2, hi2
    return 0.5 * (lo + hi)


def rcb_partition_device(centroids: jnp.ndarray, n_parts: int) -> jnp.ndarray:
    """(E, ndim) -> (E,) int32 part ids, computed entirely on device.

    Jit-safe and SPMD: pass `centroids` sharded over a device mesh and XLA
    distributes every reduction.  Supports any n_parts via proportional
    splits (non-power-of-2 handled like parallel/partition.py:rcb_partition).
    """
    E, ndim = centroids.shape
    c = jnp.asarray(centroids, dtype=jnp.float32)

    # host-side (static) tree of group -> (k_total, k_left) per level
    levels = []
    sizes = {0: n_parts}
    while any(k > 1 for k in sizes.values()):
        lvl = {}
        nxt = {}
        for g, k in sizes.items():
            if k <= 1:
                nxt[2 * g] = k
                nxt[2 * g + 1] = 0
                lvl[g] = (k, k)  # no split
                continue
            kl = k // 2
            lvl[g] = (k, kl)
            nxt[2 * g] = kl
            nxt[2 * g + 1] = k - kl
        levels.append(lvl)
        sizes = nxt
    n_levels = len(levels)

    gid = jnp.zeros((E,), dtype=jnp.int32)
    for li, lvl in enumerate(levels):
        n_groups = 1 << li
        fracs = np.ones(n_groups, dtype=np.float32)
        splitmask = np.zeros(n_groups, dtype=np.float32)
        for g in range(n_groups):
            k, kl = lvl.get(g, (1, 1))
            if k > 1:
                fracs[g] = kl / k
                splitmask[g] = 1.0
        fracs_j = jnp.asarray(fracs)
        split_j = jnp.asarray(splitmask)

        # per-group extents per axis
        big = jnp.float32(3e38)
        mins = jnp.stack([
            jax.ops.segment_min(c[:, a], gid, num_segments=n_groups)
            for a in range(ndim)], axis=1)
        maxs = jnp.stack([
            jax.ops.segment_max(c[:, a], gid, num_segments=n_groups)
            for a in range(ndim)], axis=1)
        axis = jnp.argmax(maxs - mins, axis=1)             # (n_groups,)
        xsel = jnp.take_along_axis(c, axis[gid][:, None],
                                   axis=1)[:, 0]           # (E,)
        lo = jnp.take_along_axis(mins, axis[:, None], axis=1)[:, 0]
        hi = jnp.take_along_axis(maxs, axis[:, None], axis=1)[:, 0] + 1e-30
        split = _group_quantile(xsel, gid, fracs_j, n_groups, lo, hi)
        right = (xsel > split[gid]) & (split_j[gid] > 0)
        gid = 2 * gid + right.astype(jnp.int32)

    # leaf group id -> part id (host-side static map)
    leaf_to_part = np.zeros(1 << n_levels, dtype=np.int32)
    part = 0
    for g in sorted(sizes):
        if sizes[g] >= 1:
            leaf_to_part[g] = part
            part += 1
    return jnp.asarray(leaf_to_part)[gid]
