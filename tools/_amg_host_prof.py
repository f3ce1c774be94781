import sys; sys.path.insert(0, "/root/repo")
import time, numpy as np
import jax; jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from pfemfort_tpu.assembly.pattern import build_pattern
from pfemfort_tpu.assembly.assemble import assemble_matrix
from pfemfort_tpu.dofs.dofmap import build_dofmap
from pfemfort_tpu.elements.geometry import to_element_minor
from pfemfort_tpu.elements.poisson import poisson_element_matrices
from pfemfort_tpu.mesh import generate
from pfemfort_tpu.solve.ic0 import _csr_from_matrix
from pfemfort_tpu.solve.amg import build_samg
from pfemfort_tpu.solve.amg_device import permute_csr, build_samg_device
from pfemfort_tpu.sparse import hybrid as hyb

n = 48
t0=time.perf_counter()
mesh, dbc = generate.box_tet(0,1,n,0,1,n,0,1,n)
perm = np.random.default_rng(0).permutation(mesh.n_node)
mesh = mesh.renumbered(perm.astype(np.int64)); dbc = dbc.copy()
dbc[:,0] = perm[dbc[:,0].astype(np.int64)]
dofmap = build_dofmap(mesh, 1, dbc)
pattern = build_pattern(dofmap.elem_dof, dofmap.total_dof, layout="ell")
print(f"pattern {time.perf_counter()-t0:.1f}s", flush=True)
t0=time.perf_counter()
hplan = hyb.build_best_hybrid(pattern, coords_rows=mesh.coords[dofmap.assy_for_soln])
print(f"hybrid plan {time.perf_counter()-t0:.1f}s D={hplan.D} rem={hplan.sg}", flush=True)
coords_em = jnp.asarray(to_element_minor(mesh.elem_coords()), dtype=jnp.float32)
Ke, _ = jax.jit(lambda c: poisson_element_matrices(c, "tetra4", source=-6.0))(coords_em)
A = jax.jit(lambda k: assemble_matrix(k, pattern))(Ke)
t0=time.perf_counter()
indptr, indices, vals_h, n0 = _csr_from_matrix(A, pattern)
print(f"csr {time.perf_counter()-t0:.1f}s n0={n0}", flush=True)
t0=time.perf_counter()
indptr, indices, vals_h = permute_csr(indptr, indices, vals_h, hplan.order)
print(f"permute {time.perf_counter()-t0:.1f}s", flush=True)
t0=time.perf_counter()
built = build_samg(indptr, indices, vals_h, n0, ndof=1, dtype=jnp.float32)
arrs, meta = built
print(f"build_samg {time.perf_counter()-t0:.1f}s sizes={meta.sizes}", flush=True)
import pfemfort_tpu.sparse.ops as ops
ops.pallas_enabled = lambda: True     # force plan building on CPU for timing
t0=time.perf_counter()
dev = build_samg_device(arrs, meta.sizes, dtype=jnp.float32, external_fine_op=True)
print(f"build_samg_device {time.perf_counter()-t0:.1f}s kinds={[d.kind for d in dev.p0 + dev.p0t]}", flush=True)
