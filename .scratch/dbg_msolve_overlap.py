import os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
from functools import partial as _partial
from jax.sharding import PartitionSpec as P

from cuda_mat_tpu.models.problems import grid_laplacian
from cuda_mat_tpu.parallel.mesh import make_mesh
from cuda_mat_tpu.ops.pallas_stencil import (
    const_factor_terms, extend_gapmask, msolve_halo, neumann_poly_terms,
    strided_offsets, plan_const_neumann_layout)
from cuda_mat_tpu.parallel.dist_solver import (_make_local_msolve_kernel,
                                               _to_carry)
from cuda_mat_tpu.parallel.partition import RowPartitionedStencil
from cuda_mat_tpu.precond.preconditioners import neumann_factors

grid = grid_laplacian(64, 126)
rng = np.random.default_rng(0)
ndev = 4
mesh = make_mesh(ndev)
axis = mesh.axis_names[0]
part = RowPartitionedStencil.from_matrix(grid, ndev)
plan = plan_const_neumann_layout(part.terms, 3, part.c_grid, part.stride,
                                 prefer_mono=True)
if plan[0] > part.sub or part.block > plan[1]:
    part = RowPartitionedStencil.from_matrix(grid, ndev, min_sub=plan[0],
                                             block_target=plan[1])
low, up, diag_m = neumann_factors(grid)
sts = []
for f in (low, up):
    t, _ = const_factor_terms(f.to_dia(max_diags=128), part.c_grid,
                              part.stride)
    pt = neumann_poly_terms(t, 3, part.c_grid, part.stride)
    sts.append(strided_offsets(pt, part.c_grid, part.stride))
hpad = msolve_halo(sts[1])
s, blk = part.shard_rows, part.block
print("s", s, "blk", blk, "sub", part.sub, "hpad", hpad,
      "lo_l", min(o for o,_ in sts[0]), "hi_l", max(o for o,_ in sts[0]),
      "lo_u", min(o for o,_ in sts[1]), "hi_u", max(o for o,_ in sts[1]))
sh = jax.sharding.NamedSharding(mesh, P(axis))
gap_ext = jax.device_put(
    jnp.asarray(extend_gapmask(part.gapmask, hpad), jnp.float64),
    jax.sharding.NamedSharding(mesh, P()))
invd_g = np.concatenate([np.ones(blk),
                         part.strided_scatter(1.0 / diag_m, fill=1.0),
                         np.ones(blk)])
d_pad = np.stack([invd_g[i * s: i * s + s + 2 * blk]
                  for i in range(ndev)]).reshape(-1)
d_pad = jax.device_put(jnp.asarray(d_pad, jnp.float64), sh)
x = jax.device_put(jnp.asarray(_to_carry(
    part.pad_vector(rng.standard_normal(grid.n)), ndev, s, blk)), sh)
out = []
for overlap in (False, True):
    ms = _make_local_msolve_kernel(part, axis, interpret=True,
                                   terms_l=sts[0], terms_u=sts[1],
                                   overlap=overlap)
    f = jax.jit(_partial(jax.shard_map, mesh=mesh,
                         in_specs=(P(), P(axis), P(axis)),
                         out_specs=P(axis), check_vma=False)(ms))
    out.append(np.asarray(f(gap_ext, d_pad, x)))
a, b = out
diff = a != b
per = diff.reshape(ndev, s + 2 * blk)
for i in range(ndev):
    idx = np.nonzero(per[i])[0]
    if idx.size:
        loc = idx - blk   # local row
        print(f"shard {i}: {idx.size} mismatches, local rows "
              f"{loc.min()}..{loc.max()}",
              "sample", loc[:10], "maxabs", np.abs(a-b).max())

wl, wr = 256, 256
for i in range(ndev):
    idx = np.nonzero(per[i])[0] - blk
    inl = (idx < wl).sum(); inr = (idx >= s - wr).sum()
    mid = ((idx >= wl) & (idx < s - wr)).sum()
    print(f"shard {i}: left {inl}, interior {mid}, right {inr}")

# hypothesis: FMA/fusion differences across programs. Re-run the SAME
# scatter form under a program with a dummy extra op appended.
ms = _make_local_msolve_kernel(part, axis, interpret=True,
                               terms_l=sts[0], terms_u=sts[1], overlap=False)
base_f = jax.jit(_partial(jax.shard_map, mesh=mesh,
                          in_specs=(P(), P(axis), P(axis)),
                          out_specs=P(axis), check_vma=False)(ms))
def ms2(g, d, xx):
    y = ms(g, d, xx)
    return y + 0.0 * jnp.sum(xx[:8])
pert_f = jax.jit(_partial(jax.shard_map, mesh=mesh,
                          in_specs=(P(), P(axis), P(axis)),
                          out_specs=P(axis), check_vma=False)(ms2))
y1 = np.asarray(base_f(gap_ext, d_pad, x))
y2 = np.asarray(pert_f(gap_ext, d_pad, x))
print("same-program-perturbed mismatches:", int((y1 != y2).sum()))
