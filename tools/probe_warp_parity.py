import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from partseg_tpu.augment.tps import TPSSampler
from partseg_tpu.partops.pallas import tps_warp_fused

sampler = TPSSampler(grid_size=5)
params = sampler.sample(jax.random.key(1), 4)
basis = sampler.flow_basis(128, 128)

lin = jnp.linspace(0, 1, 128)
yy, xx = jnp.meshgrid(lin, lin, indexing="ij")
smooth = jnp.stack([yy, xx, yy * xx], -1)
smooth = jnp.broadcast_to(smooth[None], (4, 128, 128, 3))
ws = np.asarray(sampler.warp(params, smooth, impl="gather"))
fs = np.asarray(tps_warp_fused(smooth, params.weights, basis))
err = np.abs(ws - fs)
print("smooth: max", err.max(), "mean", err.mean(), flush=True)
bad = np.argwhere(err == err.max())[0]
print("worst at (b,y,x,c):", bad, flush=True)
inner = err[:, 2:-2, 2:-2, :]
print("interior max:", inner.max(), "interior mean:", inner.mean(), flush=True)
col_prof = err.max(axis=(0, 1, 3))
row_prof = err.max(axis=(0, 2, 3))
print("row max profile (first/last 5):", row_prof[:5], row_prof[-5:], flush=True)
print("col max profile (first/last 5):", col_prof[:5], col_prof[-5:], flush=True)

# also: explicit-flow fused kernel vs gather (isolates the in-kernel TPS)
from partseg_tpu.partops.warp import warp_image
flow = sampler.flow_field(params, 128, 128)
wf = np.asarray(warp_image(smooth, flow, impl="fused"))
e2 = np.abs(np.asarray(ws) - wf)
print("explicit-flow fused vs gather: max", e2.max(), "mean", e2.mean(), flush=True)
