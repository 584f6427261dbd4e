"""Time the MXU two-pass sweep vs gather sweep on TPU."""
import time, numpy as np, jax, jax.numpy as jnp
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench_inputs import build_inputs, N_VIEWS, N_PLANES, SWEEP_CHUNK, HEIGHT, WIDTH, CHANNELS
from mvsdet_tpu.geometry.voxels import depth_plane_values
from mvsdet_tpu.models.cost_reg import CostRegNet
from mvsdet_tpu.ops.plane_sweep_mxu import plane_sweep_variance_mxu

rng = np.random.default_rng(0)
feats, proj44, neighbor_ids = build_inputs(rng)
depths = depth_plane_values(0.2, 5.0, N_PLANES)
net = CostRegNet(in_channels=CHANNELS, dtype=jnp.bfloat16)
variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1,N_PLANES,HEIGHT,WIDTH,CHANNELS), jnp.bfloat16))

def timeit(name, f, *args):
    r = f(*args); print(name, "warm:", float(np.asarray(r)), flush=True)
    ts=[]
    for _ in range(5):
        t0=time.perf_counter(); v=float(np.asarray(f(*args))); ts.append(time.perf_counter()-t0)
    print(f"{name}: {min(ts)*1000:.1f} ms", flush=True)

@jax.jit
def mxu_sweep_only(feats, proj44, neighbor_ids):
    outs = []
    for start in range(0, N_VIEWS, SWEEP_CHUNK):
        ref_ids = jnp.arange(start, start+SWEEP_CHUNK)
        var = plane_sweep_variance_mxu(feats.astype(jnp.float32), proj44, ref_ids, neighbor_ids[ref_ids], depths)
        outs.append(jnp.sum(var))
    return jnp.stack(outs).sum()

@jax.jit
def mxu_sweep_bf16(feats, proj44, neighbor_ids):
    outs = []
    for start in range(0, N_VIEWS, SWEEP_CHUNK):
        ref_ids = jnp.arange(start, start+SWEEP_CHUNK)
        var = plane_sweep_variance_mxu(feats, proj44, ref_ids, neighbor_ids[ref_ids], depths, compute_dtype=jnp.bfloat16)
        outs.append(jnp.sum(var.astype(jnp.float32)))
    return jnp.stack(outs).sum()

@jax.jit
def mxu_full(feats, proj44, neighbor_ids):
    outs = []
    for start in range(0, N_VIEWS, SWEEP_CHUNK):
        ref_ids = jnp.arange(start, start+SWEEP_CHUNK)
        var = plane_sweep_variance_mxu(feats, proj44, ref_ids, neighbor_ids[ref_ids], depths, compute_dtype=jnp.bfloat16)
        out = net.apply(variables, var.astype(jnp.bfloat16))
        outs.append(jnp.sum(out.astype(jnp.float32)))
    return jnp.stack(outs).sum()

timeit("mxu sweep fp32 (40 views)", mxu_sweep_only, feats, proj44, neighbor_ids)
timeit("mxu sweep bf16 (40 views)", mxu_sweep_bf16, feats, proj44, neighbor_ids)
timeit("mxu sweep+costreg bf16 (40 views)", mxu_full, feats, proj44, neighbor_ids)
print("ALLDONE", flush=True)
