"""Breakdown timing of the sweep/costreg components on TPU (one-off)."""
import time, numpy as np, jax, jax.numpy as jnp
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench_inputs import build_inputs, N_VIEWS, N_PLANES, HEIGHT, WIDTH, CHANNELS, SWEEP_CHUNK
from mvsdet_tpu.geometry.voxels import depth_plane_values
from mvsdet_tpu.models.cost_reg import CostRegNet
from mvsdet_tpu.ops.plane_sweep import plane_sweep_variance_for_refs

rng = np.random.default_rng(0)
feats, proj44, neighbor_ids = build_inputs(rng)
depths = depth_plane_values(0.2, 5.0, N_PLANES)
net = CostRegNet(in_channels=CHANNELS, dtype=jnp.bfloat16)
variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1,N_PLANES,HEIGHT,WIDTH,CHANNELS), jnp.bfloat16))

def timeit(name, f, *args):
    from mvsdet_tpu.utils.profiling import hard_sync

    hard_sync(f(*args))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter(); hard_sync(f(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {min(ts)*1000:.1f} ms", flush=True)

@jax.jit
def sweep_fp32(feats, proj44, neighbor_ids):
    outs = []
    for start in range(0, N_VIEWS, SWEEP_CHUNK):
        ref_ids = jnp.arange(start, start+SWEEP_CHUNK)
        var = plane_sweep_variance_for_refs(feats.astype(jnp.float32), proj44, ref_ids, neighbor_ids[ref_ids], depths)
        outs.append(jnp.sum(var))
    return jnp.stack(outs)

@jax.jit
def sweep_bf16(feats, proj44, neighbor_ids):
    outs = []
    for start in range(0, N_VIEWS, SWEEP_CHUNK):
        ref_ids = jnp.arange(start, start+SWEEP_CHUNK)
        var = plane_sweep_variance_for_refs(feats, proj44, ref_ids, neighbor_ids[ref_ids], depths)
        outs.append(jnp.sum(var))
    return jnp.stack(outs)

@jax.jit
def costreg_all(x):
    outs = []
    for _ in range(N_VIEWS // SWEEP_CHUNK):
        out = net.apply(variables, x)
        outs.append(jnp.sum(out))
    return jnp.stack(outs)

x = jnp.asarray(rng.standard_normal((SWEEP_CHUNK, N_PLANES, HEIGHT, WIDTH, CHANNELS)), jnp.bfloat16)
timeit("sweep fp32 (40 views)", sweep_fp32, feats, proj44, neighbor_ids)
timeit("sweep bf16 (40 views)", sweep_bf16, feats, proj44, neighbor_ids)
timeit("costreg x5 chunks (40 views)", costreg_all, x)
print("DONE", flush=True)
