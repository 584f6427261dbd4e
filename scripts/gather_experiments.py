"""Which XLA gather formulation is fastest on TPU at sweep scale?"""
import time, numpy as np, jax, jax.numpy as jnp

M, K, D, H, W, C = 40, 2, 12, 60, 80, 256
HW = H * W
P = D * HW  # samples per (ref, nei) map
rng = np.random.default_rng(0)
feats = jnp.asarray(rng.standard_normal((M * K, HW, C)), jnp.float32)
idx = jnp.asarray(rng.integers(0, HW, (M * K, P)), jnp.int32)

def timeit(name, f, *args):
    r = jax.block_until_ready(f(*args))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter(); jax.block_until_ready(f(*args)); ts.append(time.perf_counter()-t0)
    print(f"{name}: {min(ts)*1000:.1f} ms", flush=True)

@jax.jit
def vmapped_take(feats, idx):
    return jax.vmap(lambda f, i: jnp.take(f, i, axis=0))(feats, idx)

@jax.jit
def flat_take(feats, idx):
    flat = feats.reshape(M * K * HW, C)
    offs = (jnp.arange(M * K) * HW)[:, None]
    return jnp.take(flat, (idx + offs).reshape(-1), axis=0).reshape(M * K, P, C)

@jax.jit
def onehot_matmul(feats, idx):
    # per (map, plane): (HW out, HW in) @ (HW, C)
    oh = jax.nn.one_hot(idx.reshape(M*K, D, HW), HW, dtype=jnp.bfloat16)
    return jnp.einsum("mdpq,mqc->mdpc", oh, feats.astype(jnp.bfloat16))

@jax.jit
def take_along(feats, idx):
    return jnp.take_along_axis(feats, idx[..., None], axis=1)

timeit("vmapped take (current)", vmapped_take, feats, idx)
timeit("flat single take", flat_take, feats, idx)
timeit("take_along_axis", take_along, feats, idx)
timeit("one-hot matmul bf16", onehot_matmul, feats, idx)
print("DONE", flush=True)
