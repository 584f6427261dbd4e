"""Which XLA gather formulation is fastest on TPU at sweep scale? (v2: sum-reduced)"""
import time, numpy as np, jax, jax.numpy as jnp

M, K, D, H, W, C = 40, 2, 12, 60, 80, 256
HW = H * W
P = D * HW
rng = np.random.default_rng(0)
feats = jnp.asarray(rng.standard_normal((M * K, HW, C)), jnp.float32)
idx = jnp.asarray(rng.integers(0, HW, (M * K, P)), jnp.int32)

def timeit(name, f, *args):
    r = f(*args); print(name, "warm value:", float(np.asarray(r)), flush=True)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter(); v = float(np.asarray(f(*args))); ts.append(time.perf_counter()-t0)
    print(f"{name}: {min(ts)*1000:.1f} ms", flush=True)

@jax.jit
def vmapped_take(feats, idx):
    g = jax.vmap(lambda f, i: jnp.take(f, i, axis=0))(feats, idx)
    return jnp.sum(g)

@jax.jit
def flat_take(feats, idx):
    flat = feats.reshape(M * K * HW, C)
    offs = (jnp.arange(M * K) * HW)[:, None]
    g = jnp.take(flat, (idx + offs).reshape(-1), axis=0)
    return jnp.sum(g)

@jax.jit
def take_along(feats, idx):
    g = jnp.take_along_axis(feats, idx[..., None], axis=1)
    return jnp.sum(g)

@jax.jit
def onehot_matmul(feats, idx):
    oh = jax.nn.one_hot(idx.reshape(M*K, D, HW), HW, dtype=jnp.bfloat16)
    g = jnp.einsum("mdpq,mqc->mdpc", oh, feats.astype(jnp.bfloat16))
    return jnp.sum(g.astype(jnp.float32))

@jax.jit
def dynamic_slice_rows(feats, idx):
    # gather via 8-row aligned dynamic slices? just measure plain sum as control
    return jnp.sum(feats) + jnp.sum(idx)

timeit("control sum only", dynamic_slice_rows, feats, idx)
timeit("vmapped take (current)", vmapped_take, feats, idx)
timeit("flat single take", flat_take, feats, idx)
timeit("take_along_axis", take_along, feats, idx)
timeit("one-hot matmul bf16", onehot_matmul, feats, idx)
print("ALLDONE", flush=True)
