"""Worker process for the two-process multihost smoke test.

Launched by tests/test_multihost_smoke.py with MVSDET_COORDINATOR /
MVSDET_NUM_PROCESSES / MVSDET_PROCESS_ID set (the reference's
dist_train.sh NNODES/MASTER_ADDR path, SURVEY §2c).  Each process owns
one virtual CPU device, joins the distributed runtime, builds the
global ('data'=2, 'view'=1) mesh, feeds its own local scene, and takes
ONE lock-step sharded train step.  Prints a single MHOK line with the
pmean'd loss and a parameter fingerprint; the parent asserts both
processes print identical values (grad all-reduce ran).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    import numpy as np

    from mvsdet_tpu.parallel import multihost

    multihost.initialize()
    assert jax.process_count() == 2, jax.process_count()
    pid = jax.process_index()

    import jax.numpy as jnp

    from mvsdet_tpu.config import tiny_test_config
    from mvsdet_tpu.data.synthetic import make_synthetic_scene
    from mvsdet_tpu.parallel.sharding import (batch_pspecs,
                                              make_sharded_train_step)
    from mvsdet_tpu.training.loop import create_train_state

    cfg = tiny_test_config()
    # each host contributes a DIFFERENT scene (its own data-axis row)
    scene = make_synthetic_scene(cfg, seed=100 + pid, n_views=4, n_targets=2)
    local = {k: np.asarray(v)[None] for k, v in scene.items()}

    example = {k: jnp.asarray(v) for k, v in scene.items()}
    model, state, tx = create_train_state(
        cfg, jax.random.PRNGKey(0), example, sweep_chunk=2)

    mesh = multihost.make_global_mesh(data=2, view=1)
    example_g = {k: jnp.stack([example[k]] * 2) for k in example}
    step_fn = make_sharded_train_step(model, tx, mesh, example_g)
    specs = batch_pspecs(example_g)
    gbatch = multihost.host_local_batch_to_global(local, mesh, specs)

    state, metrics = step_fn(state, gbatch)
    loss = float(jax.device_get(metrics["loss"]))
    fp = float(sum(
        jnp.sum(jnp.abs(leaf.astype(jnp.float32)))
        for leaf in jax.tree_util.tree_leaves(state.params)))
    print(f"MHOK pid={pid} loss={loss:.6f} fp={fp:.4f}", flush=True)


if __name__ == "__main__":
    main()
