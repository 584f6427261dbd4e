"""shard_map training step: data x view parallel.

Replaces the reference's `MMDistributedDataParallel` gradient
all-reduce (SURVEY §2c) with explicit ICI collectives inside a
`shard_map` over the ('data', 'view') mesh:

  - scenes shard over 'data'; per-scene source views shard over 'view'
  - the model all_gathers feature maps over 'view' for the neighbour
    pool, psums the lifted voxel volume, and pmeans the positive count
  - gradients pmean over BOTH axes (every device holds a full replica
    of the parameters)

Batch layout: every array carries a leading scene axis of size
``mesh.shape['data']``; view-indexed arrays (images, denorm_images,
depth) additionally shard their second axis over 'view'.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from mvsdet_tpu.models.mvsdet import MVSDet
from mvsdet_tpu.training.loop import TrainState

# arrays whose axis 1 is the view axis
VIEW_SHARDED_KEYS = ("images", "denorm_images", "depth")


def batch_pspecs(batch: Dict[str, jnp.ndarray]) -> Dict[str, P]:
    """PartitionSpecs for a leading-scene-axis batch dict."""
    specs = {}
    for k in batch:
        if k in VIEW_SHARDED_KEYS:
            specs[k] = P("data", "view")
        else:
            specs[k] = P("data")
    return specs


def shard_batch(batch: Dict[str, jnp.ndarray], mesh: Mesh):
    """Place a host batch onto the mesh with the canonical specs."""
    specs = batch_pspecs(batch)
    return {
        k: jax.device_put(v, jax.sharding.NamedSharding(mesh, specs[k]))
        for k, v in batch.items()
    }


def make_sharded_train_step(model: MVSDet, tx, mesh: Mesh,
                            example_batch: Dict[str, jnp.ndarray]):
    """Build the jitted data+view-parallel train step.

    Args:
      example_batch: batch WITH leading scene axis (global shapes),
        used only to derive the per-key partition specs.

    Returns:
      step(state, batch) -> (state, metrics); state replicated.
    """
    specs = batch_pspecs(example_batch)
    view_axis = "view" if mesh.shape["view"] > 1 else None

    def per_device(state: TrainState, batch):
        # strip the local scene axis (1 scene per data-shard)
        local = {k: v[0] for k, v in batch.items()}

        def loss_fn(params):
            variables = {"params": params,
                         "batch_stats": state.batch_stats,
                         "frozen": state.frozen}
            (total, aux), mutated = model.apply(
                variables, local, axis_name="data", view_axis=view_axis,
                method=MVSDet.loss, mutable=["batch_stats"])
            return total, (aux, mutated.get("batch_stats",
                                            state.batch_stats))

        (total, (aux, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        # DDP-equivalent gradient mean across scenes, then across view
        # shards (view shards compute identical replicated losses after
        # the psum, but their backbone grads cover disjoint views)
        grads = jax.lax.pmean(grads, "data")
        if view_axis is not None:
            grads = jax.lax.pmean(grads, "view")
            new_stats = jax.lax.pmean(new_stats, "view")
        new_stats = jax.lax.pmean(new_stats, "data")
        total = jax.lax.pmean(total, "data")

        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=new_params,
                               batch_stats=new_stats, frozen=state.frozen,
                               opt_state=new_opt)
        metrics = {"loss": total,
                   **{k: jax.lax.pmean(v, "data") for k, v in aux.items()}}
        return new_state, metrics

    sharded = shard_map(
        per_device, mesh=mesh,
        in_specs=(P(), {k: specs[k] for k in example_batch}),
        out_specs=(P(), P()),
        check_vma=False)

    @jax.jit
    def step(state, batch):
        return sharded(state, batch)

    return step
