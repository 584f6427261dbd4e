"""Train state, jitted train step, and the epoch loop.

Replaces the reference's mmengine Runner / EpochBasedTrainLoop /
OptimWrapper / DDP stack (SURVEY §1 L5) with a functional JAX loop:
TrainState pytree, one jitted (optionally shard_mapped) train step,
orbax checkpointing, plain-python epoch driver.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Dict, Iterable, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import optax

from mvsdet_tpu.config import Config
from mvsdet_tpu.models.mvsdet import MVSDet
from mvsdet_tpu.training.optim import build_optimizer


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    frozen: Any
    opt_state: Any


def create_train_state(cfg: Config, rng, example_batch,
                       steps_per_epoch: int = 1000,
                       sweep_chunk: int = 8,
                       dtype: Any = jnp.float32,
                       sweep_remat: bool = True) -> Tuple[MVSDet, TrainState,
                                                          Any]:
    """Initialise model variables and optimizer state.

    Args:
      example_batch: single-scene batch dict (jnp arrays) used for
        shape-driven init.
      dtype: compute dtype for the model (params stay fp32); bfloat16
        keeps the matmuls/convs on the MXU's native precision.

    Returns:
      (model, state, tx).
    """
    model = MVSDet(cfg.model, sweep_chunk=sweep_chunk, dtype=dtype,
                   sweep_remat=sweep_remat)
    # jit the init: eager init dispatches thousands of tiny ops, which
    # is minutes of round-trips on a tunneled TPU; one compile instead
    variables = jax.jit(
        functools.partial(model.init, method=MVSDet.loss))(rng,
                                                           example_batch)
    params = variables["params"]
    tx = build_optimizer(cfg.optim, params, steps_per_epoch)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        frozen=variables.get("frozen", {}),
        opt_state=tx.init(params),
    )
    return model, state, tx


def create_nerfdet_state(cfg: Config, rng, example_batch,
                         steps_per_epoch: int = 1000,
                         dtype: Any = jnp.float32):
    """Train state for the legacy NeRF-Det family (the reference's second
    trainable model, ref: projects/NeRF-Det/nerfdet/nerfdet.py:20-632).

    Mirrors `create_train_state` but for `NerfDetLegacy`, whose loss
    draws a per-step 'rays' rng (N_rand random target rays, nerfdet
    config N_rand, nerfdet.py:90).

    Returns (model, state, tx).
    """
    from mvsdet_tpu.models.nerfdet import NerfDetLegacy

    model = NerfDetLegacy(cfg.model, dtype=dtype)
    k_params, k_rays = jax.random.split(rng)
    variables = jax.jit(
        functools.partial(model.init, method=NerfDetLegacy.loss))(
        {"params": k_params, "rays": k_rays}, example_batch)
    params = variables["params"]
    tx = build_optimizer(cfg.optim, params, steps_per_epoch)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        frozen=variables.get("frozen", {}),
        opt_state=tx.init(params),
    )
    return model, state, tx


def make_jitted_nerfdet_step(model, tx, base_seed: int = 0):
    """Jitted NerfDet train step with a per-step folded 'rays' rng (the
    reference resamples its N_rand target rays every iteration via the
    torch global rng, render_ray.py:231-305)."""
    from mvsdet_tpu.models.nerfdet import NerfDetLegacy

    @jax.jit
    def step(state: TrainState, batch):
        rays = jax.random.fold_in(jax.random.PRNGKey(base_seed), state.step)

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats,
                         "frozen": state.frozen}
            (total, aux), mutated = model.apply(
                variables, batch, method=NerfDetLegacy.loss,
                mutable=["batch_stats"], rngs={"rays": rays})
            return total, (aux, mutated.get("batch_stats",
                                            state.batch_stats))

        (total, (aux, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=new_params,
                               batch_stats=new_stats, frozen=state.frozen,
                               opt_state=new_opt)
        return new_state, {"loss": total, **aux}

    return step


def create_predict_state(cfg: Config, rng, example_batch,
                         sweep_chunk: int = 8,
                         dtype: Any = jnp.float32,
                         checkpoint: Optional[str] = None):
    """Inference-only state: no optimizer, no loss-mode compile.

    The reference's test path builds only the model and loads weights
    (ref: tools/test.py:153-160 -> Runner.test); mirroring that here
    avoids `create_train_state`'s loss-mode `model.init` jit (minutes on
    a tunneled TPU) and the never-used optimizer state.  With a
    checkpoint the param structure comes from `jax.eval_shape` (a trace,
    zero compiles) and orbax restores into that abstract TrainState;
    without one, params are randomly initialised (synthetic smoke runs).

    Returns:
      (model, variables) with variables = {params, batch_stats, frozen}.
    """
    model = MVSDet(cfg.model, sweep_chunk=sweep_chunk, dtype=dtype)
    init = functools.partial(model.init, method=MVSDet.loss)
    if checkpoint:
        abstract = jax.eval_shape(init, rng, example_batch)
        params_a = abstract["params"]
        tx = build_optimizer(cfg.optim, params_a, 1000)
        target = TrainState(
            step=jax.ShapeDtypeStruct((), jnp.int32),
            params=params_a,
            batch_stats=abstract.get("batch_stats", {}),
            frozen=abstract.get("frozen", {}),
            opt_state=jax.eval_shape(tx.init, params_a))
        state = load_checkpoint(checkpoint, target)
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats,
                     "frozen": state.frozen}
    else:
        v = jax.jit(init)(rng, example_batch)
        variables = {"params": v["params"],
                     "batch_stats": v.get("batch_stats", {}),
                     "frozen": v.get("frozen", {})}
    return model, variables


def load_pretrained_backbone(state: TrainState, path: str) -> TrainState:
    """Swap ImageNet-pretrained ResNet weights into a fresh train state.

    The reference initialises its backbone from ``torchvision://resnet50``
    (ref: projects/NeRF-Det/configs/mvsdet_res50_2x_low_res_depth.py:25);
    here the equivalent is an explicit checkpoint file (``.pth`` /
    ``.npz`` with torchvision names) ported into the ``backbone``
    subtree of params + frozen BN constants.  Optimizer state is
    untouched: shapes are identical and AdamW moments start at zero
    either way.

    Raises ValueError if the ported tree does not match the initialised
    backbone structure/shapes exactly.
    """
    from mvsdet_tpu.models.resnet import (load_torchvision_checkpoint,
                                          port_torchvision_state_dict)

    ported = port_torchvision_state_dict(load_torchvision_checkpoint(path))

    def check(name, ours, theirs):
        s_ours = jax.tree_util.tree_map(jnp.shape, ours)
        s_new = jax.tree_util.tree_map(jnp.shape, theirs)
        if s_ours != s_new:
            raise ValueError(
                f"pretrained backbone {name} tree mismatch:\n"
                f"  model: {s_ours}\n  ckpt:  {s_new}")

    check("params", state.params["backbone"], ported["params"])
    check("frozen", state.frozen["backbone"], ported["frozen"])
    return dataclasses.replace(
        state,
        params={**state.params, "backbone": ported["params"]},
        frozen={**state.frozen, "backbone": ported["frozen"]})


def train_step(model: MVSDet, tx, state: TrainState,
               batch: Dict[str, jnp.ndarray],
               axis_name: Optional[str] = None):
    """One optimization step for one scene (per device).

    Inside shard_map, ``axis_name`` enables the cross-replica gradient
    pmean (the DDP all-reduce, SURVEY §2c) and the positive-count
    reduce_mean.
    """

    def loss_fn(params):
        variables = {"params": params, "batch_stats": state.batch_stats,
                     "frozen": state.frozen}
        (total, aux), mutated = model.apply(
            variables, batch, axis_name=axis_name, method=MVSDet.loss,
            mutable=["batch_stats"])
        return total, (aux, mutated.get("batch_stats", state.batch_stats))

    (total, (aux, new_stats)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.params)
    if axis_name is not None:
        grads = jax.lax.pmean(grads, axis_name)
        total = jax.lax.pmean(total, axis_name)
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    new_state = TrainState(step=state.step + 1, params=new_params,
                           batch_stats=new_stats, frozen=state.frozen,
                           opt_state=new_opt)
    metrics = {"loss": total, **{k: v for k, v in aux.items()}}
    return new_state, metrics


def make_jitted_train_step(model: MVSDet, tx):
    """Single-device jitted step (data/view parallel wrappers live in
    mvsdet_tpu.parallel.sharding)."""

    @jax.jit
    def step(state, batch):
        return train_step(model, tx, state, batch)

    return step


def fit(model: MVSDet, tx, state: TrainState,
        batches: Iterable[Dict[str, jnp.ndarray]],
        num_steps: int,
        log_every: int = 10,
        log_fn: Callable[[int, Dict], None] = None,
        checkpoint_dir: Optional[str] = None,
        checkpoint_every: Optional[int] = None):
    """Minimal step-driven training loop.

    Batches are staged one ahead on a background thread while the
    device runs the current step (data/prefetch.py — the reference's
    DataLoader-workers overlap).
    """
    from mvsdet_tpu.data.prefetch import prefetch_iterator

    step_fn = make_jitted_train_step(model, tx)
    it = prefetch_iterator(iter(batches))
    for i in range(num_steps):
        batch = next(it)
        state, metrics = step_fn(state, batch)
        if log_fn is not None and (i % log_every == 0 or i == num_steps - 1):
            log_fn(i, {k: float(v) for k, v in metrics.items()})
        if (checkpoint_dir is not None and checkpoint_every
                and (i + 1) % checkpoint_every == 0):
            save_checkpoint(checkpoint_dir, state)
    return state


def save_checkpoint(path: str, state: TrainState):
    """Orbax checkpoint of the full train state (params/opt/stats/step).

    Replaces mmengine `CheckpointHook` (SURVEY §5; ref config
    mvsdet_res50_2x_low_res.py:168-172).
    """
    import orbax.checkpoint as ocp
    import os

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()


def load_checkpoint(path: str, target: TrainState) -> TrainState:
    import orbax.checkpoint as ocp
    import os

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), target)
