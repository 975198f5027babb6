"""Device-mesh data parallelism.

The reference's only parallelism is single-process `torch.nn.DataParallel`
pinned to one GPU (`train.py:3,43-44`; SURVEY.md section 2.11).  The
TPU-native equivalent is a `jax.sharding.Mesh` with the batch axis sharded
over the 'data' axis and parameters/optimizer state replicated; `jit` with
these shardings compiles the train step into an SPMD program whose gradient
all-reduce rides the ICI.  The mesh carries a spare 'model' axis so tensor-
parallel shardings can be layered in without re-plumbing.
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, data_axis=None, model_axis=1):
    """1D/2D device mesh ('data', 'model'); model_axis defaults to 1 so all
    devices serve data parallelism."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data_axis is None:
        data_axis = n // model_axis
    dev_array = np.asarray(devices).reshape(data_axis, model_axis)
    return Mesh(dev_array, axis_names=("data", "model"))


def batch_sharding(mesh, stacked=False):
    """Batch-axis sharding over the 'data' mesh axis.  `stacked=True` is for
    k-step chunked batches ([k, B, ...] per leaf): the scan axis stays
    unsharded, the batch axis (dim 1) shards over 'data'."""
    return NamedSharding(mesh, P(None, "data") if stacked else P("data"))


def replicated(mesh):
    return NamedSharding(mesh, P())


def shard_batch(mesh, batch, stacked=False):
    """Place a host batch dict with the batch axis sharded over 'data'."""
    sharding = batch_sharding(mesh, stacked=stacked)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(np.asarray(x), sharding), batch)


def replicate_state(mesh, state):
    """Replicate the train state (params + optimizer) over the mesh."""
    return jax.device_put(state, replicated(mesh))


def shard_train_step(step_fn, mesh, state_specs=None, batch_stacked=False):
    """jit the train step with the batch sharded on 'data' and the state
    either replicated (default) or tensor-parallel per `state_specs` (a
    PartitionSpec pytree from `tp.partition_specs`); XLA inserts the psum
    over ICI for the gradient reduction and the Megatron collectives for
    sharded weights.  The state is donated so params/optimizer buffers
    update in place."""
    if state_specs is None:
        state_in = state_out = replicated(mesh)
    else:
        state_in = state_out = jax.tree_util.tree_map(
            lambda s: NamedSharding(mesh, s), state_specs)
    return jax.jit(
        step_fn,
        in_shardings=(state_in, batch_sharding(mesh, stacked=batch_stacked)),
        out_shardings=(state_out, replicated(mesh)),
        donate_argnums=(0,),
    )
