"""Pure data-parallel (dp8 x tp1) sharding correctness, near-bitwise.

`test_parallel_tp.py` checks the dp x tp trajectory under a wide "Adam
envelope" tolerance (early Adam updates are ~sign(g)*lr, so reduction-order
noise on near-zero grads legitimately flips update signs).  That envelope
could hide a subtle per-leaf sharding error, so this file pins the pure
data-parallel case down tightly at the *gradient* level: for the FULL
forward+backward graph (generator, discriminator, every loss term), the
grads computed on a dp8 mesh (batch sharded over 'data', params replicated,
XLA-inserted psum) must match the single-device grads to float32
reduction-order tolerance -- no optimizer in the loop, no envelope.

Runs on the virtual 8-device CPU platform from conftest.py.
"""

import jax
import numpy as np
import pytest

from jax.sharding import NamedSharding, PartitionSpec as P

from mixgantts_tpu.parallel import make_mesh, shard_batch, shard_train_step
from mixgantts_tpu.train import make_eval_step, make_train_step

from test_train_step import setup


def tile_batch(batch, times):
    return {k: np.concatenate([np.asarray(v)] * times, axis=0)
            for k, v in batch.items()}


def grad_leaves(tree):
    return jax.tree_util.tree_leaves(jax.device_get(tree))


@pytest.mark.parametrize("mode", ["naive", "aux"])
def test_dp8_grads_match_single_device(mode):
    model, disc, state, _, batch, tc = setup(mode)
    batch = tile_batch(batch, 4)  # B=8: one example per device
    eval_fn = make_eval_step(
        mode, model, disc,
        {"transformer": {"encoder_hidden": 32},
         "discriminator": {"n_layer": 3, "n_cond_layer": 2}}, tc)
    rng = jax.random.PRNGKey(7)

    def total(g_params, d_params, batch):
        s = state.replace(g_params=g_params, d_params=d_params)
        return eval_fn(s, batch, rng)["total_loss"]

    grad_fn = jax.value_and_grad(total, argnums=(0, 1))

    ref_loss, (ref_g, ref_d) = jax.jit(grad_fn)(
        state.g_params, state.d_params, batch)

    mesh = make_mesh(jax.devices()[:8], model_axis=1)  # dp8 x tp1
    rep = NamedSharding(mesh, P())
    sharded_fn = jax.jit(
        grad_fn,
        in_shardings=(rep, rep, NamedSharding(mesh, P("data"))),
        out_shardings=(rep, (rep, rep)))
    with mesh:
        dp_loss, (dp_g, dp_d) = sharded_fn(
            state.g_params, state.d_params, shard_batch(mesh, batch))

    np.testing.assert_allclose(float(dp_loss), float(ref_loss),
                               rtol=1e-6, atol=1e-7)
    # float32 batch-mean reduction-order noise only: ~eps-level.  A wrong
    # or missing psum, a mis-sharded leaf, or a dropped batch shard is
    # orders of magnitude outside these bounds.
    for name, ref_tree, dp_tree in (("G", ref_g, dp_g), ("D", ref_d, dp_d)):
        refs, dps = grad_leaves(ref_tree), grad_leaves(dp_tree)
        assert len(refs) == len(dps)
        for r, d in zip(refs, dps):
            scale = max(np.abs(r).max(), 1e-3)
            np.testing.assert_allclose(
                d, r, rtol=1e-5, atol=1e-8 + 2e-6 * scale,
                err_msg=f"{name} grads diverge beyond reduction-order noise")


@pytest.mark.parametrize("mode", ["naive", "aux"])
def test_dp8_step_trajectory(mode):
    """Two real (Adam) train steps on dp8: metrics must match single-device
    to fp32-noise tolerance; params to the Adam sign-flip envelope.

    Param-level tightness beyond the envelope is impossible IN PRINCIPLE,
    not a test weakness: for a weight whose true gradient is at the fp32
    reduction-noise floor (~1e-9 here), the first Adam updates are
    ~sign(g)*lr, and thread-partition-dependent CPU reduction order
    legitimately flips that sign run to run (observed: the same leaf
    diverges 4e-5 or 5.8e-3 ~= lr1+lr2 across reruns of THIS test).  The
    no-escape-hatch guarantee lives in `test_dp8_grads_match_single_device`
    above, which pins the full backward graph at rtol 1e-5 with no
    optimizer in the loop."""
    model, disc, state, step_fn_jit, batch, tc = setup(mode)
    batch = tile_batch(batch, 4)

    ref_state, ref_m1 = step_fn_jit(state, batch)
    ref_state, ref_m2 = step_fn_jit(ref_state, batch)

    state2 = setup(mode)[2]
    mesh = make_mesh(jax.devices()[:8], model_axis=1)
    with mesh:
        step = shard_train_step(
            make_train_step(
                mode, model, disc,
                {"transformer": {"encoder_hidden": 32},
                 "discriminator": {"n_layer": 3, "n_cond_layer": 2}}, tc),
            mesh)
        device_batch = shard_batch(mesh, batch)
        dp_state, m1 = step(jax.device_put(
            state2, NamedSharding(mesh, P())), device_batch)
        dp_state, m2 = step(dp_state, device_batch)

    for k in ("total_loss", "G_loss", "D_loss"):
        np.testing.assert_allclose(float(m1[k]), float(ref_m1[k]),
                                   rtol=2e-6, atol=1e-7,
                                   err_msg=f"step-1 metric {k}")
        np.testing.assert_allclose(float(m2[k]), float(ref_m2[k]),
                                   rtol=1e-4, atol=1e-6,
                                   err_msg=f"step-2 metric {k}")

    # two-step sign-flip envelope (see docstring): 2*(lr1+lr2)
    atol = 2 * (6e-3 if mode == "aux" else 3e-4)
    for r, d in zip(grad_leaves(ref_state.g_params),
                    grad_leaves(dp_state.g_params)):
        np.testing.assert_allclose(d, r, rtol=2e-3, atol=atol)


def test_chunked_step_on_dp_tp_mesh():
    """The production k-step scan dispatch (`chunk_train_step`) compiled
    over a dp4 x tp2 mesh with Megatron param sharding: one stacked k=2
    dispatch must execute, advance the step counter, and its step-1 metric
    must match the single-device step (single-device chunk==sequential is
    pinned in test_train_step.py; this covers the SPMD path the train CLI
    takes when tpu.steps_per_call > 1).  Moved here from
    __graft_entry__._dryrun_impl so the driver artifact needs exactly one
    SPMD compile."""
    from mixgantts_tpu.parallel import partition_specs, shard_state
    from mixgantts_tpu.train import chunk_train_step

    model, disc, state, step_fn_jit, batch, tc = setup("naive")
    batch = tile_batch(batch, 4)  # B=8
    batch2 = dict(batch)
    batch2["mels"] = batch["mels"] + 0.1
    stacked = jax.tree_util.tree_map(
        lambda *xs: np.stack([np.asarray(x) for x in xs]), batch, batch2)

    ref_state, ref_m1 = step_fn_jit(state, batch)
    _, ref_m2 = step_fn_jit(ref_state, batch2)

    state2 = setup("naive")[2]
    mesh = make_mesh(jax.devices()[:8], model_axis=2)  # dp4 x tp2
    specs = partition_specs(state2, mesh)
    step_fn = make_train_step(
        "naive", model, disc,
        {"transformer": {"encoder_hidden": 32},
         "discriminator": {"n_layer": 3, "n_cond_layer": 2}}, tc)
    with mesh:
        chunked = shard_train_step(chunk_train_step(step_fn), mesh,
                                   state_specs=specs, batch_stacked=True)
        sh_state = shard_state(mesh, state2, specs)
        sh_state, ms = chunked(
            sh_state, shard_batch(mesh, stacked, stacked=True))

    assert int(sh_state.step) == 2
    assert ms["total_loss"].shape == (2,)
    np.testing.assert_allclose(float(ms["total_loss"][0]),
                               float(ref_m1["total_loss"]),
                               rtol=1e-5, atol=1e-6)
    # step-2 params sit inside the Adam sign-flip envelope (see the
    # trajectory test's docstring), so step 2 only needs to stay in-family
    np.testing.assert_allclose(float(ms["total_loss"][1]),
                               float(ref_m2["total_loss"]),
                               rtol=0.05, atol=0.05)
