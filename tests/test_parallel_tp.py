"""Tensor-parallel (Megatron-style) param sharding over the 'model' mesh
axis: a dp x tp sharded train step must match the single-device step, with
weights and optimizer moments actually sharded on device.

Runs on the virtual 8-device CPU platform from conftest.py.
"""

import jax
import numpy as np
import pytest

from jax.sharding import PartitionSpec as P

from mixgantts_tpu.parallel import (
    make_mesh, partition_specs, shard_batch, shard_state, shard_train_step,
)
from mixgantts_tpu.train import create_train_state, make_train_step

from test_train_step import setup


def _dp_tp_mesh(model_axis):
    devices = jax.devices()[:8]
    return make_mesh(devices, model_axis=model_axis)


@pytest.mark.parametrize("mode", ["naive", "aux"])
def test_tp_step_matches_single_device(mode):
    model, disc, state, step_fn_jit, batch, tc = setup(mode)
    # reference trajectory: plain single-device jit
    ref_state, ref_metrics = step_fn_jit(state, batch)
    ref_state, ref_metrics2 = step_fn_jit(ref_state, batch)

    mesh = _dp_tp_mesh(model_axis=4)  # 2 data x 4 model
    specs = partition_specs(state, mesh)

    # the rules must have found real TP targets in this model
    flat_specs = jax.tree_util.tree_leaves(
        specs, is_leaf=lambda s: isinstance(s, P))
    n_sharded = sum(1 for s in flat_specs if any(a is not None for a in s))
    assert n_sharded > 0, "no tensor-parallel rule matched any parameter"

    state2, _, _ = setup(mode)[2], None, None
    with mesh:
        sharded = shard_state(mesh, state2, specs)
        step = shard_train_step(
            make_train_step(mode, model, disc,
                            {"transformer": {"encoder_hidden": 32},
                             "discriminator": {"n_layer": 3,
                                               "n_cond_layer": 2}}, tc),
            mesh, state_specs=specs)
        device_batch = shard_batch(mesh, batch)
        sharded, metrics = step(sharded, device_batch)
        sharded, metrics2 = step(sharded, device_batch)

    for k in ("total_loss", "G_loss", "D_loss"):
        np.testing.assert_allclose(
            float(metrics[k]), float(ref_metrics[k]), rtol=2e-4, atol=2e-5,
            err_msg=f"step-1 metric {k}")
        np.testing.assert_allclose(
            float(metrics2[k]), float(ref_metrics2[k]), rtol=2e-3,
            atol=2e-4, err_msg=f"step-2 metric {k}")

    # Weights track the single-device run.  Tolerance is the two-step Adam
    # envelope: early Adam updates are ~sign(g)*lr, so reduction-order noise
    # in near-zero grads flips individual update signs even though every
    # loss metric matches; opposite signs across two steps diverge by up to
    # 2*(lr1+lr2) (Noam lr1+lr2 ~ 5.9e-3 in aux mode, 3e-4 GAN).  A real
    # sharding bug diverges by orders of magnitude more (and breaks the
    # step-2 metrics above, which are computed from the step-1 params).
    lr_tol = 2 * (6e-3 if mode == "aux" else 3e-4)
    ref_leaves = jax.tree_util.tree_leaves(ref_state.g_params)
    tp_leaves = jax.tree_util.tree_leaves(
        jax.device_get(sharded.g_params))
    for r, t in zip(ref_leaves, tp_leaves):
        np.testing.assert_allclose(np.asarray(r), np.asarray(t),
                                   rtol=2e-3, atol=lr_tol)


def test_weights_and_moments_are_sharded_on_device():
    model, disc, state, _, batch, tc = setup("naive")
    mesh = _dp_tp_mesh(model_axis=4)
    specs = partition_specs(state, mesh)
    with mesh:
        sharded = shard_state(mesh, state, specs)

    def find(tree, pred):
        out = []
        jax.tree_util.tree_map_with_path(
            lambda p, x: out.append((p, x)) if pred(p) else None, tree)
        return out

    def has(p, frag):
        return frag in "/".join(str(getattr(k, "key", getattr(k, "name", k)))
                                for k in p)

    # a denoiser residual conv kernel: row-parallel over 'model'
    hits = find(sharded.g_params, lambda p: has(p, "conv_layer"))
    kernels = [(p, x) for p, x in hits if x.ndim == 3]
    assert kernels
    for _, x in kernels:
        shard = x.addressable_shards[0].data
        assert shard.shape[1] == x.shape[1] // 4, (
            f"kernel not row-sharded: {shard.shape} vs {x.shape}")

    # the matching Adam moment is sharded identically (ZeRO for free)
    m_hits = find(sharded.opt_g, lambda p: has(p, "conv_layer"))
    m_kernels = [x for _, x in m_hits if getattr(x, "ndim", 0) == 3]
    assert m_kernels
    for x in m_kernels:
        assert x.addressable_shards[0].data.shape[1] == x.shape[1] // 4


def test_indivisible_dims_stay_replicated():
    model, disc, state, _, batch, tc = setup("naive")
    mesh = _dp_tp_mesh(model_axis=4)
    specs = partition_specs(state, mesh)

    def check(path, spec, leaf):
        for axis, name in zip(leaf.shape, spec):
            if name == "model":
                assert axis % 4 == 0

    jax.tree_util.tree_map_with_path(
        lambda p, s, x: check(p, s, x), specs, state)


@pytest.mark.parametrize("mode", ["naive", "aux"])
def test_tp_weights_match_with_sgd(monkeypatch, mode):
    """Deterministic-optimizer parity (VERDICT r3 #7): with plain SGD
    substituted for Adam/Noam, weight updates are LINEAR in the gradients,
    so cross-device reduction-order noise cannot be amplified into Adam
    sign flips — the dp2 x tp4 sharded step must match the single-device
    step's weights to float tolerance (vs the 2*(lr1+lr2) envelope the
    Adam-path test needs)."""
    import optax

    sgd_gan = lambda *a, **k: optax.scale(-1.0)   # apply_lr scales by lr
    sgd_fs2 = lambda *a, **k: optax.scale(-1e-3)
    for modname in ("mixgantts_tpu.train.step", "mixgantts_tpu.train.state"):
        monkeypatch.setattr(modname + ".build_gan_optimizer", sgd_gan)
        monkeypatch.setattr(modname + ".build_fs2_optimizer", sgd_fs2)

    from test_train_step import MODEL_CONFIG

    model, disc, state, step_fn_jit, batch, tc = setup(mode)
    ref_state, _ = step_fn_jit(state, batch)
    ref_state, _ = step_fn_jit(ref_state, batch)

    mesh = _dp_tp_mesh(model_axis=4)  # 2 data x 4 model
    specs = partition_specs(state, mesh)
    state2 = setup(mode)[2]
    with mesh:
        sharded = shard_state(mesh, state2, specs)
        step = shard_train_step(
            make_train_step(mode, model, disc, MODEL_CONFIG, tc),
            mesh, state_specs=specs)
        device_batch = shard_batch(mesh, batch)
        sharded, _ = step(sharded, device_batch)
        sharded, _ = step(sharded, device_batch)

    for params_of in (lambda s: s.g_params, lambda s: s.d_params):
        ref_leaves = jax.tree_util.tree_leaves(params_of(ref_state))
        tp_leaves = jax.tree_util.tree_leaves(
            jax.device_get(params_of(sharded)))
        for r, t in zip(ref_leaves, tp_leaves):
            np.testing.assert_allclose(np.asarray(r), np.asarray(t),
                                       rtol=1e-4, atol=1e-6)
