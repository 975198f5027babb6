"""Checkpoint save/restore (orbax).

Parity target: `train.py:251-267` + `utils/model.py:18-49` in the reference —
one checkpoint per `save_step` named by step, containing generator /
discriminator weights and all three optimizer states; on restore, optimizer
states are re-initialized at the aux->shallow handoff (restore_step ==
total_step_aux) while weights always load; inference loads G only.
Writes are atomic (orbax's tmp-dir + rename) and a `latest` marker tracks
the newest step.
"""

import os

import jax
import orbax.checkpoint as ocp


def _ckpt_dir(ckpt_path, step):
    return os.path.abspath(os.path.join(ckpt_path, f"{step}"))


def save_checkpoint(ckpt_path, state):
    """Write the full TrainState under <ckpt_path>/<step>/."""
    step = int(state.step)
    path = _ckpt_dir(ckpt_path, step)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, jax.device_get(state), force=True)
    with open(os.path.join(ckpt_path, "latest"), "w") as f:
        f.write(str(step))
    return path


def latest_step(ckpt_path):
    marker = os.path.join(ckpt_path, "latest")
    if os.path.isfile(marker):
        with open(marker) as f:
            return int(f.read().strip())
    steps = [int(d) for d in os.listdir(ckpt_path)
             if d.isdigit()] if os.path.isdir(ckpt_path) else []
    return max(steps) if steps else None


def restore_checkpoint(ckpt_path, state, restore_step,
                       reset_optimizers=False):
    """Restore into an abstract/real TrainState template.

    reset_optimizers=True implements the aux->shallow handoff: weights load,
    optimizer states / step keep their fresh values
    (`utils/model.py:41-46`)."""
    path = _ckpt_dir(ckpt_path, restore_step)
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(
            path, jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct,
                                         jax.device_get(state)))
    if reset_optimizers:
        return state.replace(
            g_params=restored.g_params,
            g_batch_stats=restored.g_batch_stats,
            d_params=restored.d_params,
            epoch=restored.epoch,
        )
    return restored


def restore_generator_params(ckpt_path, restore_step, state):
    """Inference path: load generator weights only
    (`utils/model.py:25,51-53`)."""
    restored = restore_checkpoint(ckpt_path, state, restore_step,
                                  reset_optimizers=True)
    return restored.g_params, restored.g_batch_stats
