"""Tensor-parallel parameter partitioning over the mesh 'model' axis.

The reference has no model parallelism at all (single GPU DataParallel,
SURVEY.md section 2.11); this module is the TPU-native scaling story layered
on top of the data-parallel mesh in `mesh.py`.  Megatron-style sharding is
expressed purely as *parameter* PartitionSpecs — model code stays free of
parallelism concerns, and XLA's SPMD partitioner propagates the shardings
through the graph and inserts the ICI collectives:

- attention q/k/v projections column-parallel (heads are contiguous channel
  blocks, so an output-channel block shard is a head shard), output
  projection row-parallel;
- encoder FFN conv column-parallel (single conv, all-gather before the
  residual LayerNorm);
- aux-decoder PositionwiseFeedForward w_1/w_2 as the classic
  column-then-row Megatron MLP (one all-reduce per block);
- denoiser residual-block convs row-parallel over the residual channels
  (the gated split `[gate|filt]` of the 2C output makes output sharding
  non-local, so both convs shard their contraction dim instead).

The same path-suffix rules cover optimizer state: optax Adam moments mirror
the param tree, so `partition_specs` maps the full TrainState, sharding
mu/nu alongside each sharded weight (ZeRO-style optimizer sharding for
free).  Leaves whose dims don't divide the 'model' axis stay replicated.
"""

import re

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

_COL = "col"  # shard the output/features dim (last)
_ROW = "row"  # shard the contraction/input dim (second-to-last)

# (path-suffix regex, kind). Paths are '/'-joined key names; the rules match
# param leaves and their mirrors inside optimizer moments.
_RULES = (
    # RelativeSelfAttention (models/blocks.py)
    (re.compile(r"(conv_q|conv_k|conv_v)/conv/(kernel|bias)$"), _COL),
    (re.compile(r"conv_o/conv/kernel$"), _ROW),
    # encoder FFN: single conv C->C (models/blocks.py::FFN)
    (re.compile(r"ffn_\d+/conv/conv/(kernel|bias)$"), _COL),
    # aux decoder attention (models/aux_decoder.py::MultiHeadAttention)
    (re.compile(r"(w_qs|w_ks|w_vs)/(kernel|bias)$"), _COL),
    (re.compile(r"slf_attn/fc/kernel$"), _ROW),
    # aux decoder Megatron MLP (PositionwiseFeedForward w_1 -> w_2)
    (re.compile(r"pos_ffn/w_1/conv/(kernel|bias)$"), _COL),
    (re.compile(r"pos_ffn/w_2/conv/kernel$"), _ROW),
    # denoiser residual stack: row-parallel both convs (gated 2C output)
    (re.compile(r"res_\d+/(conv_layer|output_projection)/conv/kernel$"),
     _ROW),
)


def _path_str(path):
    parts = []
    for k in path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "name"):
            parts.append(str(k.name))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return "/".join(parts)


def _spec_for(path, leaf, model_size):
    shape = getattr(leaf, "shape", ())
    if not shape or model_size <= 1:
        return P()
    s = _path_str(path)
    for rule, kind in _RULES:
        if not rule.search(s):
            continue
        if kind == _COL:
            dim = len(shape) - 1
        else:  # _ROW: contraction dim; replicate 1-d biases of row convs
            if len(shape) < 2:
                return P()
            dim = len(shape) - 2
        if shape[dim] % model_size != 0 or shape[dim] < model_size:
            return P()
        spec = [None] * len(shape)
        spec[dim] = "model"
        return P(*spec)
    return P()


def partition_specs(tree, mesh):
    """PartitionSpec pytree for any param/state tree (TrainState included:
    optimizer moments share param path suffixes and get the same specs)."""
    model_size = dict(zip(mesh.axis_names, mesh.devices.shape)).get("model", 1)
    return jax.tree_util.tree_map_with_path(
        lambda p, x: _spec_for(p, x, model_size), tree)


def shard_state(mesh, state, specs=None):
    """Place a host-built state on the mesh with TP specs (replicated where
    no rule applies)."""
    if specs is None:
        specs = partition_specs(state, mesh)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), state, specs)
