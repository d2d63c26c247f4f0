"""Device mesh + sharding-policy helpers."""

from typing import Optional, Sequence

import numpy as np
import jax
import jax.tree_util as jtu
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# flax param-path suffixes that benefit from tensor-parallel sharding:
# (module name, leaf name) -> PartitionSpec. The attention MLP is the
# widest matmul in the zoo (mlp_dim 8192 at embed 128/256, SURVEY §2.8);
# the attention projections shard Megatron-style (in_proj column-parallel,
# out_proj row-parallel — GSPMD inserts the reduction collective).
_TP_RULES = {
    ("mlp1", "kernel"): P(None, "model"),
    ("mlp1", "bias"): P("model"),
    ("mlp2", "kernel"): P("model", None),
    ("attn", "in_proj_weight"): P("model", None),   # (3E, E) rows sharded
    ("attn", "in_proj_bias"): P("model"),
    ("attn", "out_proj_weight"): P(None, "model"),  # (E, E) contraction dim
}


def make_mesh(n_devices: Optional[int] = None, model_axis: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a ('data', 'model') mesh over the first ``n_devices`` devices.

    ``model_axis=1`` gives pure data parallelism; larger values carve a
    tensor-parallel axis out of the device count (must divide it).
    """
    devs = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    assert n % model_axis == 0, (n, model_axis)
    arr = np.asarray(devs).reshape(n // model_axis, model_axis)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def tensor_parallel_param_specs(params):
    """PartitionSpec pytree for ``params``: TP rules for the attention
    MLPs, replicated otherwise."""

    def spec(path, leaf):
        names = [getattr(p, "key", "") for p in path]
        for (mod, leaf_name), s in _TP_RULES.items():
            if mod in names and names[-1] == leaf_name:
                return s
        return P()

    return jtu.tree_map_with_path(spec, params)


def shard_params(params, mesh: Mesh):
    """Place ``params`` on the mesh according to the TP policy."""
    specs = tensor_parallel_param_specs(params)
    return jax.tree.map(
        lambda leaf, s: jax.device_put(leaf, NamedSharding(mesh, s)),
        params, specs)
