"""Parallelism: mesh construction and sharding policies.

The reference has NO distributed capability (single cuda:0, SURVEY §2.9);
this module is the TPU-native superset: a 1-or-2-axis device mesh with

- ``data`` axis — batch sharding (DP); gradients all-reduce over ICI via
  GSPMD (no hand-written collectives);
- ``model`` axis — tensor-parallel weight sharding for the wide layers
  (the attention-MLP kernels of the SAUnet/SAUSnet XL configs, mlp_dim up
  to 8192), again with XLA inserting the activation collectives.

The workload's shapes (≤24 M params, 75×216 inputs) make DP the profitable
strategy; TP is provided for the XL MLPs and as the template for scaling.
"""

from .mesh import (
    make_mesh,
    batch_sharding,
    replicated,
    tensor_parallel_param_specs,
    shard_params,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "tensor_parallel_param_specs",
    "shard_params",
]
