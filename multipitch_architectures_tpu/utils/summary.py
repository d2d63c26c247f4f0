"""Model summary — the role torchinfo.summary played in every experiment
script (param counts logged at startup, exp180d…py:224-233).

Uses ``jax.eval_shape`` so no computation or compilation happens. NB the
reference logs undercount attention models by 4e²+4e per
nn.MultiheadAttention (old-torchinfo blind spot, see tests/test_unets.py);
this summary counts every parameter.
"""

from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
import jax.tree_util as jtu


def model_summary(model, input_shape: Tuple[int, ...] = (1, 6, 75, 216),
                  train: bool = False) -> str:
    variables = jax.eval_shape(
        lambda: model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros(input_shape, jnp.float32), train=train))
    lines = [f"{type(model).__name__}  (input {input_shape})",
             "=" * 64]
    total = 0
    for path, leaf in jtu.tree_flatten_with_path(variables["params"])[0]:
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        n = int(np.prod(leaf.shape))
        total += n
        lines.append(f"{name:<48} {str(tuple(leaf.shape)):<18} {n:>12,}")
    lines.append("=" * 64)
    lines.append(f"Total params: {total:,}")
    if "batch_stats" in variables:
        n_stats = sum(int(np.prod(l.shape))
                      for l in jax.tree.leaves(variables["batch_stats"]))
        lines.append(f"BatchNorm stats: {n_stats:,}")
    return "\n".join(lines)
