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


def _iter_subjaxprs(params):
    """Yield every Jaxpr nested in an eqn's params (pjit bodies, cond
    branches, scan bodies, custom_jvp calls, ...)."""
    for v in params.values():
        vs = v if isinstance(v, (tuple, list)) else (v,)
        for item in vs:
            if hasattr(item, "jaxpr"):          # ClosedJaxpr
                yield item.jaxpr
            elif hasattr(item, "eqns"):         # raw Jaxpr
                yield item


def _macs_in_jaxpr(jaxpr) -> int:
    """Multiply-accumulate count of all convs and dots in a jaxpr."""
    total = 0
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "conv_general_dilated":
            out = eqn.outvars[0].aval
            rhs = eqn.invars[1].aval
            dn = eqn.params["dimension_numbers"]
            o, i = dn.rhs_spec[0], dn.rhs_spec[1]
            k_elems = int(np.prod([rhs.shape[d]
                                   for d in range(len(rhs.shape))
                                   if d not in (o, i)]))
            total += int(np.prod(out.shape)) * k_elems * rhs.shape[i]
        elif name == "dot_general":
            (lc, _), _ = eqn.params["dimension_numbers"]
            lhs = eqn.invars[0].aval
            out = eqn.outvars[0].aval
            contract = int(np.prod([lhs.shape[d] for d in lc])) if lc else 1
            total += int(np.prod(out.shape)) * contract
        for sub in _iter_subjaxprs(eqn.params):
            total += _macs_in_jaxpr(sub)
    return total


def count_macs(model, input_shape: Tuple[int, ...] = (1, 6, 174, 216),
               train: bool = False) -> int:
    """Total multiply-accumulates of one forward pass — the role of
    torchinfo's 'Total mult-adds' in the reference logs
    (exp180d…py:233 logs summary(model, (1, 6, 174, 216))). Counted by
    traversing the traced jaxpr (no compilation); includes the attention
    score/value dots that old torchinfo misses."""
    variables = jax.eval_shape(
        lambda: model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros(input_shape, jnp.float32), train=train))

    def fwd(variables, x):
        return model.apply(variables, x, train=train)

    closed = jax.make_jaxpr(fwd)(variables,
                                 jax.ShapeDtypeStruct(input_shape,
                                                      jnp.float32))
    return _macs_in_jaxpr(closed.jaxpr)


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
    try:
        macs = count_macs(model, input_shape, train=train)
        lines.append(f"Total mult-adds (G): {macs / 1e9:.2f}")
    except Exception:   # pragma: no cover - MACs are best-effort
        pass
    return "\n".join(lines)
