"""Serving artifacts: AOT-exported inference executables.

The reference's deployment story is "load the .pt in a notebook and loop
over a DataLoader" (02_predict_with_pretrained_model.ipynb). The
TPU-native equivalent is an ahead-of-time exported StableHLO artifact
(`jax.export`): the windowed forward step with the checkpoint weights
baked in as constants, serialized to one file that a serving process can
deserialize and call without any model code, flax, or checkpoint
plumbing — and that XLA compiles for the target platform at load time.

The exported unit is the protocol's batched window forward
``(B, 6, context, n_bins_in) -> (B, n_bins_out)`` at a fixed batch size
(static shapes keep the artifact TPU-friendly; serving frames a
recording's stride-1 windows into these batches exactly like
``eval.predict_framewise``). For cross-batch-attention checkpoints,
export the ``cross_batch:<g>`` variant so each dispatch reproduces the
reference's test batches (see ops/attention.py).
"""

import numpy as np
import jax
import jax.numpy as jnp


def export_window_forward(apply_fn, variables, batch_size=50, context=75,
                          n_harmonics=6, n_bins_in=216,
                          platforms=None) -> bytes:
    """Serialize the batched window forward as a self-contained artifact.

    Args:
        apply_fn: ``(variables, x) -> (B,1,1,bins)`` (tuple outputs
            allowed; first element used — polyphony heads are dropped,
            like the reference's test loop, exp195f…py).
        variables: parameter/batch-stats pytree; baked into the artifact
            as constants.
        platforms: lowering platforms, e.g. ``("tpu",)`` or
            ``("tpu", "cpu")``. Default: the current default backend.

    Returns: serialized bytes (write to a file; see
        :func:`load_window_forward`).
    """
    from jax import export as jexport

    def fn(x):
        y = apply_fn(variables, x)
        if isinstance(y, tuple):
            y = y[0]
        return y.reshape(y.shape[0], -1)

    x_spec = jax.ShapeDtypeStruct(
        (batch_size, n_harmonics, context, n_bins_in), jnp.float32)
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    exported = jexport.export(jax.jit(fn), **kwargs)(x_spec)
    return exported.serialize()


def load_window_forward(blob: bytes):
    """Deserialize an exported artifact into a callable
    ``(B, 6, context, n_bins_in) float32 -> (B, n_bins_out) array``.

    Needs only jax + the artifact — no model code or checkpoint."""
    from jax import export as jexport

    exported = jexport.deserialize(bytearray(blob))
    call = jax.jit(exported.call)

    def fn(x):
        return call(jnp.asarray(x, jnp.float32))

    return fn


def predict_framewise_exported(fn, inputs, batch_size=50, context=75,
                               compression=10.0):
    """Whole-recording framewise prediction through an exported artifact:
    the protocol's (half, half+1) padding and stride-1 windowing
    (exp180d…py:427-443) around fixed-size dispatches. The tail batch is
    padded with duplicate windows and cropped — exact for
    batch-composition-independent exports; export a grouped
    ``cross_batch:<g>`` model and frame full batches host-side when
    reference-exact tails matter (eval.predict_framewise)."""
    x = np.asarray(inputs, np.float32)
    if compression is not None:
        x = np.log1p(compression * x)
    half = context // 2
    xp = np.pad(x, ((0, 0), (half, half + 1), (0, 0)))
    t = x.shape[1]
    outs = []
    for start in range(0, t, batch_size):
        centers = half + start + np.arange(batch_size)
        centers = np.minimum(centers, half + t - 1)      # duplicate-pad tail
        windows = np.stack([xp[:, c - half:c + half + 1, :] for c in centers])
        outs.append(np.asarray(fn(windows))[:min(batch_size, t - start)])
    return np.concatenate(outs, axis=0)
