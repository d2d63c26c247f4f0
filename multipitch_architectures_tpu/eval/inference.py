"""Whole-recording framewise inference.

The reference predicts stride-1 sliding windows through a DataLoader, one
75-frame window per output frame (exp180d…py:417-443) — ~75× redundant
compute. TPU-native replacements:

- :func:`predict_framewise` — the exact-protocol path: pad the recording
  by (half_context, half_context+1) frames like the reference
  (exp180d…py:427-428), gather all stride-1 windows on device, and run a
  jitted batched forward. Bit-compatible with the reference protocol for
  every model (batch grouping matters only for the cross-batch attention
  quirk; ``batch_size=50`` matches the reference's test DataLoader).
- :func:`predict_dense` — the fast path for time-stride-1 models (the
  whole basic/deep CNN family): ONE forward over the padded recording
  yields every framewise prediction at ~75× fewer FLOPs. NB not
  bit-identical to the windowed protocol: the reference's convs zero-pad
  each 75-frame window in time, whereas the dense pass sees the true
  neighboring frames there (real context instead of zeros) — use
  ``predict_framewise`` when checkpoint-level output parity matters.

.. warning:: Dense modes are for the plain CNN family ONLY
   (basic/deep/residual CNNs), where trained-model measure deltas vs the
   windowed protocol are ~2.6e-3 worst-case
   (perf/dense_fparity_conv_families.py). They FAIL for every U-Net
   variant: trained Unet F 0.96 → 0.41 (pooling-phase alignment,
   odd-size up-concat padding and align_corners upsampling tie the
   features to the 75-frame window geometry), and catastrophically for
   cross-batch-attention checkpoints, trained SAUnet F 0.95 → 0.11
   (perf/dense_fparity_experiment.py). Use ``predict_framewise``
   (optionally with ``group=50`` + a ``cross_batch:50`` model for large
   fused dispatches) for every U-Net.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..data.windows import gather_windows


def _pad_inputs(inputs, context):
    half = context // 2
    return jnp.pad(jnp.asarray(inputs), ((0, 0), (half, half + 1), (0, 0)))


@partial(jax.jit, static_argnames=("apply_fn", "context", "with_aux"))
def _window_forward(apply_fn, variables, inputs_padded, centers, context,
                    with_aux=False):
    x = gather_windows(inputs_padded, centers, context)
    y = apply_fn(variables, x)
    aux = None
    if isinstance(y, tuple):
        y, aux = y[0], y[1]
    y = y.reshape(y.shape[0], -1)             # (B, n_bins)
    if with_aux:
        return y, (aux.reshape(aux.shape[0], -1)
                   if aux is not None else jnp.zeros((y.shape[0], 0)))
    return y


def _next_batch_size(remaining, batch_size, group):
    """Protocol-exact batch drain: full batches, then (with grouped
    attention) the tail's full groups, then the natural-size remainder —
    the reference loader's final short batch. Shared by the single-chip
    and sharded paths so the load-bearing composition rule lives once."""
    n = min(batch_size, remaining)
    if group is not None and n < batch_size and n > group:
        n = (n // group) * group
    return n


def predict_framewise(apply_fn, variables, inputs, context=75, batch_size=50,
                      compression=10.0, group=None, return_aux=False,
                      start_frame=0):
    """Per-frame predictions for a whole recording.

    Args:
        apply_fn: ``(variables, x: (B,6,75,216)) -> (B,1,1,bins)`` (tuple
            outputs allowed; first element used).
        inputs: raw HCQT (6, T, 216) (uncompressed).
        compression: log-compression γ (None if inputs already compressed).
        group: attention batch-group size ``g`` when the model was built
            with ``attn_mode='cross_batch:<g>'``. ``batch_size`` must be a
            multiple of ``g``; dispatches are then large fused batches
            whose per-``g`` groups reproduce the reference's ``g``-sized
            test batches exactly, and the tail splits into full groups
            plus a natural-size remainder (its own reference batch).
        return_aux: also return the model's second output flattened per
            frame (the polyphony head of the PUnet family, used by the
            reference's notebook 02) as ``(pred, aux)``.
        start_frame: predict frames ``[start_frame, T)`` only (the caller
            already holds the earlier frames, e.g. from an int8 serve's
            f32 calibration pass — ``predict_framewise_int8``). Batch
            composition stays reference-exact when ``start_frame`` is a
            multiple of ``batch_size`` (the reference loader's batches
            are consecutive from frame 0).

    Returns: np.ndarray (T - start_frame, n_bins), or ``(pred, aux)``
    with ``return_aux=True``.

    Results are fetched to the host once at the end (a per-batch fetch
    would synchronize every dispatch — expensive through a relayed TPU
    backend).
    """
    x = jnp.asarray(inputs, jnp.float32)
    if compression is not None:
        x = jnp.log1p(compression * x)
    t = x.shape[1]
    xp = _pad_inputs(x, context)
    half = context // 2

    if group is not None and batch_size % group:
        raise ValueError(f"batch_size {batch_size} not a multiple of "
                         f"attention group {group}")

    outs, auxs = [], []
    start = int(start_frame)
    if not 0 <= start < t:
        raise ValueError(f"start_frame {start_frame} outside [0, {t})")
    while start < t:
        # the tail runs at its natural size (one extra compile) rather
        # than padded with duplicate windows: under the reference's
        # cross-batch attention quirk, batch composition changes the
        # outputs of the REAL windows, so padding would break protocol
        # exactness for the last batch (_next_batch_size).
        n = _next_batch_size(t - start, batch_size, group)
        centers = half + start + np.arange(n)
        y = _window_forward(apply_fn, variables, xp,
                            jnp.asarray(centers), context,
                            with_aux=return_aux)
        if return_aux:
            y, aux = y
            auxs.append(aux)
        outs.append(y)
        start += n
    pred = np.concatenate([np.asarray(y) for y in outs], axis=0)
    if return_aux:
        return pred, np.concatenate([np.asarray(a) for a in auxs], axis=0)
    return pred


def predict_framewise_sharded(apply_fn, variables, inputs, mesh, context=75,
                              per_device_batch=50, compression=10.0,
                              group=None, batch_independent=False):
    """Multi-chip windowed-protocol inference: shard the stride-1 window
    batch over the mesh's ``data`` axis.

    The stride-1 test fan-out (thousands of 75-frame windows per file,
    exp180d…py:417-443) is the most profitable thing to shard on a TPU
    pod slice (SURVEY §2.9): windows are embarrassingly parallel, the
    HCQT + params replicate (a few MB), and each device runs
    ``per_device_batch`` windows per dispatch with no collectives — the
    only ICI traffic is the (B, n_bins) result layout.

    Protocol exactness requires per-device batches to decompose into the
    reference loader's batches, so the model must either be
    batch-composition independent (``tokens`` attention or no attention —
    declare it with ``batch_independent=True``) or use grouped
    ``cross_batch:<g>`` attention with ``group=g`` and
    ``per_device_batch % g == 0`` — then every group of ``g``
    consecutive windows lands whole on one device and reproduces one
    reference test batch exactly, like the single-chip grouped path.
    One of the two MUST be stated: a plain (ungrouped) ``cross_batch``
    model would silently change its outputs with the fused batch size
    (the repo's own dense-mode evidence shows batch-composition changes
    are catastrophic for trained attention checkpoints), so calling with
    neither ``group`` nor ``batch_independent`` raises.

    The tail (< ``n_data * per_device_batch`` windows) drains through the
    single-device path with identical batch composition. ``variables``
    are placed replicated on every call — pre-place them (device_put with
    a replicated NamedSharding on the same mesh) when predicting many
    recordings; an already-placed pytree makes the per-call device_put a
    no-op.

    Returns: np.ndarray (T, n_bins).
    """
    if group is None and not batch_independent:
        raise ValueError(
            "predict_framewise_sharded changes the dispatch batch size; "
            "pass group=<g> for a cross_batch:<g> model, or "
            "batch_independent=True for models whose outputs do not "
            "depend on batch composition (no attention / 'tokens' mode)")
    n_data = int(mesh.shape["data"])
    if group is not None and per_device_batch % group:
        raise ValueError(f"per_device_batch {per_device_batch} not a "
                         f"multiple of attention group {group}")

    x = jnp.asarray(inputs, jnp.float32)
    if compression is not None:
        x = jnp.log1p(compression * x)
    t = x.shape[1]
    half = context // 2
    xp = jax.device_put(_pad_inputs(x, context),
                        NamedSharding(mesh, P()))          # replicated
    variables = jax.device_put(variables, NamedSharding(mesh, P()))
    batch_shard = NamedSharding(mesh, P("data"))

    super_batch = per_device_batch * n_data
    outs = []
    start = 0
    while t - start >= super_batch:
        centers = half + start + np.arange(super_batch)
        y = _window_forward_sharded(apply_fn, variables, xp,
                                    jax.device_put(jnp.asarray(centers),
                                                   batch_shard),
                                    context, batch_shard)
        outs.append(y)
        start += super_batch
    # tail: single-device, reference batch composition (same
    # _next_batch_size rule as predict_framewise)
    while start < t:
        n = _next_batch_size(t - start, per_device_batch, group)
        centers = half + start + np.arange(n)
        outs.append(_window_forward(apply_fn, variables, xp,
                                    jnp.asarray(centers), context))
        start += n
    return np.concatenate([np.asarray(y) for y in outs], axis=0)


@partial(jax.jit, static_argnames=("apply_fn", "context", "out_sharding"))
def _window_forward_sharded(apply_fn, variables, inputs_padded, centers,
                            context, out_sharding):
    y = _window_forward.__wrapped__(apply_fn, variables, inputs_padded,
                                    centers, context)
    return jax.lax.with_sharding_constraint(y, out_sharding)


def predict_dense_chunked(apply_fn, variables, inputs, context=75,
                          chunk=512, compression=10.0):
    """Dense inference over overlapping chunks: each chunk spans
    ``chunk + context - 1`` frames and contributes ``chunk`` framewise
    predictions — i.e. the reference's windowed protocol generalized to
    big windows (stride = window = ``chunk``), costing
    ``(chunk+74)/chunk ≈ 1.15×`` dense work instead of the stride-1
    protocol's 75×. Bounded compile size for arbitrarily long recordings
    (the full-recording ``predict_dense`` compiles one conv per T).
    """
    x = jnp.asarray(inputs, jnp.float32)
    if compression is not None:
        x = jnp.log1p(compression * x)
    t = x.shape[1]
    xp = _pad_inputs(x, context)                    # (C, T+ctx, F)
    n_chunks = -(-t // chunk)
    # pad so every chunk slice is in range
    need = (n_chunks - 1) * chunk + chunk + context
    if xp.shape[1] < need:
        xp = jnp.pad(xp, ((0, 0), (0, need - xp.shape[1]), (0, 0)))
    starts = np.arange(n_chunks) * chunk

    y = _chunk_forward(apply_fn, variables, xp, jnp.asarray(starts),
                       chunk, context)
    y = np.asarray(y)[:, :chunk, :].reshape(-1, y.shape[-1])
    return y[:t]


@partial(jax.jit, static_argnames=("apply_fn", "chunk", "context"))
def _chunk_forward(apply_fn, variables, xp, starts, chunk, context):
    def one(s):
        return jax.lax.dynamic_slice(
            xp, (0, s, 0), (xp.shape[0], chunk + context, xp.shape[2]))

    segs = jax.vmap(one)(starts)                    # (N, C, chunk+ctx, F)
    y = apply_fn(variables, segs)
    if isinstance(y, tuple):
        y = y[0]
    return y.reshape(y.shape[0], y.shape[2], -1)    # (N, chunk+1, bins)


def predict_dense(apply_fn, variables, inputs, context=75, compression=10.0):
    """One-pass dense prediction for fully-convolutional-in-time models
    (basic/deep CNN family): feed the whole padded recording, get all T
    framewise predictions at once."""
    x = jnp.asarray(inputs, jnp.float32)
    if compression is not None:
        x = jnp.log1p(compression * x)
    t = x.shape[1]
    xp = _pad_inputs(x, context)[None]        # (1, 6, T+75, 216)
    y = apply_fn(variables, xp)
    if isinstance(y, tuple):
        y = y[0]
    y = y.reshape(y.shape[2], -1)             # (T', n_bins); T' = T+1
    return np.asarray(y[:t])
