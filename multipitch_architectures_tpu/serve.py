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

import json
import struct
import warnings

import numpy as np
import jax
import jax.numpy as jnp

_MAGIC = b"MPTPU\x01"


def export_window_forward(apply_fn, variables, batch_size=50, context=75,
                          n_harmonics=6, n_bins_in=216, platforms=None,
                          batch_mode="independent", meta=None) -> bytes:
    """Serialize the batched window forward as a self-contained artifact.

    Args:
        apply_fn: ``(variables, x) -> (B,1,1,bins)`` (tuple outputs
            allowed; first element used — polyphony heads are dropped,
            like the reference's test loop, exp195f…py).
        variables: parameter/batch-stats pytree; baked into the artifact
            as constants.
        platforms: lowering platforms, e.g. ``("tpu",)`` or
            ``("tpu", "cpu")``. Default: the current default backend.
        batch_mode: the export's batch-composition contract, recorded in
            the artifact header so serving can frame tails correctly
            (see :func:`predict_framewise_exported`):

            - ``"independent"`` — outputs don't depend on batch
              composition (no attention, or ``tokens`` attention);
            - ``"grouped:<g>"`` — block-diagonal ``cross_batch:<g>``
              attention: each consecutive ``g``-window group is one
              reference test batch;
            - ``"cross_batch"`` — plain cross-batch attention over the
              whole dispatch: every window's output depends on all
              ``batch_size`` windows in its batch.
        meta: extra JSON-serializable fields for the artifact header
            (e.g. model name, checkpoint provenance).

    Returns: serialized bytes — a small JSON header (magic ``MPTPU1``)
        followed by the StableHLO export (write to a file; see
        :func:`load_window_forward`).
    """
    from jax import export as jexport

    if not (batch_mode in ("independent", "cross_batch")
            or batch_mode.startswith("grouped:")):
        raise ValueError(f"unknown batch_mode {batch_mode!r}")
    if batch_mode.startswith("grouped:"):
        g = int(batch_mode.split(":", 1)[1])
        if g <= 0 or batch_size % g:
            raise ValueError(f"batch_size {batch_size} not a multiple of "
                             f"the grouped batch_mode's group {g}")

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
    header = dict(meta or {}, batch_mode=batch_mode, batch_size=batch_size,
                  context=context, n_harmonics=n_harmonics,
                  n_bins_in=n_bins_in)
    hdr = json.dumps(header).encode("utf-8")
    return _MAGIC + struct.pack("<I", len(hdr)) + hdr + exported.serialize()


def load_window_forward(blob: bytes):
    """Deserialize an exported artifact into a callable
    ``(B, 6, context, n_bins_in) float32 -> (B, n_bins_out) array``.

    Needs only jax + the artifact — no model code or checkpoint. The
    artifact's JSON header is exposed as ``fn.meta`` (``{}`` for legacy
    headerless blobs, which are still accepted)."""
    from jax import export as jexport

    meta = {}
    if blob[:len(_MAGIC)] == _MAGIC:
        n = struct.unpack("<I", blob[len(_MAGIC):len(_MAGIC) + 4])[0]
        off = len(_MAGIC) + 4
        meta = json.loads(blob[off:off + n].decode("utf-8"))
        blob = blob[off + n:]
    exported = jexport.deserialize(bytearray(blob))
    call = jax.jit(exported.call)

    def fn(x):
        return call(jnp.asarray(x, jnp.float32))

    fn.meta = meta
    return fn


def predict_framewise_exported(fn, inputs, batch_size=50, context=75,
                               compression=10.0, batch_mode=None,
                               strict=False):
    """Whole-recording framewise prediction through an exported artifact:
    the protocol's (half, half+1) padding and stride-1 windowing
    (exp180d…py:427-443) around fixed-size dispatches. The tail batch is
    padded with duplicate windows and cropped.

    Tail exactness depends on the export's batch-composition contract
    (``fn.meta['batch_mode']``, recorded by :func:`export_window_forward`;
    override with ``batch_mode=``):

    - ``independent``: duplicate-pad tails are exact (default for legacy
      headerless artifacts, silently).
    - ``grouped:<g>``: every full ``g``-group in the tail is exact (its
      composition is one reference batch); only the final partial group
      (< g frames) sees duplicate windows in its attention — warns with
      the affected frame count, or raises with ``strict=True``.
    - ``cross_batch``: a duplicate-padded tail changes ALL its real
      windows' outputs — warns (or raises with ``strict=True``); use a
      ``grouped:<g>`` export or ``eval.predict_framewise`` when
      reference-exact tails matter.
    """
    mode = batch_mode or getattr(fn, "meta", {}).get("batch_mode",
                                                     "independent")
    x = np.asarray(inputs, np.float32)
    if compression is not None:
        x = np.log1p(compression * x)
    half = context // 2
    xp = np.pad(x, ((0, 0), (half, half + 1), (0, 0)))
    t = x.shape[1]

    tail = t % batch_size
    if tail:
        affected = 0
        if mode == "cross_batch":
            affected = tail
        elif mode.startswith("grouped:"):
            affected = tail % int(mode.split(":", 1)[1])
        if affected:
            msg = (f"{mode} artifact: the duplicate-padded tail batch "
                   f"changes the last {affected} frames' attention "
                   f"composition vs the reference protocol (batch "
                   f"{batch_size}, {tail}-frame tail); use a grouped "
                   f"export with a group dividing the tail, or "
                   f"eval.predict_framewise, for exact tails")
            if strict:
                raise ValueError(msg)
            warnings.warn(msg)

    outs = []
    for start in range(0, t, batch_size):
        centers = half + start + np.arange(batch_size)
        centers = np.minimum(centers, half + t - 1)      # duplicate-pad tail
        windows = np.stack([xp[:, c - half:c + half + 1, :] for c in centers])
        outs.append(np.asarray(fn(windows))[:min(batch_size, t - start)])
    return np.concatenate(outs, axis=0)
