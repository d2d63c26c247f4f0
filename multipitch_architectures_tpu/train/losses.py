"""Training losses.

The experiments use two criteria (SURVEY §2.8):
- BCE on sigmoid pitch salience (torch.nn.BCELoss(reduction='mean'),
  exp180d…py:92);
- multitask BCE + CrossEntropy/25 for the PUnet family, where the
  polyphony target is the count of active pitch bins
  (exp195f…py:330-333).
"""

import jax
import jax.numpy as jnp

EPS = 1e-7  # clamp like torch BCELoss (log output clamped to >= -100)


def bce_loss(y_pred, y_true, weights=None):
    """Mean binary cross-entropy over all elements (natural log, matching
    torch.nn.BCELoss — NOT the log2 variant of the eval metric)."""
    p = jnp.clip(y_pred, EPS, 1.0 - EPS)
    elem = -(y_true * jnp.log(p) + (1.0 - y_true) * jnp.log1p(-p))
    if weights is None:
        return jnp.mean(elem)
    w = weights.reshape((-1,) + (1,) * (elem.ndim - 1))
    return jnp.sum(elem * w) / (jnp.sum(w) * elem[0].size)


def polyphony_targets(y_true):
    """Polyphony class target = number of active pitches in the center
    frame: sum over the bin axis (exp195f…py:331). y_true (B,1,1,bins)
    → int (B,1,1)."""
    return jnp.sum(y_true, axis=-1).astype(jnp.int32)


def cross_entropy_logits(logits, labels, weights=None, strict=False):
    """torch.nn.CrossEntropyLoss(reduction='mean') on NCHW-style logits
    (B, C, *spatial) with integer labels (B, *spatial).

    Out-of-range labels (e.g. a frame whose polyphony exceeds the head's
    ``num_polyphony_steps`` classes) are a behavior difference vs torch,
    which hard-errors on them (device-side assert) — flagged per repo
    convention:

    - ``strict=False`` (default): clip to the top class — explicit,
      finite, trains through rare over-polyphonic frames;
    - ``strict=True``: poison the loss with NaN for any out-of-range
      label (the jit-compatible analogue of torch's assert) — the NaN
      surfaces through the trainer's NaN-stop failure detection, so a
      mis-sized head or mispaired loss fails fast instead of silently
      training on clipped targets.
    """
    logp = jax.nn.log_softmax(logits, axis=1)
    if strict:
        labels_c = jnp.clip(labels, 0, logits.shape[1] - 1)
        picked = jnp.take_along_axis(logp, labels_c[:, None], axis=1)[:, 0]
        picked = jnp.where(labels == labels_c, picked, jnp.nan)
        if weights is None:
            return -jnp.mean(picked)
        w = weights.reshape((-1,) + (1,) * (picked.ndim - 1))
        return -jnp.sum(picked * w) / (jnp.sum(w) * picked[0].size)
    labels = jnp.clip(labels, 0, logits.shape[1] - 1)
    picked = jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
    if weights is None:
        return -jnp.mean(picked)
    w = weights.reshape((-1,) + (1,) * (picked.ndim - 1))
    return -jnp.sum(picked * w) / (jnp.sum(w) * picked[0].size)


def multitask_bce_ce_loss(outputs, y_true, weights=None,
                          polyphony_weight=1.0 / 25.0):
    """loss1 + loss2/25 of the PUnet experiments (exp195f…py:332-333).

    outputs: (y_pred (B,1,1,bins), n_pred (B, steps, Ht, Wt)); the
    polyphony logits' spatial dims are squeezed against the (B,1,1)
    count target like the torch CE call.
    """
    y_pred, n_pred = outputs
    n_target = polyphony_targets(y_true)              # (B, 1, 1)
    loss1 = bce_loss(y_pred, y_true, weights)
    loss2 = cross_entropy_logits(n_pred, n_target, weights)
    return loss1 + polyphony_weight * loss2
