"""int8 (W8A8) quantized inference for the conv stacks.

v5e's int8 MXU peak is 2x bf16, and XLA's f32 convs already run as
one-pass bf16 MXU ops — so f32→bf16 buys nothing (measured, ROADMAP),
but int8 does: 1.45–1.63x standalone on SAUnet:XL's FLOP-dominant conv
shapes (perf/int8_conv_microbench.py). This module turns any model of
the zoo into an int8-conv serving variant WITHOUT touching model code:
a flax method interceptor replaces every big-enough ``nn.Conv`` with

    per-output-channel symmetric int8 weights
    per-tensor int8 activations — dynamic (max-abs per call) or
        calibrated static scales (:func:`calibrate_activation_scales`)
    int32 accumulation on the MXU, dequantize + bias in f32

LayerNorm, BatchNorm, attention, pooling, bilinear resize, and the
small head convs stay f32 (negligible FLOP share; quantizing them risks
accuracy for no speed). Measured on the windowed HCQT+SAUnet:XL protocol
pipeline (v5e, round 4, tails included, real-recording span): dynamic
+1.6% (the per-call max re-reads every activation tensor), calibrated
static +10% (42.1x -> 46.5x real-time per-recording, 47.8x steady,
bench.py). NOT protocol-exact: an opt-in
serving mode whose accuracy cost must be measured per checkpoint — the
export CLI enforces this via :func:`int8_drift_report` (refuses >1e-3
drift). Calibration policy matters (perf/int8_calibration_study.py,
trained checkpoints): TRAINING-set static scales fail the 1e-3 measure
gate at every margin/percentile tried (1.2e-3..1.2e-2); dynamic passes
(8e-4); per-RECORDING calibration (scales from the recording being
served, perf/gated_mode_experiment.py) is the fast gated policy.

Serving-call economics (:func:`predict_framewise_int8`): the serving
forward is compiled ONCE across recordings (scales are traced arguments
— :func:`quantized_serving_fn`), and the calibration pass's exact f32
outputs serve the calibration span (:func:`calibrate_with_predictions`),
so per-recording calibration costs one probe dispatch, not an extra
f32 pass on top of the full int8 pass.

.. note:: int8 outputs are reproducible only WITHIN one compiled
   program. Two different programs of the same int8 computation (e.g.
   scales baked as constants vs passed as arguments, or eager vs jit)
   differ at the ~1e-3 level: ulp-level fusion differences in the
   upstream f32 ops flip ``round(x/s)`` quantization bins. This is
   inherent to quantization (the rounding cliff amplifies last-ulp
   noise) and is well inside the measured drift-gate budget; it only
   matters when bitwise-comparing int8 outputs across program
   boundaries (tests do so with a 5e-3 bound).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn


def _normalize_strides(strides):
    if strides is None:
        return (1, 1)
    if isinstance(strides, int):
        return (strides, strides)
    return tuple(strides)


def quantized_conv(x, kernel, bias, strides, padding):
    """int8 W8A8 convolution with f32 dequantize.

    x: (B, H, W, Cin) f32; kernel: (kh, kw, Cin, Cout) f32 — quantization
    happens inside the traced graph, so the same checkpoint pytree serves
    both the f32 and int8 paths (XLA folds the weight quantization into
    constants under jit when params are donated/captured)."""
    ws = jnp.max(jnp.abs(kernel), axis=(0, 1, 2))        # per out channel
    ws = jnp.maximum(ws, 1e-12) / 127.0
    wq = jnp.clip(jnp.round(kernel / ws), -127, 127).astype(jnp.int8)
    xs = jnp.maximum(jnp.max(jnp.abs(x)), 1e-12) / 127.0
    xq = jnp.clip(jnp.round(x / xs), -127, 127).astype(jnp.int8)
    y = jax.lax.conv_general_dilated(
        xq, wq, _normalize_strides(strides), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * (ws * xs)                # broadcast Cout
    if bias is not None:
        y = y + bias
    return y


def quantized_conv_static(x, kernel, bias, strides, padding, x_scale):
    """int8 conv with PRE-CALIBRATED activation scale(s): no dynamic max
    pass over the input (the dynamic variant re-reads every activation
    tensor, which erases most of the MXU gain in-context — measured:
    dynamic +1.6%, static +14% on the windowed pipeline,
    perf/int8_windowed_experiment.py).

    ``x_scale`` is a scalar (per-tensor) or a (Cin,) vector
    (per-input-channel). Per-channel adds no conv-shape cost: each
    channel scale folds into the kernel's Cin axis BEFORE
    per-output-channel weight quantization, so the conv itself and the
    (Cout,) dequantize are unchanged
    (sum_cin (x/s_c)·(w·s_c) == sum_cin x·w exactly). The fold and the
    weight requantization are elementwise over the KERNEL: constant-
    folded by XLA when both kernel and scales are trace-time constants
    (baked exports), executed per dispatch when either is a traced
    argument — which is already true of the kernel itself on every
    predict path (params are jit arguments), so the measured static-int8
    gains include this requant cost; weights are small next to a window
    batch's activations. Per-channel quantizes activations finer but the
    folded kernel's wider per-output-channel range coarsens WEIGHT
    quantization, so which policy drifts less is an empirical
    per-checkpoint question — measured on trained checkpoints by
    perf/gated_mode_experiment.py."""
    xs = jnp.asarray(x_scale, jnp.float32)
    if xs.ndim == 1:                         # per-input-channel: fold
        kernel = kernel * xs[None, None, :, None]
    ws = jnp.max(jnp.abs(kernel), axis=(0, 1, 2))
    ws = jnp.maximum(ws, 1e-12) / 127.0
    wq = jnp.clip(jnp.round(kernel / ws), -127, 127).astype(jnp.int8)
    xq = jnp.clip(jnp.round(x / xs), -127, 127).astype(jnp.int8)
    y = jax.lax.conv_general_dilated(
        xq, wq, _normalize_strides(strides), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * ws
    if xs.ndim == 0:
        y = y * xs
    if bias is not None:
        y = y + bias
    return y


def _plain_conv(mod) -> bool:
    """Only undilated, ungrouped 2-D convs are quantized; anything else
    falls through to the exact f32 path (the replayed conv below assumes
    a rank-4 HWIO kernel and carries no dilation/group attributes, so
    silently quantizing e.g. a 1-D conv would reduce the wrong axes)."""

    def unit(v):
        return v is None or v == 1 or tuple(np.atleast_1d(v)) in ((1,),
                                                                  (1, 1))

    return (unit(mod.kernel_dilation) and unit(mod.input_dilation)
            and mod.feature_group_count == 1
            and mod.variables["params"]["kernel"].ndim == 4)


def make_int8_interceptor(min_kernel_elems: int = 4096,
                          activation_scales=None, exclude=()):
    """Interceptor quantizing every plain ``nn.Conv`` whose kernel holds
    at least ``min_kernel_elems`` weights (the tiny 1x1 shortcuts and
    1xK heads stay f32 by default; dilated/grouped convs always stay
    f32). With ``activation_scales`` (a {module-path: scale} dict from
    :func:`calibrate_activation_scales`) the static-scale kernels are
    used for layers present in the dict and DYNAMIC per-call scales for
    the rest — so deleting a key demotes that layer to dynamic. Paths in
    ``exclude`` stay exact f32 (the second fallback tier;
    :func:`auto_hybrid_int8` finds the smallest such set that passes the
    drift gate on checkpoints where uniform int8 does not fit)."""
    exclude = frozenset(exclude)

    def interceptor(next_fun, args, kwargs, context):
        mod = context.module
        if (isinstance(mod, nn.Conv) and context.method_name == "__call__"
                and "params" in mod.variables):
            kernel = mod.variables["params"]["kernel"]
            if (kernel.size >= min_kernel_elems and _plain_conv(mod)
                    and "/".join(mod.path) not in exclude):
                bias = mod.variables["params"].get("bias")
                if activation_scales is not None:
                    key = "/".join(mod.path)
                    scale = activation_scales.get(key)
                    if scale is not None:
                        return quantized_conv_static(
                            args[0], kernel, bias, mod.strides, mod.padding,
                            scale)
                return quantized_conv(args[0], kernel, bias, mod.strides,
                                      mod.padding)
        return next_fun(*args, **kwargs)

    return interceptor


class _CalibrationProbe:
    """Jitted activation-range probe for one (model, capture policy).

    Instances are cached (:func:`_probe_for`) so SERVING calls that
    calibrate per recording reuse ONE compiled executable per input
    shape — a fresh closure per call would recompile the full forward
    for every recording (minutes through a relayed TPU backend).
    ``keys`` holds the conv module paths in capture order; it is filled
    at trace time and persists across cached calls."""

    def __init__(self, model, min_kernel_elems, percentile, per_channel,
                 with_predictions):
        self.keys = []

        def probe(v, x):
            del self.keys[:]                             # trace-time reset
            captured = []

            def capture(next_fun, args, kwargs, context):
                mod = context.module
                if (isinstance(mod, nn.Conv)
                        and context.method_name == "__call__"
                        and "params" in mod.variables
                        and mod.variables["params"]["kernel"].size
                        >= min_kernel_elems and _plain_conv(mod)):
                    self.keys.append("/".join(mod.path))
                    a = jnp.abs(args[0])
                    if per_channel:          # (B,H,W,Cin) -> (Cin,)
                        red = tuple(range(a.ndim - 1))
                        captured.append(
                            jnp.percentile(a, percentile, axis=red)
                            if percentile is not None
                            else jnp.max(a, axis=red))
                    else:
                        captured.append(
                            jnp.percentile(a, percentile)
                            if percentile is not None else jnp.max(a))
                return next_fun(*args, **kwargs)

            with nn.intercept_methods(capture):
                y = model.apply(v, x, train=False)
            if with_predictions:
                aux = None
                if isinstance(y, tuple):
                    y, aux = y[0], y[1]
                y = y.reshape(y.shape[0], -1)
                aux = (aux.reshape(aux.shape[0], -1) if aux is not None
                       else jnp.zeros((y.shape[0], 0)))
                return (y, aux), captured
            return captured

        self.jit = jax.jit(probe)


@functools.lru_cache(maxsize=64)
def _probe_for(model, min_kernel_elems, percentile, per_channel,
               with_predictions):
    """flax Modules hash/compare structurally, so equivalent model
    configs share one probe (and its jit caches) across serving calls."""
    return _CalibrationProbe(model, min_kernel_elems, percentile,
                             per_channel, with_predictions)


def calibrate_with_predictions(model, variables, sample_inputs,
                               min_kernel_elems: int = 4096,
                               margin: float = 1.0,
                               per_channel: bool = False):
    """Per-recording calibration that keeps the f32 predictions.

    The calibration pass IS a full-precision protocol forward over the
    calibration windows, so its outputs are exact f32 predictions for
    those windows — a per-recording int8 serve that reuses them pays
    only the probe dispatch for calibration instead of recomputing the
    calibration span in int8 (:func:`predict_framewise_int8`).

    Returns ``(scales, preds)``: ``scales`` as
    :func:`calibrate_activation_scales`, ``preds`` a list of
    ``(main (B, n_bins), aux (B, n_aux))`` np-array pairs per sample
    batch (``aux`` has width 0 for single-head models).
    """
    probe = _probe_for(model, min_kernel_elems, None, per_channel, True)
    maxes, preds = {}, []
    for x in sample_inputs:
        (y, aux), vals = probe.jit(variables, jnp.asarray(x))
        preds.append((np.asarray(y), np.asarray(aux)))
        for k, v in zip(list(probe.keys), [np.asarray(v) for v in vals]):
            maxes[k] = np.maximum(maxes.get(k, 0.0), v)
    return _scales_from_maxes(maxes, margin, per_channel), preds


def _scales_from_maxes(maxes, margin, per_channel):
    if per_channel:
        return {k: np.maximum(v * margin, 1e-12).astype(np.float32) / 127.0
                for k, v in maxes.items()}
    return {k: max(float(v) * margin, 1e-12) / 127.0
            for k, v in maxes.items()}


def calibrate_activation_scales(model, variables, sample_inputs,
                                min_kernel_elems: int = 4096,
                                percentile: float = None,
                                margin: float = 1.0,
                                per_channel: bool = False):
    """Per-conv activation scales from representative inputs.

    Runs JITTED f32 forwards with a trace-time capturing interceptor:
    each conv input's max|x| becomes an extra traced output, so
    calibration costs one compiled dispatch per distinct input shape
    (an eager per-op forward would crawl through a relayed TPU backend).
    Returns {module-path: max_abs / 127} for :func:`quantized_apply_fn`.
    Calibrate on windows drawn from the serving distribution (e.g. a few
    protocol batches of the recording, or training windows).

    Args:
        percentile: if set (e.g. 99.9), each batch contributes the given
            percentile of |x| instead of the max — trades outlier
            clipping for finer rounding on the bulk of values.
        margin: headroom multiplier on the calibrated scale; >1 protects
            serving inputs whose activations exceed the calibration range
            (measured: margin 1.25 pulls static-scale drift on trained
            checkpoints under the 1e-3 gate, perf/int8_calibration_study).
        per_channel: capture a (Cin,) max per conv input channel instead
            of one scalar — finer activation quantization at zero runtime
            cost (the channel scales fold into kernel constants, see
            :func:`quantized_conv_static`), traded against coarser
            quantization of the folded weights; drift measured per
            checkpoint by perf/gated_mode_experiment.py.
    """
    probe = _probe_for(model, min_kernel_elems, percentile, per_channel,
                       False)
    maxes = {}
    for x in sample_inputs:
        vals = [np.asarray(v) for v in probe.jit(variables, jnp.asarray(x))]
        # `keys` holds the most recent trace's order; cached calls keep it
        for k, v in zip(list(probe.keys), vals):
            maxes[k] = np.maximum(maxes.get(k, 0.0), v)
    return _scales_from_maxes(maxes, margin, per_channel)


DRIFT_GATE_MEASURES = (
    "precision", "recall", "f_measure", "cosine_sim",
    "binary_crossentropy", "euclidean_distance", "binary_accuracy",
    "soft_accuracy", "accum_energy", "roc_auc_measure",
    "average_precision_score")


def int8_drift_report(model, variables, cal_windows, activation_scales=None,
                      min_kernel_elems: int = 4096, threshold: float = 0.4,
                      min_pitch: int = 24, gate: float = 1e-3, exclude=()):
    """Export-time accuracy gate for the int8 serving mode.

    Ground truth is unavailable at export time, so the f32 forward's own
    thresholded predictions serve as pseudo-targets: for each evaluation
    measure ``m`` the drift is ``|m(pseudo, int8) - m(pseudo, f32)|``
    over the calibration windows — zero when int8 reproduces f32, and a
    faithful proxy for the true-target measure drift the repo's trained
    checkpoint studies gate on (perf/int8_calibration_study.py validates
    the two track each other).

    Args:
        cal_windows: iterable of ``(B, 6, context, n_bins)`` window
            batches — the same batches passed to
            :func:`calibrate_activation_scales`.
        activation_scales: static scales (None = dynamic per-call mode).
        gate: the measure-drift threshold (the repo-wide 1e-3 F-gate).

    Returns dict with ``worst`` (max measure drift), ``measures`` (per
    measure), ``pred_max`` / ``pred_mean`` (raw prediction deltas),
    ``skipped`` (measures degenerate under pseudo-targets, e.g. ROC-AUC
    when every pseudo-label agrees) and ``passed`` (worst <= gate).
    """
    from .measures import calculate_eval_measures
    from .mireval import calculate_mpe_measures_mireval

    f32_fn = jax.jit(lambda v, x: model.apply(v, x, train=False))
    q_fn = jax.jit(quantized_apply_fn(model, min_kernel_elems,
                                      activation_scales, exclude))

    def run(fn):
        outs = []
        for x in cal_windows:
            y = fn(variables, jnp.asarray(x))
            if isinstance(y, tuple):
                y = y[0]
            outs.append(np.asarray(y).reshape(y.shape[0], -1))
        return np.concatenate(outs, axis=0)

    pred_f, pred_q = run(f32_fn), run(q_fn)
    pseudo = (pred_f > threshold).astype(np.float32)

    drift, skipped = {}, []
    for m in DRIFT_GATE_MEASURES:
        try:
            a = calculate_eval_measures(pseudo, pred_f, [m], threshold)[m]
            b = calculate_eval_measures(pseudo, pred_q, [m], threshold)[m]
        except ValueError:                  # degenerate pseudo-targets
            skipped.append(m)               # (single-class ROC-AUC raises)
            continue
        if np.isfinite(a) and np.isfinite(b):
            drift[m] = abs(a - b)
        else:                               # sklearn returns NaN + warning
            skipped.append(m)               # for single-class AP
    mf = calculate_mpe_measures_mireval(pseudo, pred_f, threshold=threshold,
                                        min_pitch=min_pitch)
    mq = calculate_mpe_measures_mireval(pseudo, pred_q, threshold=threshold,
                                        min_pitch=min_pitch)
    for k in mf:
        drift[k] = abs(mf[k] - mq[k])

    worst = max(drift.values()) if drift else float("inf")
    return dict(worst=worst, measures=drift, skipped=skipped,
                pred_max=float(np.abs(pred_f - pred_q).max()),
                pred_mean=float(np.abs(pred_f - pred_q).mean()),
                gate=gate, passed=bool(drift) and worst <= gate)


def auto_hybrid_int8(model, variables, cal_windows,
                     min_kernel_elems: int = 4096, gate: float = 1e-3,
                     per_channel: bool = False, threshold: float = 0.4,
                     min_pitch: int = 24, verbose: bool = False,
                     verify_windows=None, activation_scales=None,
                     proxy_margin: float = 2.0):
    """Find an int8 policy that PASSES the drift gate on this checkpoint.

    Uniform static W8A8 does not fit every trained checkpoint: measured
    on the trained flagship-family checkpoints, static per-recording
    calibration passes the 1e-3 worst-of-25-measures gate on SAUnet
    (6.5e-4) but FAILS on PUnet (1.8e-3, threshold-adjacent rounding
    noise that margins/percentiles/per-channel scales don't fix —
    perf/gated_mode_experiment.py). Rather than refusing, this searches
    the fallback ladder per checkpoint:

      1. full static (fastest) — return if the gate passes;
      2. rank each quantized layer's standalone damage (quantize ONLY
         that layer, max |pred - f32| on the calibration windows);
      3. demote the most damaging layers, in damage order, to exact f32
         (``exclude``), re-measuring the gate after each demotion —
         layers that stay quantized keep their static scales;
      4. if everything int8-eligible ends up excluded the result is the
         exact f32 forward (drift 0), so termination with a passing
         report is guaranteed.

    ``verify_windows`` decouples gate VERIFICATION from scale
    CALIBRATION: scales come from ``cal_windows`` (e.g. the first
    protocol batches — range estimation is insensitive to position),
    but the drift reports and damage ranking run on ``verify_windows``
    (default: the calibration windows). Measured to matter on the
    trained PUnet: verifying on the same leading windows passed the
    proxy at 5e-5 while the whole-recording TRUE drift was 1.16e-3 —
    the flipping frames lived outside the verified span. Spreading
    windows across the recording is NOT enough either: on the trained
    exp180e checkpoint 6-of-12 spread windows passed at 8.9e-4 while
    the full-span drift was 1.83e-3
    (perf/results_r5_fullsize_trained_gate.txt). Pass the protocol's
    own batching of the WHOLE recording (``_gate_verify_windows``, what
    :func:`predict_framewise_int8` does) so the proxy has no spatial
    blind spot at all.

    ``proxy_margin`` covers the proxy's remaining (non-spatial) bias:
    pseudo-targets under-read TRUE-target drift even on full-span
    verification — measured on the trained exp180e checkpoint, proxy
    6.7e-4 vs true 1.19e-3 (~1.8x). The search therefore demotes until
    the proxy clears ``gate / proxy_margin`` (default 2.0; the returned
    report's ``gate``/``passed`` reflect the margined criterion). Set
    ``proxy_margin=1.0`` to gate the proxy at face value, e.g. when the
    caller verifies true drift itself.

    Demoting straight to f32 (not to dynamic scales) is deliberate: with
    per-recording calibration there is no distribution shift for dynamic
    scales to fix, so a layer whose static drift breaks the gate is
    drifting from 8-bit ROUNDING, which dynamic quantization shares
    (measured: dynamic 8e-4 vs per-recording-static 6.5e-4 on SAUnet —
    same regime). Keeping a handful of convs in f32 costs their share of
    FLOPs but preserves the int8 speed of everything else.

    ``activation_scales`` skips the internal calibration when the caller
    already holds scales for ``cal_windows`` (e.g. from
    :func:`calibrate_with_predictions`); the dict is copied, not
    mutated.

    Returns ``(policy, report)`` where ``policy`` is a dict with
    ``activation_scales`` / ``exclude`` (the f32-fallback paths in
    demotion order) / ``min_kernel_elems`` — splattable into
    :func:`quantized_apply_fn` as ``quantized_apply_fn(model,
    **policy)`` — and ``report`` is the passing
    :func:`int8_drift_report`.
    """
    scales = (dict(activation_scales) if activation_scales is not None
              else calibrate_activation_scales(model, variables,
                                               cal_windows,
                                               min_kernel_elems,
                                               per_channel=per_channel))
    verify = cal_windows if verify_windows is None else verify_windows
    # the search gates the PROXY at gate/proxy_margin: pseudo-targets
    # under-read true-target drift by up to ~1.8x even with full-span
    # verification (measured, trained exp180e: proxy 6.7e-4 while true
    # drift was 1.19e-3 — perf/results_r5_fullsize_trained_gate_fullspan
    # .txt; the r3 calibration study saw the two track closely on small
    # checkpoints, so the margin costs nothing there: a policy passing
    # gate/2 on the proxy is simply a couple of demotions deeper).
    search_gate = gate / proxy_margin
    report = int8_drift_report(model, variables, verify, scales,
                               min_kernel_elems, threshold, min_pitch,
                               search_gate)
    demoted = []
    if not report["passed"] and scales:
        f32_fn = jax.jit(lambda v, x: model.apply(v, x, train=False))
        pred_f = [np.asarray(_main(f32_fn(variables, jnp.asarray(x))))
                  for x in verify]
        # the "quantize ONLY layer k" probes must exclude every
        # interceptor-ELIGIBLE conv, not just the keys of `scales`: a
        # caller-supplied scales dict calibrated at a different
        # min_kernel_elems would otherwise leave uncovered convs running
        # dynamic int8 inside the damage measurement
        probe = _probe_for(model, min_kernel_elems, None, False, False)
        probe.jit(variables, jnp.asarray(verify[0]))
        all_paths = frozenset(probe.keys) | frozenset(scales)
        damage = {}
        # rank EVERY eligible conv, not just the keys of `scales`: an
        # eligible path with no caller-supplied scale runs DYNAMIC int8
        # in the served forward, so it drifts too and must be demotable
        # (otherwise the full-demotion => exact-f32 termination guarantee
        # below fails for caller-supplied scales dicts)
        for k in all_paths:     # quantize ONLY layer k: standalone damage
            only_k = quantized_apply_fn(
                model, min_kernel_elems,
                {k: scales[k]} if k in scales else {}, all_paths - {k})
            only_k = jax.jit(only_k)
            damage[k] = max(
                float(np.abs(np.asarray(_main(only_k(variables,
                                               jnp.asarray(x)))) - pf).max())
                for x, pf in zip(verify, pred_f))
        if verbose:
            for k in sorted(damage, key=damage.get, reverse=True):
                print(f"  standalone damage {k:40s} {damage[k]:.5f}")
        for k in sorted(damage, key=damage.get, reverse=True):
            demoted.append(k)
            scales.pop(k, None)   # absent keys were running dynamic int8
            report = int8_drift_report(
                model, variables, verify, scales, min_kernel_elems,
                threshold, min_pitch, search_gate, exclude=demoted)
            if verbose:
                print(f"  demoted {k} -> worst {report['worst']:.5f} "
                      f"{'PASS' if report['passed'] else 'fail'}")
            if report["passed"]:
                break
    policy = dict(activation_scales=scales, exclude=tuple(demoted),
                  min_kernel_elems=min_kernel_elems)
    return policy, report


def _gate_verify_windows(xp, t, batch_size, context):
    """The drift gate's verification set: the protocol's OWN batching of
    the whole recording — consecutive ``batch_size``-frame groups plus
    the natural-size tail, so :func:`int8_drift_report`'s concatenated
    predictions are exactly the frames :func:`predict_framewise` serves,
    every frame once. Anything sparser has a measured blind spot: on the
    trained exp180e checkpoint, windows spread over half the recording
    passed the proxy gate at 8.9e-4 while the full-span drift was
    1.83e-3 (perf/results_r5_fullsize_trained_gate.txt)."""
    from ..data.windows import gather_windows

    half = context // 2
    return [gather_windows(
        xp, jnp.asarray(half + s + np.arange(min(batch_size, t - s))),
        context)
        for s in range(0, t, batch_size)]


def _main(y):
    """First output of a possibly-multi-head forward (PUnet returns
    ``(salience, polyphony)``)."""
    return y[0] if isinstance(y, tuple) else y


def predict_framewise_int8(model, variables, inputs, context: int = 75,
                           batch_size: int = 50, compression=10.0,
                           group=None, cal_batches: int = 4,
                           per_channel: bool = False,
                           min_kernel_elems: int = 4096, gate: float = None,
                           reuse_cal_predictions: bool = True,
                           **predict_kwargs):
    """Whole-recording framewise prediction in the gated int8 serving
    mode: per-RECORDING calibration (activation scales from the first
    ``cal_batches`` protocol window batches of this recording),
    per-TENSOR static scales by default (per-channel is available but
    measured WORSE at the worst-measure gate on trained checkpoints: the
    channel scales fold into the kernel and coarsen per-output-channel
    weight quantization — perf/gated_mode_experiment), then the windowed
    protocol with W8A8 convs. This is the policy bench.py times and
    perf/gated_mode_experiment.py measures on trained flagship-family
    checkpoints (worst-of-25-measures drift vs the f32 protocol: SAUnet
    6.5e-4 PASS; PUnet 1.8e-3 — checkpoints where uniform static int8
    misses the gate need ``gate=``). Same signature semantics as
    :func:`~multipitch_architectures_tpu.eval.predict_framewise`.

    Per-recording serving economics (both measured, bench.py):

    - the calibration pass is not dead weight: it is an exact f32
      protocol forward over the calibration span, so by default its
      predictions are RETURNED for those frames and the int8 pass
      starts after them (``reuse_cal_predictions``) — calibration then
      costs one probe dispatch instead of an extra ~8 % of a
      60-s recording's window work (and the calibration span is exact);
    - the int8 executable takes the scales as traced ARGUMENTS
      (:func:`quantized_serving_fn`), so the first recording compiles it
      and every later recording reuses it — baking each recording's
      scales into a fresh closure would recompile the full windowed
      forward per recording.

    Args:
        gate: if set (e.g. 1e-3), verify the policy on windows spread
            across the recording and auto-demote drift-dominating layers
            to f32 until the measure drift passes
            (:func:`auto_hybrid_int8`) — a self-gating serving call at
            the cost of the search's extra compiles on the first
            recording.
        reuse_cal_predictions: serve the calibration-span frames from
            the calibration pass's exact f32 outputs (default). Only
            full unclipped calibration batches are reused — their batch
            composition equals the reference loader's, so the spliced
            output is protocol-composed everywhere (f32-exact on the
            calibration span, int8 after it).
    """
    from ..data.windows import gather_windows
    from .inference import _pad_inputs, predict_framewise

    x = jnp.asarray(inputs, jnp.float32)
    if compression is not None:
        x = jnp.log1p(compression * x)
    half = context // 2
    xp = _pad_inputs(x, context)      # the protocol's (half, half+1) pad
    t = x.shape[1]

    # Calibration batches = the first protocol batches. Full batches
    # fuse into ONE probe dispatch when the attention is grouped
    # (cross_batch:<group> keeps the reference composition for any
    # multiple of the group); without `group` the composition of each
    # dispatch must BE one reference batch, so they stay separate.
    n_cal = min(cal_batches, -(-t // batch_size))
    n_full = min(cal_batches, t // batch_size)
    cal = []
    if group is not None and n_full:
        cal.append(gather_windows(
            xp, jnp.asarray(half + np.arange(n_full * batch_size)),
            context))
    else:
        for b in range(n_full):
            cal.append(gather_windows(
                xp, jnp.asarray(half + batch_size * b
                                + np.arange(batch_size)), context))
    for b in range(n_full, n_cal):      # clipped (short recording): used
        centers = np.minimum(          # for scales only, never reused
            half + batch_size * b + np.arange(batch_size), half + t - 1)
        cal.append(gather_windows(xp, jnp.asarray(centers), context))

    scales, cal_preds = calibrate_with_predictions(
        model, variables, cal, min_kernel_elems, per_channel=per_channel)

    exclude = ()
    if gate is not None:
        # gate verdicts on the FULL protocol span. Spread-window
        # verification measurably under-reads true drift: on the
        # trained exp180e checkpoint, 6-of-12 windows spread across the
        # recording passed the proxy at 8.9e-4 while the whole-recording
        # drift was 1.83e-3 (perf/results_r5_fullsize_trained_gate.txt,
        # r5 rerun) — the blind spot the round-3 spreading fix closed
        # for the small PUnet reopens at scale. Full-span verify is the
        # protocol's own batching (natural-size tail), so the drift
        # report concatenates to exactly the served output stream.
        verify = _gate_verify_windows(xp, t, batch_size, context)
        policy, report = auto_hybrid_int8(model, variables, cal,
                                          min_kernel_elems, gate,
                                          per_channel=per_channel,
                                          verify_windows=verify,
                                          activation_scales=scales)
        scales, exclude = policy["activation_scales"], policy["exclude"]
        if not report["passed"]:   # unreachable by construction (full
            import warnings        # demotion = exact f32), but a gated
            warnings.warn(         # serve must never fail SILENTLY
                f"int8 gate NOT met after hybrid search (worst drift "
                f"{report['worst']:.2e} > gate {gate:.0e}); serving the "
                f"best policy found", RuntimeWarning)

    apply_fn = quantized_serving_fn(model, min_kernel_elems,
                                    tuple(exclude))
    vq = dict(variables)
    vq[SCALES_COLLECTION] = {k: jnp.asarray(v, jnp.float32)
                             for k, v in scales.items()}

    start_frame = n_full * batch_size if reuse_cal_predictions else 0
    return_aux = bool(predict_kwargs.get("return_aux"))
    # reused rows come from the FULL batches only (cal_preds rows beyond
    # them belong to clipped batches and are never counted here)
    if start_frame >= t:                 # whole recording was calibrated
        main = np.concatenate([p for p, _ in cal_preds], axis=0)[:t]
        if return_aux:
            return main, np.concatenate([a for _, a in cal_preds],
                                        axis=0)[:t]
        return main
    rest = predict_framewise(apply_fn, vq, x, context=context,
                             batch_size=batch_size, compression=None,
                             group=group, start_frame=start_frame,
                             **predict_kwargs)
    if not start_frame:
        return rest
    main = np.concatenate([p for p, _ in cal_preds],
                          axis=0)[:start_frame]
    if return_aux:
        rest_main, rest_aux = rest
        aux = np.concatenate([a for _, a in cal_preds],
                             axis=0)[:start_frame]
        return (np.concatenate([main, rest_main], axis=0),
                np.concatenate([aux, rest_aux], axis=0))
    return np.concatenate([main, rest], axis=0)


SCALES_COLLECTION = "int8_scales"


@functools.lru_cache(maxsize=64)
def quantized_serving_fn(model, min_kernel_elems: int = 4096, exclude=()):
    """Compile-once int8 forward for per-recording calibrated serving.

    Returns ``(variables, x) -> y`` like :func:`quantized_apply_fn`, but
    the static activation scales are read from a ``'int8_scales'`` entry
    INSIDE the variables pytree (``{module-path: scale}``) instead of
    being baked into the closure. Scales are then traced jit arguments:
    one compiled executable serves every recording, and per-recording
    calibration only changes argument VALUES. A fresh
    ``quantized_apply_fn`` closure per recording would recompile the
    whole windowed forward each time (jit treats ``apply_fn`` as a
    static argument keyed by identity — minutes per recording through a
    relayed TPU backend). The function itself is cached per
    (model, policy) for the same reason.

    Layers absent from the scales dict run DYNAMIC per-call scales;
    ``exclude`` paths stay exact f32 (hybrid policies,
    :func:`auto_hybrid_int8`).
    """

    def apply_fn(variables, x):
        variables = dict(variables)
        scales = variables.pop(SCALES_COLLECTION, None)
        interceptor = make_int8_interceptor(min_kernel_elems, scales,
                                            exclude)
        with nn.intercept_methods(interceptor):
            return model.apply(variables, x, train=False)

    return apply_fn


def quantized_apply_fn(model, min_kernel_elems: int = 4096,
                       activation_scales=None, exclude=()):
    """``(variables, x) -> y`` forward with int8 convs — a drop-in for
    the ``apply_fn`` taken by ``predict_framewise`` / ``serve``.
    jit-compatible (interception happens at trace time). Pass
    ``activation_scales`` from :func:`calibrate_activation_scales` for
    the faster static-scale mode; ``exclude`` paths stay exact f32
    (hybrid policies from :func:`auto_hybrid_int8`)."""

    interceptor = make_int8_interceptor(min_kernel_elems,
                                        activation_scales, exclude)

    def apply_fn(variables, x):
        with nn.intercept_methods(interceptor):
            return model.apply(variables, x, train=False)

    return apply_fn
