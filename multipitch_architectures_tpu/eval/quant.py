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
pipeline (v5e, round 3, tails included): dynamic +1.6% (the per-call
max re-reads every activation tensor), calibrated static +11%
(40.8x -> 45.4x real-time, bench.py). NOT protocol-exact: an opt-in
serving mode whose accuracy cost must be measured per checkpoint — the
export CLI enforces this via :func:`int8_drift_report` (refuses >1e-3
drift). Calibration policy matters (perf/int8_calibration_study.py,
trained checkpoints): TRAINING-set static scales fail the 1e-3 measure
gate at every margin/percentile tried (1.2e-3..1.2e-2); dynamic passes
(8e-4); per-RECORDING calibration (scales from the recording being
served, perf/gated_mode_experiment.py) is the fast gated policy.
"""

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
    (per-input-channel). Per-channel costs ZERO runtime: each channel
    scale folds into the kernel's Cin axis BEFORE per-output-channel
    weight quantization, so the conv itself and the (Cout,) dequantize
    are unchanged — only trace-time constants differ
    (sum_cin (x/s_c)·(w·s_c) == sum_cin x·w exactly). It quantizes
    activations finer but the folded kernel's wider per-output-channel
    range coarsens WEIGHT quantization, so which policy drifts less is
    an empirical per-checkpoint question — measured on trained
    checkpoints by perf/gated_mode_experiment.py."""
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
                          activation_scales=None):
    """Interceptor quantizing every plain ``nn.Conv`` whose kernel holds
    at least ``min_kernel_elems`` weights (the tiny 1x1 shortcuts and
    1xK heads stay f32 by default; dilated/grouped convs always stay
    f32). With ``activation_scales`` (a {module-path: scale} dict from
    :func:`calibrate_activation_scales`) the static-scale kernels are
    used; otherwise scales are dynamic."""

    def interceptor(next_fun, args, kwargs, context):
        mod = context.module
        if (isinstance(mod, nn.Conv) and context.method_name == "__call__"
                and "params" in mod.variables):
            kernel = mod.variables["params"]["kernel"]
            if kernel.size >= min_kernel_elems and _plain_conv(mod):
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
    import jax as _jax

    keys = []

    def probe(v, x):
        del keys[:]                                      # trace-time reset
        captured = []

        def capture(next_fun, args, kwargs, context):
            mod = context.module
            if (isinstance(mod, nn.Conv)
                    and context.method_name == "__call__"
                    and "params" in mod.variables
                    and mod.variables["params"]["kernel"].size
                    >= min_kernel_elems and _plain_conv(mod)):
                keys.append("/".join(mod.path))
                a = jnp.abs(args[0])
                if per_channel:              # (B,H,W,Cin) -> (Cin,)
                    red = tuple(range(a.ndim - 1))
                    captured.append(
                        jnp.percentile(a, percentile, axis=red)
                        if percentile is not None else jnp.max(a, axis=red))
                else:
                    captured.append(
                        jnp.percentile(a, percentile)
                        if percentile is not None else jnp.max(a))
            return next_fun(*args, **kwargs)

        with nn.intercept_methods(capture):
            model.apply(v, x, train=False)
        return captured                       # list pytree (ragged shapes)

    probe_jit = _jax.jit(probe)
    maxes = {}
    for x in sample_inputs:
        vals = [np.asarray(v) for v in probe_jit(variables, jnp.asarray(x))]
        # `keys` holds the most recent trace's order; cached calls keep it
        for k, v in zip(list(keys), vals):
            maxes[k] = np.maximum(maxes.get(k, 0.0), v)
    if per_channel:
        return {k: np.maximum(v * margin, 1e-12).astype(np.float32) / 127.0
                for k, v in maxes.items()}
    return {k: max(float(v) * margin, 1e-12) / 127.0
            for k, v in maxes.items()}


DRIFT_GATE_MEASURES = (
    "precision", "recall", "f_measure", "cosine_sim",
    "binary_crossentropy", "euclidean_distance", "binary_accuracy",
    "soft_accuracy", "accum_energy", "roc_auc_measure",
    "average_precision_score")


def int8_drift_report(model, variables, cal_windows, activation_scales=None,
                      min_kernel_elems: int = 4096, threshold: float = 0.4,
                      min_pitch: int = 24, gate: float = 1e-3):
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
                                      activation_scales))

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


def predict_framewise_int8(model, variables, inputs, context: int = 75,
                           batch_size: int = 50, compression=10.0,
                           group=None, cal_batches: int = 4,
                           per_channel: bool = False,
                           min_kernel_elems: int = 4096, **predict_kwargs):
    """Whole-recording framewise prediction in the gated int8 serving
    mode: per-RECORDING calibration (activation scales from the first
    ``cal_batches`` protocol window batches of this recording — one
    amortized f32 pass), per-TENSOR static scales by default (per-channel
    is available but measured WORSE at the worst-measure gate on trained
    checkpoints: the channel scales fold into the kernel and coarsen
    per-output-channel weight quantization — perf/gated_mode_experiment),
    then the windowed protocol with W8A8 convs. This is exactly the
    policy bench.py times and perf/gated_mode_experiment.py gates
    (worst-of-25-measures drift ≤1e-3 vs the f32 protocol on trained
    flagship-family checkpoints). Same signature semantics as
    :func:`~multipitch_architectures_tpu.eval.predict_framewise`.
    """
    from ..data.windows import gather_windows
    from .inference import predict_framewise

    x = jnp.asarray(inputs, jnp.float32)
    if compression is not None:
        x = jnp.log1p(compression * x)
    half = context // 2
    xp = jnp.pad(x, ((0, 0), (half, half + 1), (0, 0)))
    t = x.shape[1]
    cal = []
    for b in range(min(cal_batches, -(-t // batch_size))):
        centers = np.minimum(half + batch_size * b + np.arange(batch_size),
                             half + t - 1)
        cal.append(gather_windows(xp, jnp.asarray(centers), context))
    scales = calibrate_activation_scales(
        model, variables, cal, min_kernel_elems=min_kernel_elems,
        per_channel=per_channel)
    apply_fn = quantized_apply_fn(model, min_kernel_elems, scales)
    return predict_framewise(apply_fn, variables, x, context=context,
                             batch_size=batch_size, compression=None,
                             group=group, **predict_kwargs)


def quantized_apply_fn(model, min_kernel_elems: int = 4096,
                       activation_scales=None):
    """``(variables, x) -> y`` forward with int8 convs — a drop-in for
    the ``apply_fn`` taken by ``predict_framewise`` / ``serve``.
    jit-compatible (interception happens at trace time). Pass
    ``activation_scales`` from :func:`calibrate_activation_scales` for
    the faster static-scale mode."""

    interceptor = make_int8_interceptor(min_kernel_elems,
                                        activation_scales)

    def apply_fn(variables, x):
        with nn.intercept_methods(interceptor):
            return model.apply(variables, x, train=False)

    return apply_fn
