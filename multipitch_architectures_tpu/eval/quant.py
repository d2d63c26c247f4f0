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
                     verify_windows=None):
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
    the flipping frames lived outside the verified span. Pass windows
    SPREAD across the recording to close the proxy's blind spot
    (perf/punet_hybrid_experiment.py).

    Demoting straight to f32 (not to dynamic scales) is deliberate: with
    per-recording calibration there is no distribution shift for dynamic
    scales to fix, so a layer whose static drift breaks the gate is
    drifting from 8-bit ROUNDING, which dynamic quantization shares
    (measured: dynamic 8e-4 vs per-recording-static 6.5e-4 on SAUnet —
    same regime). Keeping a handful of convs in f32 costs their share of
    FLOPs but preserves the int8 speed of everything else.

    Returns ``(policy, report)`` where ``policy`` is a dict with
    ``activation_scales`` / ``exclude`` (the f32-fallback paths in
    demotion order) / ``min_kernel_elems`` — splattable into
    :func:`quantized_apply_fn` as ``quantized_apply_fn(model,
    **policy)`` — and ``report`` is the passing
    :func:`int8_drift_report`.
    """
    scales = calibrate_activation_scales(model, variables, cal_windows,
                                         min_kernel_elems,
                                         per_channel=per_channel)
    verify = cal_windows if verify_windows is None else verify_windows
    report = int8_drift_report(model, variables, verify, scales,
                               min_kernel_elems, threshold, min_pitch, gate)
    demoted = []
    if not report["passed"] and scales:
        f32_fn = jax.jit(lambda v, x: model.apply(v, x, train=False))
        pred_f = [np.asarray(_main(f32_fn(variables, jnp.asarray(x))))
                  for x in verify]
        all_paths = frozenset(scales)
        damage = {}
        for k in scales:        # quantize ONLY layer k: standalone damage
            only_k = quantized_apply_fn(model, min_kernel_elems,
                                        {k: scales[k]}, all_paths - {k})
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
            scales.pop(k)
            report = int8_drift_report(
                model, variables, verify, scales, min_kernel_elems,
                threshold, min_pitch, gate, exclude=demoted)
            if verbose:
                print(f"  demoted {k} -> worst {report['worst']:.5f} "
                      f"{'PASS' if report['passed'] else 'fail'}")
            if report["passed"]:
                break
    policy = dict(activation_scales=scales, exclude=tuple(demoted),
                  min_kernel_elems=min_kernel_elems)
    return policy, report


def _main(y):
    """First output of a possibly-multi-head forward (PUnet returns
    ``(salience, polyphony)``)."""
    return y[0] if isinstance(y, tuple) else y


def predict_framewise_int8(model, variables, inputs, context: int = 75,
                           batch_size: int = 50, compression=10.0,
                           group=None, cal_batches: int = 4,
                           per_channel: bool = False,
                           min_kernel_elems: int = 4096, gate: float = None,
                           **predict_kwargs):
    """Whole-recording framewise prediction in the gated int8 serving
    mode: per-RECORDING calibration (activation scales from the first
    ``cal_batches`` protocol window batches of this recording — one
    amortized f32 pass), per-TENSOR static scales by default (per-channel
    is available but measured WORSE at the worst-measure gate on trained
    checkpoints: the channel scales fold into the kernel and coarsen
    per-output-channel weight quantization — perf/gated_mode_experiment),
    then the windowed protocol with W8A8 convs. This is exactly the
    policy bench.py times and perf/gated_mode_experiment.py measures on
    trained flagship-family checkpoints (worst-of-25-measures drift vs
    the f32 protocol: SAUnet 6.5e-4 PASS; PUnet 1.8e-3 — checkpoints
    where uniform static int8 misses the gate need ``gate=``). Same
    signature semantics as
    :func:`~multipitch_architectures_tpu.eval.predict_framewise`.

    Args:
        gate: if set (e.g. 1e-3), verify the policy on the calibration
            windows and auto-demote drift-dominating layers to f32 until
            the measure drift passes (:func:`auto_hybrid_int8`) — a
            self-gating serving call at the cost of the search's extra
            compiles on the first recording.
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
    if gate is not None:
        # verification windows SPREAD across the recording (the gate's
        # blind spot is content outside the leading calibration span)
        n_b = -(-t // batch_size)
        starts = np.unique(np.linspace(
            0, max(t - batch_size, 0),
            num=min(cal_batches, n_b)).astype(int))
        verify = [gather_windows(
            xp, jnp.asarray(np.minimum(half + s + np.arange(batch_size),
                                       half + t - 1)), context)
            for s in starts]
        policy, _ = auto_hybrid_int8(model, variables, cal,
                                     min_kernel_elems, gate,
                                     per_channel=per_channel,
                                     verify_windows=verify)
        apply_fn = quantized_apply_fn(model, **policy)
    else:
        scales = calibrate_activation_scales(
            model, variables, cal, min_kernel_elems=min_kernel_elems,
            per_channel=per_channel)
        apply_fn = quantized_apply_fn(model, min_kernel_elems, scales)
    return predict_framewise(apply_fn, variables, x, context=context,
                             batch_size=batch_size, compression=None,
                             group=group, **predict_kwargs)


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
