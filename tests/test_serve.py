"""AOT serving artifacts: export → serialize → deserialize → call parity."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from multipitch_architectures_tpu.models import (BasicCnnSegmSigmoid,
                                                 SimpleUNetDoubleSelfAttn)
from multipitch_architectures_tpu.serve import (export_window_forward,
                                                load_window_forward,
                                                predict_framewise_exported)


def _cnn():
    model = BasicCnnSegmSigmoid(n_chan_layers=(8, 8, 4, 2), n_bins_out=72)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 6, 75, 216)), train=False)
    return model, variables


def test_export_roundtrip_matches_direct_apply(tmp_path):
    model, variables = _cnn()
    apply_fn = lambda v, xw: model.apply(v, xw, train=False)
    blob = export_window_forward(apply_fn, variables, batch_size=4)
    path = tmp_path / "cnn_b4.stablehlo"
    path.write_bytes(blob)

    fn = load_window_forward(path.read_bytes())
    x = np.random.RandomState(0).rand(4, 6, 75, 216).astype(np.float32)
    got = np.asarray(fn(x))
    want = np.asarray(apply_fn(variables, jnp.asarray(x))).reshape(4, -1)
    assert got.shape == (4, 72)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_exported_framewise_matches_predict_framewise():
    """Whole-recording serving through the artifact reproduces the
    in-process protocol path for a batch-composition-independent model
    (incl. the duplicate-padded tail, which is exact for such models)."""
    from multipitch_architectures_tpu.eval import predict_framewise

    model, variables = _cnn()
    apply_fn = lambda v, xw: model.apply(v, xw, train=False)
    fn = load_window_forward(
        export_window_forward(apply_fn, variables, batch_size=8))

    inputs = np.random.RandomState(1).rand(6, 21, 216).astype(np.float32)
    got = predict_framewise_exported(fn, inputs, batch_size=8)
    want = predict_framewise(apply_fn, variables, inputs, batch_size=8)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_export_grouped_attention_model():
    """Cross-batch-attention checkpoints export with the block-diagonal
    grouped variant so each dispatch is reference-batch-exact."""
    kw = dict(n_chan_layers=(8, 8, 4, 2), n_bins_out=72, scalefac=16,
              embed_dim=32, num_heads=8, mlp_dim=64,
              pos_encoding="sinusoidal")
    plain = SimpleUNetDoubleSelfAttn(**kw)
    grouped = SimpleUNetDoubleSelfAttn(**kw, attn_mode="cross_batch:4")
    variables = plain.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 6, 75, 216)), train=False)

    fn = load_window_forward(export_window_forward(
        lambda v, xw: grouped.apply(v, xw, train=False), variables,
        batch_size=8))
    x = np.random.RandomState(2).rand(8, 6, 75, 216).astype(np.float32)
    got = np.asarray(fn(x))
    # two independent reference batches of 4
    want = np.concatenate([
        np.asarray(plain.apply(variables, jnp.asarray(x[:4]),
                               train=False)).reshape(4, -1),
        np.asarray(plain.apply(variables, jnp.asarray(x[4:]),
                               train=False)).reshape(4, -1)])
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_export_int8_quantized_apply():
    """The W8A8 serving mode composes with AOT export: the artifact
    reproduces the in-process quantized forward exactly."""
    from multipitch_architectures_tpu.eval import (
        calibrate_activation_scales, quantized_apply_fn)

    model, variables = _cnn()
    x = np.random.RandomState(4).rand(4, 6, 75, 216).astype(np.float32)
    scales = calibrate_activation_scales(model, variables,
                                         [jnp.asarray(x)])
    q_apply = quantized_apply_fn(model, activation_scales=scales)
    fn = load_window_forward(
        export_window_forward(q_apply, variables, batch_size=4))
    got = np.asarray(fn(x))
    want = np.asarray(jax.jit(q_apply)(variables,
                                       jnp.asarray(x))).reshape(4, -1)
    np.testing.assert_array_equal(got, want)


def test_export_multi_platform_artifact():
    """Artifacts lowered for several platforms deserialize and run on
    whichever platform is active (the deploy-anywhere story)."""
    model, variables = _cnn()
    apply_fn = lambda v, xw: model.apply(v, xw, train=False)
    blob = export_window_forward(apply_fn, variables, batch_size=2,
                                 platforms=("cpu", "tpu"))
    fn = load_window_forward(blob)
    x = np.random.RandomState(7).rand(2, 6, 75, 216).astype(np.float32)
    got = np.asarray(fn(x))
    want = np.asarray(apply_fn(variables, jnp.asarray(x))).reshape(2, -1)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_artifact_header_metadata_and_legacy_blobs():
    """Artifacts carry a JSON header (batch-composition mode + shapes +
    caller metadata); raw StableHLO blobs without a header still load."""
    from jax import export as jexport

    model, variables = _cnn()
    apply_fn = lambda v, xw: model.apply(v, xw, train=False)
    blob = export_window_forward(apply_fn, variables, batch_size=4,
                                 batch_mode="grouped:2",
                                 meta={"model": "basic_cnn_segm_sigmoid"})
    fn = load_window_forward(blob)
    assert fn.meta["batch_mode"] == "grouped:2"
    assert fn.meta["batch_size"] == 4 and fn.meta["context"] == 75
    assert fn.meta["model"] == "basic_cnn_segm_sigmoid"
    x = np.random.RandomState(0).rand(4, 6, 75, 216).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(fn(x)),
        np.asarray(apply_fn(variables, jnp.asarray(x))).reshape(4, -1),
        atol=1e-6)

    # legacy headerless blob (pre-header exports)
    def raw(xw):
        return apply_fn(variables, xw).reshape(xw.shape[0], -1)

    legacy = jexport.export(jax.jit(raw))(
        jax.ShapeDtypeStruct((4, 6, 75, 216), jnp.float32)).serialize()
    fn2 = load_window_forward(legacy)
    assert fn2.meta == {}
    np.testing.assert_array_equal(np.asarray(fn2(x)), np.asarray(fn(x)))

    import pytest as _pytest
    with _pytest.raises(ValueError, match="batch_mode"):
        export_window_forward(apply_fn, variables, batch_size=4,
                              batch_mode="bogus")
    with _pytest.raises(ValueError, match="multiple"):
        export_window_forward(apply_fn, variables, batch_size=4,
                              batch_mode="grouped:3")


def test_exported_tail_policy_by_batch_mode():
    """Duplicate-padded tails: silent for independent exports, warn for
    grouped exports only when the tail breaks a group, warn/refuse for
    plain cross-batch exports (the ADVICE r2 protocol-exactness hole)."""
    import warnings as _warnings

    import pytest as _pytest

    model, variables = _cnn()
    apply_fn = lambda v, xw: model.apply(v, xw, train=False)

    def make(mode):
        return load_window_forward(export_window_forward(
            apply_fn, variables, batch_size=4, batch_mode=mode))

    inputs = np.random.RandomState(1).rand(6, 10, 216).astype(np.float32)

    with _warnings.catch_warnings():
        _warnings.simplefilter("error")          # independent: no warning
        ind = predict_framewise_exported(make("independent"), inputs,
                                         batch_size=4)
    assert ind.shape == (10, 72)

    # grouped:2, tail 10 % 4 = 2 -> tail is one full group: exact, silent
    with _warnings.catch_warnings():
        _warnings.simplefilter("error")
        predict_framewise_exported(make("grouped:2"), inputs, batch_size=4)

    # tail 3 breaks the group: 1 affected frame -> warn; strict raises
    inputs11 = np.random.RandomState(2).rand(6, 11, 216).astype(np.float32)
    grouped = make("grouped:2")
    with _pytest.warns(UserWarning, match="last 1 frames"):
        predict_framewise_exported(grouped, inputs11, batch_size=4)
    with _pytest.raises(ValueError, match="last 1 frames"):
        predict_framewise_exported(grouped, inputs11, batch_size=4,
                                   strict=True)

    cb = make("cross_batch")
    with _pytest.warns(UserWarning, match="last 2 frames"):
        predict_framewise_exported(cb, inputs, batch_size=4)


def test_int8_drift_report_gate():
    """int8_drift_report: zero drift when quantization is a no-op, finite
    numbers for the real int8 path, and a failing gate for deliberately
    broken (clipping) calibration scales — the export-refusal evidence."""
    from multipitch_architectures_tpu.eval import int8_drift_report

    model, variables = _cnn()
    cal = [np.random.RandomState(5).rand(8, 6, 75, 216).astype(np.float32)
           for _ in range(2)]

    noop = int8_drift_report(model, variables, cal,
                             min_kernel_elems=1 << 30)
    assert noop["worst"] == 0.0 and noop["passed"]
    assert noop["pred_max"] == 0.0

    dyn = int8_drift_report(model, variables, cal)
    assert dyn["pred_max"] > 0.0 and np.isfinite(dyn["worst"])
    assert "Accuracy" in dyn["measures"]          # mir_eval block included

    # absurd static scales (1000x too small -> severe clipping)
    from multipitch_architectures_tpu.eval import calibrate_activation_scales
    scales = calibrate_activation_scales(model, variables, cal)
    broken = {k: v / 1000.0 for k, v in scales.items()}
    bad = int8_drift_report(model, variables, cal,
                            activation_scales=broken)
    assert not bad["passed"] and bad["worst"] > 1e-3


def test_export_cli_refuses_int8_drift(tmp_path):
    """The --int8 export CLI runs the drift gate and refuses when it
    fails; --allow-drift overrides (VERDICT r2 task 2)."""
    import argparse
    import sys as _sys

    _sys.path.insert(0, "examples")
    import export_serving_artifact as cli

    out = tmp_path / "a.stablehlo"
    base = dict(model="basic_cnn_segm_sigmoid",
                model_args='{"n_chan_layers":[8,8,4,2],"n_bins_out":72}',
                checkpoint=None, group=0, int8=True, calibrate_hcqt=None,
                calibrate_percentile=None, calibrate_margin=1.0,
                calibrate_per_channel=False, int8_hybrid=False,
                batch_size=4, platforms="", out=str(out),
                allow_drift=False, drift_gate=1e-3)

    # an impossible gate must refuse the export
    with pytest.raises(SystemExit, match="REFUSED"):
        cli.cmd_export(argparse.Namespace(**base, **{}) if False else
                       argparse.Namespace(**dict(base, drift_gate=1e-15)))
    assert not out.exists()

    # --allow-drift exports anyway, with a recorded int8 header
    cli.cmd_export(argparse.Namespace(**dict(base, drift_gate=1e-15,
                                             allow_drift=True)))
    fn = load_window_forward(out.read_bytes())
    assert fn.meta["int8"] is True
    assert fn.meta["batch_mode"] == "independent"


def test_export_cli_int8_calibrates_and_verifies_full_span(tmp_path,
                                                           capsys):
    """--int8 with --calibrate-hcqt: calibration uses the leading
    protocol batches and the drift gate verifies on the FULL recording
    (every 50-frame group + natural tail — the spread-window blind spot
    measured in perf/results_r5_fullsize_trained_gate.txt)."""
    import argparse
    import sys as _sys

    _sys.path.insert(0, "examples")
    import export_serving_artifact as cli

    hcqt = np.random.RandomState(3).rand(6, 60, 216).astype(np.float32)
    hpath = tmp_path / "h.npy"
    np.save(hpath, hcqt)
    out = tmp_path / "b.stablehlo"
    cli.cmd_export(argparse.Namespace(
        model="basic_cnn_segm_sigmoid",
        model_args='{"n_chan_layers":[8,8,4,2],"n_bins_out":72}',
        checkpoint=None, group=0, int8=True, calibrate_hcqt=str(hpath),
        calibrate_percentile=None, calibrate_margin=1.0,
        calibrate_per_channel=False, int8_hybrid=False, batch_size=4,
        platforms="", out=str(out), allow_drift=False, drift_gate=1e-3))
    assert out.exists()
    assert "drift on verification windows" in capsys.readouterr().out
