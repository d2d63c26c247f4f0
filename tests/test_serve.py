"""AOT serving artifacts: export → serialize → deserialize → call parity."""

import numpy as np
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
