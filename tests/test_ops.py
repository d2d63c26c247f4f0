"""Tests for ops: pallas CQT kernel vs oracle, parallel mesh helpers."""

import numpy as np
import jax
import jax.numpy as jnp

from multipitch_architectures_tpu.ops.pallas_cqt import cqt_octave_pallas
from multipitch_architectures_tpu.parallel import (make_mesh, shard_params,
                                                   tensor_parallel_param_specs)


def test_pallas_cqt_octave_matches_oracle():
    rng = np.random.RandomState(0)
    hop, n_fft, bpo, t = 64, 512, 72, 300
    y = rng.rand(t * hop + n_fft).astype(np.float32)
    kr = (rng.randn(n_fft, 2 * bpo) * 0.01).astype(np.float32)
    out = np.asarray(cqt_octave_pallas(
        jnp.asarray(y), jnp.asarray(kr), hop=hop, n_fft=n_fft, bpo=bpo,
        n_frames=t, interpret=True))
    frames = np.stack([y[i * hop:i * hop + n_fft] for i in range(t)])
    ri = frames @ kr
    want = np.sqrt(ri[:, :bpo] ** 2 + ri[:, bpo:] ** 2 + 1e-30)
    np.testing.assert_allclose(out, want, atol=1e-5)


def test_cqt_pallas_path_matches_xla_path():
    import sys

    import multipitch_architectures_tpu.dsp  # noqa: F401

    cq = sys.modules["multipitch_architectures_tpu.dsp.cqt"]
    fs = 22050
    y = np.sin(2 * np.pi * 261.6 * np.arange(2 * fs) / fs).astype(np.float32)
    plan = cq.CqtPlan.create(fs, 512, 32.703, 216, 36)
    a = np.asarray(cq.cqt(y, plan))
    b = np.asarray(cq.cqt(y, plan, use_pallas=True))
    assert np.abs(a - b).max() / a.max() < 1e-5


def test_mesh_and_tp_specs():
    mesh = make_mesh(8, model_axis=2)
    assert dict(zip(mesh.axis_names, mesh.devices.shape)) == \
        {"data": 4, "model": 2}
    params = {
        "attention1": {"mlp1": {"kernel": jnp.zeros((32, 64)),
                                "bias": jnp.zeros((64,))},
                       "mlp2": {"kernel": jnp.zeros((64, 32))}},
        "conv": {"kernel": jnp.zeros((3, 3, 4, 8))},
    }
    specs = tensor_parallel_param_specs(params)
    from jax.sharding import PartitionSpec as P

    assert specs["attention1"]["mlp1"]["kernel"] == P(None, "model")
    assert specs["attention1"]["mlp2"]["kernel"] == P("model", None)
    assert specs["conv"]["kernel"] == P()

    sharded = shard_params(params, mesh)
    k = sharded["attention1"]["mlp1"]["kernel"]
    assert k.sharding.spec == P(None, "model")


def test_step_timer_and_summary():
    from multipitch_architectures_tpu.utils import StepTimer

    t = StepTimer(block=False)
    for _ in range(3):
        with t:
            pass
    s = t.summary(warmup=1)
    assert s["steps"] == 2 and s["mean_s"] >= 0


def test_model_summary_counts():
    from multipitch_architectures_tpu.models import BasicCnnSegmSigmoid
    from multipitch_architectures_tpu.utils import model_summary

    s = model_summary(BasicCnnSegmSigmoid(n_chan_layers=(20, 20, 10, 1),
                                          n_bins_out=72))
    assert "Total params: 48,255" in s


# ---------------------------------------------------------------------------
# grouped (block-diagonal) cross-batch attention
# ---------------------------------------------------------------------------

def test_grouped_cross_batch_attention_equals_separate_batches():
    """mode='cross_batch:<g>' on a k*g batch must reproduce k separate
    g-sized batches of plain cross_batch attention — the property that
    lets the windowed test protocol run in large fused dispatches."""
    from multipitch_architectures_tpu.ops.attention import \
        TorchMultiheadAttention

    e, s, g, k = 32, 7, 10, 3
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(k * g, s, e).astype(np.float32))

    plain = TorchMultiheadAttention(embed_dim=e, num_heads=4,
                                    mode="cross_batch")
    grouped = TorchMultiheadAttention(embed_dim=e, num_heads=4,
                                      mode=f"cross_batch:{g}")
    variables = plain.init(jax.random.PRNGKey(0), x[:g], x[:g], x[:g])

    want = np.concatenate([
        np.asarray(plain.apply(variables, x[i * g:(i + 1) * g],
                               x[i * g:(i + 1) * g], x[i * g:(i + 1) * g]))
        for i in range(k)])
    got = np.asarray(grouped.apply(variables, x, x, x))
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_grouped_attention_small_batch_falls_back_to_whole_batch():
    """A batch smaller than the group (the protocol's tail batch) attends
    over the whole batch, exactly like plain cross_batch."""
    from multipitch_architectures_tpu.ops.attention import \
        TorchMultiheadAttention

    e, s, b = 16, 5, 7
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(b, s, e).astype(np.float32))
    plain = TorchMultiheadAttention(embed_dim=e, num_heads=4,
                                    mode="cross_batch")
    grouped = TorchMultiheadAttention(embed_dim=e, num_heads=4,
                                      mode="cross_batch:50")
    variables = plain.init(jax.random.PRNGKey(0), x, x, x)
    np.testing.assert_allclose(
        np.asarray(grouped.apply(variables, x, x, x)),
        np.asarray(plain.apply(variables, x, x, x)), atol=1e-6)
