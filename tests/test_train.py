"""Tests for the training stack: early stopping + scheduler semantics vs
the torch/reference oracles, loss parity vs torch criteria, and a short
end-to-end fit on the 8-device CPU mesh."""

import logging

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from multipitch_architectures_tpu.data import (AugmentConfig, FileSpec,
                                               TrainPipeline)
from multipitch_architectures_tpu.models import (BasicCnnSegmSigmoid,
                                                 SimpleUNetPolyphonyClassifSoftmax)
from multipitch_architectures_tpu.train import (EarlyStopping,
                                                ReduceLROnPlateau,
                                                NoamSchedule, TrainConfig,
                                                Trainer, bce_loss,
                                                multitask_bce_ce_loss,
                                                polynomial_decay_lambda)

from conftest import REFERENCE_ROOT
import sys


def test_early_stopping_matches_reference():
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    try:
        # import the monitoring module directly: the libdl.metrics package
        # __init__ pulls in librosa/mir_eval, absent from this image
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "ref_monitoring", f"{REFERENCE_ROOT}/libdl/metrics/monitoring.py")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        ref_es = mod.early_stopping
    except Exception:
        pytest.skip("reference unavailable")
    seq = [1.0, 0.9, 0.95, 0.91, 0.89, 0.94, 0.93, 0.92, 0.95, 0.96, 0.97,
           0.98]
    for patience in (2, 3, 5):
        ours = EarlyStopping("min", 1e-3, patience)
        ref = ref_es("min", 1e-3, patience)
        for v in seq:
            o = ours.step(v)
            r = ref.step(v)
            assert o == r, (patience, v)
            if o:
                break
            assert ours.curr_is_better(v) == ref.curr_is_better(v)


def test_early_stopping_nan_stops():
    es = EarlyStopping("min", 0, 5)
    assert not es.step(1.0)
    assert es.step(float("nan"))


def test_reduce_lr_on_plateau_matches_torch():
    import torch

    lin = torch.nn.Linear(2, 2)
    opt = torch.optim.AdamW(lin.parameters(), lr=1e-3)
    tsched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, mode="min", factor=0.5, patience=5, threshold=1e-4,
        threshold_mode="rel", cooldown=0, min_lr=1e-6, eps=1e-8)
    ours = ReduceLROnPlateau(1e-3, factor=0.5, patience=5, threshold=1e-4,
                             min_lr=1e-6)
    rng = np.random.RandomState(0)
    metric = 1.0
    for step in range(40):
        metric = metric * (0.99 if step < 10 else 1.001) \
            + rng.rand() * 1e-6
        tsched.step(metric)
        lr_ours = ours.step(metric)
        lr_torch = opt.param_groups[0]["lr"]
        assert lr_ours == pytest.approx(lr_torch, rel=1e-12), step


def test_polynomial_decay_lambda():
    f = polynomial_decay_lambda(1.0, 1e-2, 20, 0.5)
    assert f(0) == pytest.approx(1.0)
    assert f(20) == pytest.approx(1e-2)
    assert f(100) == pytest.approx(1e-2)
    assert f(10) == pytest.approx((1 - 1e-2) * (0.5) ** 0.5 + 1e-2)


def test_noam_rate():
    s = NoamSchedule(512, 4000)
    assert s.rate(1) == pytest.approx(512 ** -0.5 * 4000 ** -1.5)
    assert s.rate(4000) == pytest.approx(512 ** -0.5 * 4000 ** -0.5)


def test_noam_optax_schedule_matches_reference_per_step():
    """The reference noam_opt advances the rate on every optimizer.step()
    (lr_schedulers.py:26-31, _step starts at 1 and increments BEFORE
    computing the rate); the optax schedule must reproduce the exact
    per-step rate sequence."""
    import importlib.util

    import torch

    from multipitch_architectures_tpu.train.schedulers import \
        noam_optax_schedule

    spec = importlib.util.spec_from_file_location(
        "ref_lr", f"{REFERENCE_ROOT}/libdl/schedulers/lr_schedulers.py")
    mod = importlib.util.module_from_spec(spec)
    try:
        spec.loader.exec_module(mod)
    except Exception:
        pytest.skip("reference unavailable")

    lin = torch.nn.Linear(2, 2)
    ref = mod.noam_opt(256, 40, torch.optim.AdamW(lin.parameters(), lr=0.0))
    sched = noam_optax_schedule(256, 40)
    for count in range(120):  # crosses the warmup=40 knee
        ref.step()
        assert float(sched(count)) == pytest.approx(ref._rate, rel=1e-6), count


def test_trainer_noam_advances_per_step():
    """'Noam' must warm up per optimizer STEP (inside optax), not per
    epoch — an epoch-granular Noam would be wrong by ~steps-per-epoch in
    warmup horizon."""
    train_p, _ = _toy_pipelines(t=900)
    model = BasicCnnSegmSigmoid(n_chan_layers=(4, 4, 2, 1), n_bins_out=72)
    cfg = TrainConfig(max_epochs=2, batch_size=5, loss="bce",
                      scheduler="Noam",
                      scheduler_params={"model_size": 64, "warmup": 10},
                      early_stopping=False)
    tr = Trainer(model, cfg, logger=logging.getLogger("test"))
    state = tr.init(jnp.zeros((1, 6, 75, 216)))
    state, hist = tr.fit(lambda e, k: train_p.batches(k, 5), None,
                         state=state)
    n_steps = int(state.step)
    assert n_steps >= 4  # several optimizer steps ran
    # the reported rate tracks the optimizer step count, not the epoch
    assert tr.lr == pytest.approx(NoamSchedule(64, 10).rate(n_steps + 1))
    assert hist["lr"][0] != hist["lr"][1]


def test_val_in_train_mode_persists_bn_stats_matching_torch():
    """The reference's val loop never calls model.eval()
    (exp180d…py:340-352): every val forward ALSO advances the BatchNorm
    running statistics, and those mutated stats are what get checkpointed
    and used at test time. With ``val_in_train_mode=True`` the trainer
    must persist the same stats torch would produce.

    p_dropout=0 for determinism. torch stores the *unbiased* batch var in
    running_var while flax stores the biased one — an O(1/n_elems)
    difference covered by the tolerance."""
    from conftest import reference_models

    ref = reference_models()
    if ref is None:
        pytest.skip("reference torch models unavailable")
    import torch

    from multipitch_architectures_tpu.models import SimpleUNet, port

    torch.manual_seed(0)
    kw = dict(n_chan_layers=[8, 8, 4, 2], n_bins_out=72, scalefac=16,
              p_dropout=0.0)
    tm = ref.simple_u_net(**kw)
    variables = jax.tree.map(jnp.asarray, port.port_unet_auto(tm.state_dict()))

    model = SimpleUNet(**kw)
    cfg = TrainConfig(max_epochs=1, batch_size=8, loss="bce",
                      val_in_train_mode=True, early_stopping=False)
    tr = Trainer(model, cfg, logger=logging.getLogger("test"))
    state = tr.init(jnp.zeros((1, 6, 75, 216)))
    state = state.replace(params=variables["params"],
                          batch_stats=variables["batch_stats"])
    before = [np.asarray(v) for v in jax.tree.leaves(state.batch_stats)]

    rng = np.random.RandomState(3)
    x = rng.rand(8, 6, 75, 216).astype(np.float32)
    y = (rng.rand(8, 1, 1, 72) > 0.9).astype(np.float32)
    state, _ = tr.fit(lambda e, k: iter(()),  # no train batches
                      lambda e, k: iter([(jnp.asarray(x), jnp.asarray(y))]),
                      state=state)
    after = [np.asarray(v) for v in jax.tree.leaves(state.batch_stats)]
    assert any(np.abs(a - b).max() > 1e-6 for a, b in zip(before, after))

    tm.train()
    with torch.no_grad():
        tm(torch.from_numpy(x))
    want = port.port_unet_auto(tm.state_dict())["batch_stats"]
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-3, atol=1e-5),
        state.batch_stats, jax.tree.map(jnp.asarray, want))


def test_bce_loss_matches_torch():
    import torch

    rng = np.random.RandomState(0)
    p = rng.rand(8, 1, 1, 72).astype(np.float32)
    t = (rng.rand(8, 1, 1, 72) > 0.9).astype(np.float32)
    want = torch.nn.BCELoss()(torch.from_numpy(p), torch.from_numpy(t))
    got = bce_loss(jnp.asarray(p), jnp.asarray(t))
    assert float(got) == pytest.approx(float(want), rel=1e-6)


def test_multitask_loss_matches_torch():
    import torch

    rng = np.random.RandomState(0)
    y_pred = rng.rand(8, 1, 1, 72).astype(np.float32)
    y_true = (rng.rand(8, 1, 1, 72) > 0.9).astype(np.float32)
    n_pred = rng.randn(8, 24, 1, 1).astype(np.float32)

    n_target = torch.sum(torch.from_numpy(y_true), dim=-1,
                         keepdims=True).long().squeeze(3)
    want = (torch.nn.BCELoss()(torch.from_numpy(y_pred),
                               torch.from_numpy(y_true))
            + torch.nn.CrossEntropyLoss()(torch.from_numpy(n_pred),
                                          n_target) / 25.0)
    got = multitask_bce_ce_loss((jnp.asarray(y_pred), jnp.asarray(n_pred)),
                                jnp.asarray(y_true))
    assert float(got) == pytest.approx(float(want), rel=1e-5)


def test_multitask_loss_clips_out_of_range_polyphony():
    """A frame whose polyphony exceeds the head's class count (torch CE
    would device-assert) is clipped to the top class — the loss stays
    finite and equals torch's value with pre-clipped targets, and its
    gradient is finite (the default JAX gather would NaN-fill the loss
    while silently dropping those frames' gradients)."""
    import torch

    rng = np.random.RandomState(1)
    y_pred = rng.rand(4, 1, 1, 72).astype(np.float32)
    y_true = (rng.rand(4, 1, 1, 72) > 0.5).astype(np.float32)  # ~36 active
    n_pred = rng.randn(4, 24, 1, 1).astype(np.float32)

    got = multitask_bce_ce_loss((jnp.asarray(y_pred), jnp.asarray(n_pred)),
                                jnp.asarray(y_true))
    assert np.isfinite(float(got))

    n_target = torch.sum(torch.from_numpy(y_true), dim=-1,
                         keepdims=True).long().squeeze(3).clamp(max=23)
    want = (torch.nn.BCELoss()(torch.from_numpy(y_pred),
                               torch.from_numpy(y_true))
            + torch.nn.CrossEntropyLoss()(torch.from_numpy(n_pred),
                                          n_target) / 25.0)
    assert float(got) == pytest.approx(float(want), rel=1e-5)

    g = jax.grad(lambda n: multitask_bce_ce_loss(
        (jnp.asarray(y_pred), n), jnp.asarray(y_true)))(jnp.asarray(n_pred))
    assert np.isfinite(np.asarray(g)).all()

    # strict mode = the jit-compatible analogue of torch's device assert:
    # out-of-range labels poison the loss with NaN (surfaced by the
    # trainer's NaN-stop), in-range labels match the default mode
    from multipitch_architectures_tpu.train.losses import \
        cross_entropy_logits

    labels_bad = jnp.asarray(np.array([0, 5, 24, 3]))[:, None, None]
    labels_ok = jnp.asarray(np.array([0, 5, 23, 3]))[:, None, None]
    ce_bad = cross_entropy_logits(jnp.asarray(n_pred), labels_bad,
                                  strict=True)
    ce_ok = cross_entropy_logits(jnp.asarray(n_pred), labels_ok,
                                 strict=True)
    assert np.isnan(float(ce_bad))
    assert float(ce_ok) == pytest.approx(float(cross_entropy_logits(
        jnp.asarray(n_pred), labels_ok)), rel=1e-6)


def _toy_pipelines(seed=0, t=900):
    rng = np.random.RandomState(seed)
    files = [FileSpec(rng.rand(6, t, 216).astype(np.float32),
                      (rng.rand(t, 120) > 0.9).astype(np.float32))]
    aug = AugmentConfig(noisestd=1e-4, compression=10.0)
    train_p = TrainPipeline(files, stride=50, augment=aug,
                            target_slice=(24, 96))
    val_p = TrainPipeline(files, stride=120, target_slice=(24, 96))
    return train_p, val_p


def test_trainer_reduces_loss_and_checkpoints(tmp_path):
    train_p, val_p = _toy_pipelines()
    model = BasicCnnSegmSigmoid(n_chan_layers=(8, 8, 4, 2), n_bins_out=72)
    cfg = TrainConfig(max_epochs=3, batch_size=5, loss="bce", seed=0)
    tr = Trainer(model, cfg, logger=logging.getLogger("test"))
    state = tr.init(jnp.zeros((1, 6, 75, 216)))
    state, hist = tr.fit(
        lambda epoch, key: train_p.batches(key, 5),
        lambda epoch, key: val_p.batches(key, 5, shuffle=False),
        state=state, checkpoint_dir=str(tmp_path / "ckpt"))
    assert hist["train_loss"][-1] < hist["train_loss"][0]
    assert hist["val_loss"][-1] < hist["val_loss"][0]

    # restore roundtrip (full state incl. optimizer)
    from multipitch_architectures_tpu.train.trainer import _Checkpointer

    fresh = tr.init(jnp.zeros((1, 6, 75, 216)))
    restored, epoch, _lr, _metric = _Checkpointer(
        str(tmp_path / "ckpt")).restore(fresh)
    for a, b in zip(jax.tree.leaves(restored.params),
                    jax.tree.leaves(state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    assert epoch == 2


def test_trainer_multitask_punet():
    train_p, val_p = _toy_pipelines(t=600)
    model = SimpleUNetPolyphonyClassifSoftmax(
        n_chan_layers=(8, 8, 4, 2), n_bins_out=72, scalefac=16,
        num_polyphony_steps=24)
    cfg = TrainConfig(max_epochs=1, batch_size=5, loss="multitask", seed=0)
    tr = Trainer(model, cfg, logger=logging.getLogger("test"))
    state = tr.init(jnp.zeros((1, 6, 75, 216)))
    state, hist = tr.fit(lambda e, k: train_p.batches(k, 5),
                         lambda e, k: val_p.batches(k, 5, shuffle=False),
                         state=state)
    assert np.isfinite(hist["train_loss"][0])


def test_trainer_early_stops_on_plateau():
    train_p, val_p = _toy_pipelines(t=600)
    model = BasicCnnSegmSigmoid(n_chan_layers=(4, 4, 2, 1), n_bins_out=72)
    cfg = TrainConfig(max_epochs=50, batch_size=5, loss="bce",
                      initial_lr=0.0,  # loss cannot improve
                      es_patience=2, es_min_delta=1e-5)
    tr = Trainer(model, cfg, logger=logging.getLogger("test"))
    state = tr.init(jnp.zeros((1, 6, 75, 216)))
    state, hist = tr.fit(lambda e, k: train_p.batches(k, 5),
                         lambda e, k: val_p.batches(k, 5, shuffle=False),
                         state=state)
    assert len(hist["train_loss"]) <= 5  # stopped long before 50


def test_empty_val_iterator_reports_none_not_zero():
    """A val set smaller than the val batch size must not report val loss
    0.0 (which would gate checkpoints on a fake perfect metric)."""
    train_p, _ = _toy_pipelines(t=600)
    model = BasicCnnSegmSigmoid(n_chan_layers=(4, 4, 2, 1), n_bins_out=72)
    cfg = TrainConfig(max_epochs=1, batch_size=5, loss="bce")
    tr = Trainer(model, cfg, logger=logging.getLogger("test"))
    state = tr.init(jnp.zeros((1, 6, 75, 216)))
    state, hist = tr.fit(lambda e, k: train_p.batches(k, 5),
                         lambda e, k: iter(()),  # empty val iterator
                         state=state)
    assert hist["val_loss"] == [None]


def test_deterministic_resume_matches_straight_run(tmp_path):
    """True resume: train 2 epochs with checkpointing, restore the full
    state, continue with ``start_epoch`` — params bit-identical to a
    straight 4-epoch run. Works because PRNG streams are a pure function
    of (seed, epoch, batch index) and the checkpoint holds params +
    batch_stats + optimizer state + epoch + lr. (The reference cannot
    resume at all: weights-only torch.save, SURVEY §5.)"""
    from multipitch_architectures_tpu.train.trainer import _Checkpointer

    model = BasicCnnSegmSigmoid(n_chan_layers=(4, 4, 2, 1), n_bins_out=72)

    def data(epoch, key):
        for i in range(2):
            k = jax.random.fold_in(key, i)
            x = jax.random.uniform(k, (4, 6, 75, 216))
            y = (jax.random.uniform(jax.random.fold_in(k, 1),
                                    (4, 1, 1, 72)) > 0.9).astype(jnp.float32)
            yield x, y

    def cfg(max_epochs):
        return TrainConfig(max_epochs=max_epochs, batch_size=4,
                           scheduler=None, early_stopping=False,
                           loss="bce", seed=3)

    tr = Trainer(model, cfg(4))
    straight, _ = tr.fit(data, state=tr.init(jnp.zeros((1, 6, 75, 216))))

    tr2 = Trainer(model, cfg(2))
    tr2.fit(data, state=tr2.init(jnp.zeros((1, 6, 75, 216))),
            checkpoint_dir=str(tmp_path / "ck"))

    tr3 = Trainer(model, cfg(4))
    fresh = tr3.init(jnp.zeros((1, 6, 75, 216)))
    restored, epoch, lr, _m = _Checkpointer(str(tmp_path / "ck")).restore(fresh)
    assert epoch == 1 and lr == tr3.lr
    resumed, _ = tr3.fit(data, state=restored, start_epoch=epoch + 1)

    for a, b in zip(jax.tree.leaves(resumed.params),
                    jax.tree.leaves(straight.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_does_not_clobber_better_checkpoint(tmp_path):
    """A resumed run whose first epoch is WORSE than the restored best
    must not overwrite the best checkpoint (initial_best seeds the
    early-stopping best)."""
    model = BasicCnnSegmSigmoid(n_chan_layers=(4, 4, 2, 1), n_bins_out=72)

    def data(epoch, key):
        k = jax.random.fold_in(key, 0)
        x = jax.random.uniform(k, (4, 6, 75, 216))
        y = (jax.random.uniform(jax.random.fold_in(k, 1),
                                (4, 1, 1, 72)) > 0.9).astype(jnp.float32)
        yield x, y

    cfg = TrainConfig(max_epochs=1, batch_size=4, scheduler=None,
                      early_stopping=True, es_patience=3, loss="bce", seed=0)
    tr = Trainer(model, cfg)
    # initial_best far better than any achievable BCE loss -> no save
    tr.fit(data, state=tr.init(jnp.zeros((1, 6, 75, 216))),
           checkpoint_dir=str(tmp_path / "ck"), start_epoch=0,
           initial_best=1e-9)
    assert not (tmp_path / "ck" / "best").exists()

    # without a prior best the first epoch checkpoints (baseline save)
    tr2 = Trainer(model, cfg)
    tr2.fit(data, state=tr2.init(jnp.zeros((1, 6, 75, 216))),
            checkpoint_dir=str(tmp_path / "ck2"))
    assert (tmp_path / "ck2" / "best").exists()


def test_legacy_resume_without_metric_does_not_save_first_epoch(tmp_path):
    """Resuming from a checkpoint that carried NO metric (legacy/NaN →
    initial_best unseeded) must not checkpoint the first resumed epoch
    unconditionally — the on-disk best may be better than that epoch
    (ADVICE r2). The unconditional baseline save is reserved for FRESH
    runs (start_epoch == 0); see the companion test above for the fresh
    and seeded-resume behaviors."""
    model = BasicCnnSegmSigmoid(n_chan_layers=(4, 4, 2, 1), n_bins_out=72)

    def data(epoch, key):
        k = jax.random.fold_in(key, 0)
        x = jax.random.uniform(k, (4, 6, 75, 216))
        y = (jax.random.uniform(jax.random.fold_in(k, 1),
                                (4, 1, 1, 72)) > 0.9).astype(jnp.float32)
        yield x, y

    cfg = TrainConfig(max_epochs=2, batch_size=4, scheduler=None,
                      early_stopping=True, es_patience=3, loss="bce", seed=0)
    tr = Trainer(model, cfg)
    # max_epochs=2 / start_epoch=1: exactly ONE resumed epoch runs
    tr.fit(data, state=tr.init(jnp.zeros((1, 6, 75, 216))),
           checkpoint_dir=str(tmp_path / "ck"), start_epoch=1,
           initial_best=None)
    assert not (tmp_path / "ck" / "best").exists()


def test_restore_accepts_pre_lr_metric_checkpoints(tmp_path):
    """Checkpoints written before the lr/metric fields existed restore
    with defaults instead of raising."""
    from multipitch_architectures_tpu.train.trainer import _Checkpointer

    model = BasicCnnSegmSigmoid(n_chan_layers=(4, 4, 2, 1), n_bins_out=72)
    tr = Trainer(model, TrainConfig(max_epochs=1, batch_size=2, loss="bce"))
    state = tr.init(jnp.zeros((1, 6, 75, 216)))

    ck = _Checkpointer(str(tmp_path / "old"))
    legacy = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
        "epoch": jnp.asarray(3),
    }
    import os
    ck._ckptr.save(os.path.join(ck.dir, "best"), legacy, force=True)
    ck._ckptr.wait_until_finished()

    restored, epoch, lr, metric = ck.restore(state)
    assert epoch == 3 and lr == 0.0 and np.isnan(metric)


def test_val_in_train_ragged_batch_bn_stats_exact():
    """With val_in_train_mode, a ragged val batch (not divisible by the
    mesh) must produce the same persisted BatchNorm running stats as a
    single-device run — padding must not enter the statistics."""
    from multipitch_architectures_tpu.models import SimpleUNetLargeKernels
    from multipitch_architectures_tpu.parallel import make_mesh

    model = SimpleUNetLargeKernels(n_chan_layers=(8, 8, 4, 2),
                                   n_bins_out=72, scalefac=16)
    rng = np.random.RandomState(0)
    vx = rng.rand(5, 6, 75, 216).astype(np.float32)   # 5 % 8 != 0
    vy = (rng.rand(5, 1, 1, 72) > 0.9).astype(np.float32)

    def stats_for(mesh):
        cfg = TrainConfig(max_epochs=1, batch_size=5, loss="bce",
                          val_in_train_mode=True, early_stopping=False,
                          scheduler=None, seed=0)
        tr = Trainer(model, cfg, mesh=mesh)
        state = tr.init(jnp.zeros((1, 6, 75, 216)))
        state, _ = tr.fit(lambda e, k: iter(()),
                          lambda e, k: iter([(jnp.asarray(vx),
                                              jnp.asarray(vy))]),
                          state=state)
        return jax.tree.leaves(state.batch_stats)

    for a, b in zip(stats_for(make_mesh(8)), stats_for(make_mesh(1))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6)
