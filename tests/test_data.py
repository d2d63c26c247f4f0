"""Tests for the data pipeline: window indexing vs the reference datasets,
deterministic parity (augmentation off), augmentation invariants, and the
device-resident TrainPipeline."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from multipitch_architectures_tpu.data import (
    AugmentConfig,
    TrainPipeline,
    FileSpec,
    augment_batch,
    dataset_context,
    dataset_context_segm,
    dataset_context_segm_pitch,
    num_windows,
    num_segments,
    window_centers,
    gather_windows,
)
from multipitch_architectures_tpu.data.augment import (
    log_compress,
    random_eq,
    random_noise,
    random_transposition,
    random_tuning_shift,
)

from conftest import REFERENCE_ROOT
import sys


def reference_datasets():
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    try:
        import types

        if "torchvision" not in sys.modules:
            # reference imports torchvision.transforms but only uses it in
            # commented-out code (hcqt_datasets.py:6,214) — stub it
            tv = types.ModuleType("torchvision")
            tv.transforms = types.ModuleType("torchvision.transforms")
            sys.modules["torchvision"] = tv
            sys.modules["torchvision.transforms"] = tv.transforms
        from libdl import data_loaders
        return data_loaders
    except Exception:
        return None


def toy_file(t=400, seed=0):
    rng = np.random.RandomState(seed)
    x = rng.rand(6, t, 216).astype(np.float32)
    y = (rng.rand(t, 120) > 0.9).astype(np.float32)
    return x, y


# ---------------------------------------------------------------------------
# Window indexing parity vs the reference
# ---------------------------------------------------------------------------

def test_window_count_matches_reference_formula():
    assert num_windows(400, 75, 50) == (400 - 75) // 50
    assert num_segments(400, 75, 100, 10) == (400 - 75 - 100 + 10) // 10


def test_dataset_context_matches_torch_reference_no_aug():
    ref = reference_datasets()
    if ref is None:
        pytest.skip("reference unavailable")
    import torch

    x, y = toy_file()
    params = {"context": 75, "stride": 50, "compression": 10}
    tds = ref.dataset_context(torch.from_numpy(x), torch.from_numpy(y), params)
    ours = dataset_context(x, y, params)
    assert len(tds) == len(ours)
    for i in (0, 3, len(ours) - 1):
        tx, ty = tds[i]
        ox, oy = ours[i]
        np.testing.assert_allclose(ox, tx.numpy(), atol=1e-6)
        np.testing.assert_allclose(oy, ty.numpy(), atol=1e-6)


def test_dataset_context_segm_matches_torch_reference_no_aug():
    ref = reference_datasets()
    if ref is None:
        pytest.skip("reference unavailable")
    import torch

    x, y = toy_file()
    params = {"context": 75, "seglength": 100, "stride": 20,
              "compression": 10}
    tds = ref.dataset_context_segm(torch.from_numpy(x), torch.from_numpy(y),
                                   params)
    ours = dataset_context_segm(x, y, params)
    assert len(tds) == len(ours)
    tx, ty = tds[1]
    ox, oy = ours[1]
    np.testing.assert_allclose(ox, tx.numpy(), atol=1e-6)
    np.testing.assert_allclose(oy, ty.numpy(), atol=1e-6)


def test_dataset_context_segm_widetarget_matches_torch_reference():
    """Byte parity with hcqt_datasets.py:338-385: fixed 500-frame HCQT
    patch centered on a narrower target segment. Items are compared only
    where the patch lies inside the file (negative start indices wrap in
    both torch and numpy and are out-of-contract upstream too)."""
    ref = reference_datasets()
    if ref is None:
        pytest.skip("reference unavailable")
    import torch

    from multipitch_architectures_tpu.data import \
        dataset_context_segm_widetarget

    x, y = toy_file(1200, 2)
    params = {"context": 75, "seglength": 100, "stride": 50,
              "compression": 10}
    tds = ref.dataset_context_segm_widetarget(
        torch.from_numpy(x), torch.from_numpy(y), params)
    ours = dataset_context_segm_widetarget(x, y, params)
    assert len(tds) == len(ours)
    for i in (4, 8, 16):
        tx, ty = tds[i]
        ox, oy = ours[i]
        assert ox.shape == (6, 574, 216)  # 500 + context-1
        np.testing.assert_allclose(ox, tx.numpy(), atol=1e-6)
        np.testing.assert_allclose(oy, ty.numpy(), atol=1e-6)


def test_dataset_context_measuresegm_matches_torch_reference():
    """Byte parity with hcqt_datasets.py:388-436: segments bounded by
    musical measure positions (variable length)."""
    ref = reference_datasets()
    if ref is None:
        pytest.skip("reference unavailable")
    import torch

    from multipitch_architectures_tpu.data import dataset_context_measuresegm

    x, y = toy_file(1200, 3)
    measures = np.arange(100, 1101, 60)  # 17 measure frame positions
    params = {"context": 75, "seglength": 4, "stride": 2, "compression": 10}
    tds = ref.dataset_context_measuresegm(
        torch.from_numpy(x), torch.from_numpy(y),
        torch.from_numpy(measures), params)
    ours = dataset_context_measuresegm(x, y, measures, params)
    assert len(tds) == len(ours) == 6
    for i in (0, 1, len(ours) - 1):
        tx, ty = tds[i]
        ox, oy = ours[i]
        assert oy.shape[2] == 240  # 4 measures of 60 frames
        np.testing.assert_allclose(ox, tx.numpy(), atol=1e-6)
        np.testing.assert_allclose(oy, ty.numpy(), atol=1e-6)


def test_dataset_context_segm_pitch_slices_targets():
    ref = reference_datasets()
    x, y = toy_file()
    params = {"context": 75, "seglength": 50, "stride": 25, "compression": 10}
    ours = dataset_context_segm_pitch(x, y, params)
    ox, oy = ours[0]
    assert oy.shape == (1, 1, 50, 72)
    if ref is not None:
        import torch

        tds = ref.dataset_context_segm_pitch(torch.from_numpy(x),
                                             torch.from_numpy(y), params)
        tx, ty = tds[0]
        np.testing.assert_allclose(oy, ty.numpy(), atol=1e-6)


# ---------------------------------------------------------------------------
# Augmentation invariants (JAX path)
# ---------------------------------------------------------------------------

def test_log_compress():
    x = jnp.ones((2, 3, 4))
    np.testing.assert_allclose(log_compress(x, 10.0), np.log(11.0), rtol=1e-6)


def test_random_eq_keeps_nonnegative_and_bounded():
    key = jax.random.PRNGKey(0)
    x = jnp.ones((6, 75, 216))
    for i in range(5):
        out = random_eq(jax.random.fold_in(key, i), x, max_alpha=20)
        assert float(out.min()) >= 0.0
        assert float(out.max()) <= 1.0 + 1e-6  # filter peak is 1


def test_random_noise_abs():
    key = jax.random.PRNGKey(1)
    x = jnp.zeros((6, 75, 216))
    out = random_noise(key, x, 1e-4)
    assert float(out.min()) >= 0.0
    assert 0 < float(out.mean()) < 1e-3


def test_tuning_shift_half_bin_interpolates():
    x = jnp.asarray(np.arange(10, dtype=np.float32))[None, None, :]
    # try many keys, collect the distinct outcomes
    seen = set()
    for i in range(40):
        out = np.asarray(random_tuning_shift(jax.random.PRNGKey(i), x))[0, 0]
        if np.allclose(out[1:], (x[0, 0, :-1] + x[0, 0, 1:]) / 2):
            seen.add("+0.5")
        elif np.allclose(out[:-1], (x[0, 0, :-1] + x[0, 0, 1:]) / 2):
            seen.add("-0.5")
        elif np.allclose(out[1:], x[0, 0, :-1]):
            seen.add("+1")
        elif np.allclose(out[:-1], x[0, 0, 1:]):
            seen.add("-1")
        elif np.allclose(out, x[0, 0]):
            seen.add("0")
    assert seen == {"+0.5", "-0.5", "+1", "-1", "0"}


def test_transposition_rolls_x_and_y_consistently():
    x = jnp.zeros((6, 75, 216)).at[:, :, 30:33].set(1.0)  # semitone bin 10
    y = jnp.zeros((1, 1, 72)).at[..., 10].set(1.0)
    for i in range(30):
        xo, yo = random_transposition(jax.random.PRNGKey(i), x, y, 5)
        xs = int(np.asarray(xo[0, 0]).argmax()) // 3
        ys = int(np.asarray(yo[0, 0]).argmax())
        if float(yo.sum()) > 0:  # not rolled out
            assert xs == ys, (xs, ys)


def test_transposition_chroma_pure_roll():
    x = jnp.ones((6, 75, 216))
    y = jnp.zeros((1, 1, 12)).at[..., 0].set(1.0)
    sums = [float(random_transposition(jax.random.PRNGKey(i), x, y, 5)[1].sum())
            for i in range(20)]
    assert all(s == 1.0 for s in sums)  # chroma targets never zeroed


# ---------------------------------------------------------------------------
# TrainPipeline
# ---------------------------------------------------------------------------

def test_pipeline_centers_match_per_file_datasets():
    x1, y1 = toy_file(400, 0)
    x2, y2 = toy_file(321, 1)
    p = TrainPipeline([FileSpec(x1, y1), FileSpec(x2, y2)], context=75,
                      stride=50, target_slice=(24, 96))
    assert len(p) == num_windows(400, 75, 50) + num_windows(321, 75, 50)


def test_pipeline_batches_shapes_and_determinism():
    x1, y1 = toy_file(400, 0)
    p = TrainPipeline([FileSpec(x1, y1)], context=75, stride=50,
                      augment=AugmentConfig(compression=10.0),
                      target_slice=(24, 96))
    key = jax.random.PRNGKey(0)
    batches = list(p.batches(key, batch_size=4))
    assert len(batches) == len(p) // 4
    xb, yb = batches[0]
    assert xb.shape == (4, 6, 75, 216)
    assert yb.shape == (4, 1, 1, 72)
    batches2 = list(p.batches(key, batch_size=4))
    np.testing.assert_allclose(batches[0][0], batches2[0][0])


def test_pipeline_matches_reference_dataset_content():
    """With augmentation off, pipeline windows equal dataset_context items."""
    x, y = toy_file(400, 0)
    p = TrainPipeline([FileSpec(x, y)], context=75, stride=50,
                      target_slice=None, compression=10.0)
    ds = dataset_context(x, y, {"context": 75, "stride": 50,
                                "compression": 10})
    xb, yb = next(p.all_windows(batch_size=len(p)))
    for i in (0, 2, len(ds) - 1):
        dx, dy = ds[i]
        np.testing.assert_allclose(np.asarray(xb[i]), dx, atol=1e-5)
        np.testing.assert_allclose(np.asarray(yb[i]), dy, atol=1e-6)


def test_pipeline_augmented_batch_runs():
    x, y = toy_file(800, 0)
    cfg = AugmentConfig(transposition=5, randomeq=20, noisestd=1e-4,
                        tuning=True, compression=10.0)
    p = TrainPipeline([FileSpec(x, y)], context=75, stride=50, augment=cfg,
                      target_slice=(24, 96))
    xb, yb = next(p.batches(jax.random.PRNGKey(0), batch_size=8))
    assert xb.shape == (8, 6, 75, 216) and yb.shape == (8, 1, 1, 72)
    assert np.isfinite(np.asarray(xb)).all()


def test_time_scale_matches_scipy_interp1d_oracle():
    """The fixed-output-length time-scale augmentation (documented
    deviation from the reference's variable-length stretch,
    hcqt_datasets.py:211-226) must (a) draw the reference's rate
    scalefac = 1/a + 2U(1-1/a), (b) linearly interpolate the segment
    interior exactly like scipy.interp1d at the sampled positions, and
    (c) pass the context frames through untouched."""
    from scipy.interpolate import interp1d

    from multipitch_architectures_tpu.data.augment import time_scale

    context, seglength, max_factor = 75, 100, 1.3
    half = context // 2
    rng = np.random.RandomState(0)
    x = rng.rand(6, seglength + 2 * half, 216).astype(np.float32)

    key = jax.random.PRNGKey(42)
    out = np.asarray(time_scale(key, jnp.asarray(x), max_factor, context))
    assert out.shape == x.shape

    u = float(jax.random.uniform(key))
    scalefac = 1.0 / max_factor + 2.0 * u * (1.0 - 1.0 / max_factor)
    interior = x[:, half:-half, :]
    n = interior.shape[1]
    pos = np.clip(np.arange(n) / scalefac, 0, n - 1)
    want = interp1d(np.arange(n), interior, axis=1, kind="linear")(pos)

    np.testing.assert_array_equal(out[:, :half, :], x[:, :half, :])
    np.testing.assert_array_equal(out[:, -half:, :], x[:, -half:, :])
    np.testing.assert_allclose(out[:, half:-half, :], want, atol=1e-5)
