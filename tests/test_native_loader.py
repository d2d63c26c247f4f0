"""Tests for the native (C++) mmap npy window loader vs a numpy oracle."""

import os

import numpy as np
import pytest

from multipitch_architectures_tpu.io import (NativeWindowLoader,
                                             build_native_library)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("npy")
    rng = np.random.RandomState(0)
    pairs, raws = [], []
    for i, (t, annot_dtype) in enumerate([(400, np.float32),
                                          (437, np.float64)]):
        hcqt = rng.rand(216, t, 6).astype(np.float32)
        annot = (rng.rand(128, t) > 0.9).astype(annot_dtype)
        hp = str(tmp / f"h{i}.npy")
        ap = str(tmp / f"a{i}.npy")
        np.save(hp, hcqt)
        np.save(ap, annot)
        pairs.append((hp, ap))
        raws.append((hcqt, annot))
    return pairs, raws


def test_build():
    assert os.path.exists(build_native_library())


def test_window_count_and_parity(corpus):
    pairs, raws = corpus
    ld = NativeWindowLoader(pairs, context=75, stride=50)
    n0 = (400 - 75) // 50
    n1 = (437 - 75) // 50
    assert len(ld) == n0 + n1

    x, y = ld.fill(np.arange(len(ld)))
    assert x.shape == (len(ld), 6, 75, 216)
    assert y.shape == (len(ld), 72)
    for widx in range(len(ld)):
        file_idx, local = (0, widx) if widx < n0 else (1, widx - n0)
        hcqt, annot = raws[file_idx]
        inputs = np.transpose(hcqt, (2, 1, 0))
        center = local * 50 + 37
        np.testing.assert_allclose(
            x[widx], inputs[:, center - 37:center + 38, :], atol=1e-6)
        np.testing.assert_allclose(y[widx],
                                   annot[24:96, center].astype(np.float32),
                                   atol=1e-6)


def test_batches_prefetch(corpus):
    pairs, _ = corpus
    ld = NativeWindowLoader(pairs, context=75, stride=50, n_threads=4)
    batches = list(ld.batches(4, shuffle=True, seed=1))
    assert len(batches) == len(ld) // 4
    assert batches[0][0].shape == (4, 6, 75, 216)
    # deterministic under the same seed
    batches2 = list(ld.batches(4, shuffle=True, seed=1))
    np.testing.assert_allclose(batches[0][0], batches2[0][0])


def test_rejects_bad_file(tmp_path, corpus):
    pairs, _ = corpus
    bad = str(tmp_path / "bad.npy")
    with open(bad, "wb") as f:
        f.write(b"not an npy file")
    with pytest.raises(IOError):
        NativeWindowLoader([(bad, pairs[0][1])])


def test_trainer_batches_feed_trainer(corpus):
    """Native-loader batches drive a real train step."""
    import jax
    import jax.numpy as jnp

    from multipitch_architectures_tpu.io import trainer_batches
    from multipitch_architectures_tpu.models import BasicCnnSegmSigmoid
    from multipitch_architectures_tpu.train import Trainer, TrainConfig

    pairs, _ = corpus
    ld = NativeWindowLoader(pairs, context=75, stride=50)
    model = BasicCnnSegmSigmoid(n_chan_layers=(4, 4, 2, 1), n_bins_out=72)
    tr = Trainer(model, TrainConfig(batch_size=4, loss="bce"))
    state = tr.init(jnp.zeros((1, 6, 75, 216)))
    x, y = next(trainer_batches(ld, 4, seed=0))
    assert x.shape == (4, 6, 75, 216) and y.shape == (4, 1, 1, 72)
    xs, ys, ws = tr._shard(jnp.asarray(x), jnp.asarray(y))
    state, loss = tr._train_step(state, xs, ys, ws, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))


def test_tsan_stress_no_data_races(tmp_path):
    """Race detection for the loader's concurrency model (immutable
    dataset, concurrent fill_batch callers, inner thread teams): build
    the ThreadSanitizer harness and run it on a real corpus file. Any
    data race makes TSAN exit non-zero with a report."""
    import subprocess

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    native = os.path.join(root, "native")
    build = subprocess.run(["make", "-C", native, "tsan"],
                           capture_output=True, text=True)
    if build.returncode != 0:
        pytest.skip(f"tsan build unavailable: {build.stderr[-200:]}")

    rng = np.random.RandomState(0)
    hcqt = rng.rand(216, 300, 6).astype(np.float32)
    annot = (rng.rand(128, 300) > 0.9).astype(np.float32)
    np.save(tmp_path / "h.npy", hcqt)
    np.save(tmp_path / "a.npy", annot)

    run = subprocess.run(
        [os.path.join(native, "build", "tsan_stress"),
         str(tmp_path / "h.npy"), str(tmp_path / "a.npy")],
        capture_output=True, text=True, timeout=300)
    assert run.returncode == 0, run.stderr[-2000:]
    assert "ThreadSanitizer" not in run.stderr, run.stderr[-2000:]
    assert "tsan_stress OK" in run.stdout
