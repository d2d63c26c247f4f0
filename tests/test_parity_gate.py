"""End-to-end test of tools/parity_gate.py (VERDICT r3 task 3): a random
reference state_dict + synthetic HCQT/targets must flow through the
one-command gate — port, both protocols, 25-measure drift table,
PASS/FAIL — so that when the stripped published checkpoints appear,
nothing is left to write."""

import os
import sys

import numpy as np
import pytest

from conftest import patched_torch_cpu, reference_models

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


@pytest.fixture(scope="module")
def checkpoint_and_data(tmp_path_factory):
    ref = reference_models()
    if ref is None:
        pytest.skip("reference torch models unavailable")
    import torch

    d = tmp_path_factory.mktemp("parity_gate")
    torch.manual_seed(3)
    with patched_torch_cpu():
        tm = ref.simple_u_net_doubleselfattn(
            n_chan_layers=[8, 8, 4, 2], n_bins_out=72, scalefac=16,
            embed_dim=32, num_heads=8, mlp_dim=64,
            pos_encoding="sinusoidal")
    torch.save(tm.state_dict(), d / "ckpt.pt")

    rng = np.random.RandomState(5)
    t_frames = 110
    hcqt = rng.rand(216, t_frames, 6).astype(np.float32)  # reference layout
    np.save(d / "hcqt.npy", hcqt)
    targets = (rng.rand(72, t_frames) > 0.9).astype(np.float32)
    np.save(d / "pitch.npy", targets)                     # reference (72,T)
    return d


@pytest.mark.slow
def test_parity_gate_passes_on_same_checkpoint(checkpoint_and_data, capsys):
    import parity_gate

    d = checkpoint_and_data
    rc = parity_gate.main([
        "--checkpoint", str(d / "ckpt.pt"),
        "--model", "simple_u_net_doubleselfattn",
        "--model-args", '{"n_chan_layers": [8, 8, 4, 2], "n_bins_out": 72,'
                        ' "scalefac": 16, "embed_dim": 32, "num_heads": 8,'
                        ' "mlp_dim": 64, "pos_encoding": "sinusoidal"}',
        "--hcqt", str(d / "hcqt.npy"),
        "--targets", str(d / "pitch.npy"),
    ])
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "PASS — all gates within 0.001" in out
    # the full 25-measure drift table printed (11 eval + 14 mir_eval)
    for m in ("f_measure", "cosine_sim", "roc_auc_measure", "Precision",
              "Accuracy", "Chroma Accuracy"):
        assert m in out, (m, out)
    assert out.count("PASS") >= 26            # 25 rows + final verdict


@pytest.mark.slow
def test_parity_gate_catches_a_porter_bug(checkpoint_and_data, capsys,
                                          monkeypatch):
    """Simulated porter regression: the ported variables get one conv
    bias perturbed, so the two protocols genuinely diverge — the gate
    must FAIL with rc=1 (proves it measures drift, not formatting)."""
    import jax

    import parity_gate

    real_port = parity_gate._port_state_dict

    def broken_port(model_name, sd):
        v = real_port(model_name, sd)
        # a 1.5x global weight scale: continuous measures (cosine_sim,
        # BCE, euclidean) must drift far beyond any 1e-3 gate
        return jax.tree.map(lambda a: a * 1.5, v)

    monkeypatch.setattr(parity_gate, "_port_state_dict", broken_port)
    d = checkpoint_and_data
    rc = parity_gate.main([
        "--checkpoint", str(d / "ckpt.pt"),
        "--model", "simple_u_net_doubleselfattn",
        "--model-args", '{"n_chan_layers": [8, 8, 4, 2], "n_bins_out": 72,'
                        ' "scalefac": 16, "embed_dim": 32, "num_heads": 8,'
                        ' "mlp_dim": 64, "pos_encoding": "sinusoidal"}',
        "--hcqt", str(d / "hcqt.npy"),
        "--targets", str(d / "pitch.npy"),
    ])
    out = capsys.readouterr().out
    assert rc == 1, out
    assert "FAIL — failed:" in out


@pytest.mark.slow
def test_parity_gate_int8_path(checkpoint_and_data, capsys):
    import parity_gate

    d = checkpoint_and_data
    rc = parity_gate.main([
        "--checkpoint", str(d / "ckpt.pt"),
        "--model", "simple_u_net_doubleselfattn",
        "--model-args", '{"n_chan_layers": [8, 8, 4, 2], "n_bins_out": 72,'
                        ' "scalefac": 16, "embed_dim": 32, "num_heads": 8,'
                        ' "mlp_dim": 64, "pos_encoding": "sinusoidal"}',
        "--hcqt", str(d / "hcqt.npy"),
        "--targets", str(d / "pitch.npy"),
        "--frames", "60", "--int8",
    ])
    out = capsys.readouterr().out
    assert "int8 gate: worst drift" in out
    assert rc in (0, 1)                       # random weights may miss int8


def test_config_autoresolves_from_published_checkpoint_names():
    """Every stripped published checkpoint
    (/root/reference/.MISSING_LARGE_BLOBS) must resolve to its registry
    config from the FILENAME alone — the blob-drop one-liner (VERDICT r4
    task 8). Also: exact names pass through, a _model suffix strips,
    unknown/ambiguous names raise with guidance."""
    import parity_gate

    expected = {
        "RETRAIN4_exp128c_musicnet_aligned_cnn_deepresnetwide_"
        "moresamples_rerun2.pt":
            "RETRAIN4_exp128c_musicnet_cnn_deepresnetwide_"
            "moresamples_rerun2",
        "RETRAIN4_exp195f_musicnet_aligned_unet_extremelylarge_"
        "polyphony_softmax_rerun1.pt":
            "RETRAIN4_exp195f_musicnet_unet_extremelylarge_"
            "polyphony_softmax_rerun1",
        "exp214c_bigmix_aligned_cnn_deepresnetwide.pt":
            "exp214c_bigmix_cnn_deepresnetwide",
    }
    for fname, config in expected.items():
        got = parity_gate.resolve_config_from_checkpoint(
            "/anywhere/models_pretrained/" + fname)
        assert got == config, (fname, got)

    # exact registry name and _model suffix both pass through
    assert parity_gate.resolve_config_from_checkpoint(
        "exp214c_bigmix_cnn_deepresnetwide_model.pt") == \
        "exp214c_bigmix_cnn_deepresnetwide"

    import pytest as _pytest
    with _pytest.raises(ValueError, match="cannot resolve"):
        parity_gate.resolve_config_from_checkpoint("mystery_weights.pt")
