"""Tests for the experiment layer: registry completeness vs the reference
scripts, config faithfulness, model building for every registered
experiment, and an end-to-end smoke run."""

import logging
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from multipitch_architectures_tpu.experiments import (
    NpyCorpus,
    SyntheticCorpus,
    available_experiments,
    build_model,
    load_experiment,
    run_experiment,
)


def test_registry_covers_all_111_reference_scripts():
    names = available_experiments()
    assert len(names) == 111
    ref_dir = "/root/reference/experiments"
    if os.path.isdir(ref_dir):
        expected = set()
        for fam in os.listdir(ref_dir):
            d = os.path.join(ref_dir, fam)
            if os.path.isdir(d) and fam != "logs":
                expected |= {os.path.splitext(f)[0] for f in os.listdir(d)
                             if f.endswith(".py")}
        assert set(names) == expected


def test_flagship_config_values():
    """exp180d values vs the script's config block (exp180d…py:38-151)."""
    cfg = load_experiment("exp180d_musicnet_unet_extremelylarge_doubleselfattn")
    assert cfg.model_class == "simple_u_net_doubleselfattn"
    assert cfg.model_kwargs["scalefac"] == 4
    assert cfg.model_kwargs["embed_dim"] == 128
    assert cfg.model_kwargs["mlp_dim"] == 8192
    assert cfg.model_kwargs["pos_encoding"] == "sinusoidal"
    assert cfg.train_config.batch_size == 25
    assert cfg.train_config.initial_lr == 1e-3
    assert cfg.train_config.weight_decay == 0.01
    assert cfg.train_config.scheduler == "ReduceLROnPlateau"
    assert cfg.train_config.scheduler_params["patience"] == 5
    assert cfg.train_config.es_patience == 12
    assert cfg.train_stride == 50 and cfg.test_stride == 1
    assert cfg.augment.transposition == 5
    assert cfg.augment.randomeq == 20
    assert cfg.augment.tuning is True
    assert cfg.eval_thresh == 0.4
    assert cfg.num_output_bins == 72 and cfg.min_pitch == 24
    assert len(cfg.test_versions) == 10
    # the upstream missing-comma bug leaves 30 (not 33) val prefixes
    assert len(cfg.val_versions) == 30
    assert "1828_1829_" in cfg.val_versions


def test_fix_val_split_repairs_merged_prefixes():
    cfg = load_experiment(
        "exp180d_musicnet_unet_extremelylarge_doubleselfattn",
        fix_val_split=True)
    assert len(cfg.val_versions) == 33
    assert "1828_" in cfg.val_versions and "1829_" in cfg.val_versions


def test_moresamples_batch_cap_captured():
    cfg = load_experiment(
        "exp180d_musicnet_unet_extremelylarge_doubleselfattn_moresamples")
    assert cfg.train_config.max_train_batches == 3800
    assert cfg.train_stride == 20


def test_multitask_experiments_use_multitask_loss():
    cfg = load_experiment(
        "exp195f_musicnet_unet_extremelylarge_polyphony_softmax")
    assert cfg.train_config.loss == "multitask"
    assert cfg.model_class == "simple_u_net_polyphony_classif_softmax"


def test_every_registered_model_builds():
    """Every experiment's model must construct and report a parameter
    tree (eval_shape — no compile)."""
    seen = set()
    for name in available_experiments():
        cfg = load_experiment(name)
        key = (cfg.model_class, tuple(sorted(map(str, cfg.model_kwargs.items()))))
        if key in seen:
            continue
        seen.add(key)
        model = cfg.build_model()
        v = jax.eval_shape(
            lambda m=model: m.init({"params": jax.random.PRNGKey(0)},
                                   jnp.zeros((1, 6, 75, 216)), train=False))
        assert sum(int(np.prod(p.shape))
                   for p in jax.tree.leaves(v["params"])) > 1000
    assert len(seen) >= 25  # distinct model configs across the 111 scripts


def test_schubert_experiment_has_version_splits():
    cfg = load_experiment("exp201a_schubert_versionsplit_unet_extremelylarge_doubleselfattn")
    assert cfg.train_versions == ["AL98", "FI55", "FI80", "OL06", "QU98"]
    assert cfg.test_versions == ["HU33", "SC06"]


def test_end_to_end_smoke(tmp_path):
    """Full train+val+test on synthetic data with a small CNN config."""
    cfg = load_experiment("exp126a_musicnet_cnn_basic")
    corpus = SyntheticCorpus(cfg, frames=250, n_train_files=2)
    results = run_experiment(
        cfg, corpus, str(tmp_path), max_epochs_override=1,
        logger=logging.getLogger("smoke"))
    assert "history" in results
    assert len(results["subsets"]) == 3
    fw = results["subsets"][0]["framewise_mean"]
    assert "f_measure" in fw and np.isfinite(fw["f_measure"])
    assert (tmp_path / "results_filewise").exists()
    csvs = list((tmp_path / "results_filewise").glob("*.csv"))
    assert len(csvs) == 1


def test_bigmix_multi_corpus_per_stride(tmp_path):
    """Exp4-style multi-corpus runs: per-corpus train strides shape the
    window counts (BIGMIX_STRIDES semantics)."""
    from multipitch_architectures_tpu.data import (FileSpec, TrainPipeline,
                                                   num_windows)

    rng = np.random.RandomState(0)

    def spec(t, stride):
        return FileSpec(rng.rand(6, t, 216).astype(np.float32),
                        (rng.rand(t, 72) > 0.9).astype(np.float32),
                        stride=stride)

    p = TrainPipeline([spec(400, 35), spec(400, 6)], context=75, stride=50,
                      target_slice=None)
    assert len(p) == num_windows(400, 75, 35) + num_windows(400, 75, 6)


def test_multi_corpus_runner_smoke(tmp_path):
    cfg = load_experiment("exp126a_musicnet_cnn_basic")
    c1 = SyntheticCorpus(cfg, frames=250, n_train_files=1)
    c2 = SyntheticCorpus(cfg, frames=250, n_train_files=1)

    class Renamed:
        def __init__(self, inner, prefix):
            self.inner, self.prefix = inner, prefix

        def files(self):
            return [self.prefix + f for f in self.inner.files()]

        def load(self, fn):
            return self.inner.load(fn[len(self.prefix):])

    results = run_experiment(
        cfg, [(Renamed(c1, "corpusA_"), 35, 35), (Renamed(c2, "corpusB_"), 6, 4)],
        str(tmp_path), max_epochs_override=1, do_test=False,
        logger=logging.getLogger("smoke2"))
    assert "history" in results


def test_runner_honors_explicit_train_versions(tmp_path):
    """Exp3-style explicit train lists: only matching files train."""
    import dataclasses

    cfg = load_experiment(
        "exp201b_schubert_songsplit_unet_extremelylarge_doubleselfattn")
    assert cfg.train_versions[:2] == ["D911-01", "D911-02"]

    class SWDCorpus:
        def files(self):
            return [f"SWD_{v}_HU33.npy" for v in
                    ("D911-01", "D911-14", "D911-17", "D911-24")]

        def load(self, fn):
            rng = np.random.RandomState(0)
            return (rng.rand(6, 250, 216).astype(np.float32),
                    (rng.rand(250, 128) > 0.93).astype(np.float32))

    small = dataclasses.replace(
        cfg, model_kwargs={**cfg.model_kwargs, "n_chan_layers": [8, 8, 4, 2],
                           "scalefac": 16, "embed_dim": 32, "mlp_dim": 64},
        train_config=dataclasses.replace(cfg.train_config, batch_size=3))
    results = run_experiment(small, SWDCorpus(), str(tmp_path),
                             max_epochs_override=1, do_test=False,
                             logger=logging.getLogger("swd"))
    log = (tmp_path / "logs").glob("*.txt")
    assert "history" in results


def test_split_json_loader():
    from multipitch_architectures_tpu.experiments import (
        apply_split_to_config, split_datasets, split_filenames)

    path = "/root/reference/dataset_splits/test_MuN-10.json"
    if not os.path.exists(path):
        pytest.skip("reference splits unavailable")
    train = split_filenames(path, "train")
    test = split_filenames(path, "test")
    assert len(train) == 293 and len(test) == 10
    cfg = load_experiment("exp126a_musicnet_cnn_basic")
    cfg2 = apply_split_to_config(cfg, path)
    assert len(cfg2.test_versions) == 10
    bigmix = "/root/reference/dataset_splits/big_mixed_dataset.json"
    if os.path.exists(bigmix):
        names = split_datasets(bigmix)
        assert "MusicNet" in names and len(names) >= 4


# ---------------------------------------------------------------------------
# observability: MAC counts (torchinfo role) + startup config echo
# ---------------------------------------------------------------------------

def test_mac_counts_match_reference_torchinfo_logs():
    """'Total mult-adds' for the paper configs must match the torchinfo
    values embedded in the reference logs (conv models exactly; attention
    models exceed them by the MHA dots old torchinfo misses)."""
    from multipitch_architectures_tpu.models import (BasicCnnSegmSigmoid,
                                                     DeepCnnSegmSigmoid,
                                                     SimpleUNetDoubleSelfAttn)
    from multipitch_architectures_tpu.utils import count_macs

    shape = (1, 6, 174, 216)  # the reference's summary input, exp180d:233
    cnn_m = count_macs(BasicCnnSegmSigmoid(
        n_chan_layers=(250, 150, 100, 100), n_bins_out=72), shape)
    assert round(cnn_m / 1e9, 2) == 25.09          # exp126c log:53

    dcnn_l = count_macs(DeepCnnSegmSigmoid(
        n_chan_layers=(70, 70, 50, 10), n_prefilt_layers=5, residual=False,
        n_bins_out=72), shape)
    assert abs(dcnn_l / 1e9 - 171.75) < 0.02       # exp127c log:74

    saunet_l = count_macs(SimpleUNetDoubleSelfAttn(
        n_chan_layers=(128, 80, 50, 30), n_bins_out=72, scalefac=4,
        embed_dim=128, num_heads=8, mlp_dim=8192,
        pos_encoding="sinusoidal"), shape)
    assert 35.51e9 <= saunet_l <= 36.6e9           # exp180d log:143 + MHA


def test_model_summary_includes_macs():
    from multipitch_architectures_tpu.models import BasicCnnSegmSigmoid
    from multipitch_architectures_tpu.utils import model_summary

    s = model_summary(BasicCnnSegmSigmoid(n_chan_layers=(8, 8, 4, 2),
                                          n_bins_out=72))
    assert "Total params:" in s and "Total mult-adds (G):" in s


def test_runner_logs_startup_config(tmp_path):
    """The reference echoes every config block at startup
    (exp180d…py:186-233); the runner must do the same."""
    import logging

    from multipitch_architectures_tpu.experiments import load_experiment
    from multipitch_architectures_tpu.experiments.runner import (
        SyntheticCorpus, run_experiment)

    cfg = load_experiment("exp126a_musicnet_cnn_basic")
    records = []

    logger = logging.getLogger("test_startup_echo")
    logger.setLevel(logging.INFO)
    h = logging.Handler()
    h.emit = lambda r: records.append(r.getMessage())
    logger.addHandler(h)

    run_experiment(cfg, SyntheticCorpus(cfg, frames=220), str(tmp_path),
                   logger=logger, max_epochs_override=1)
    text = "\n".join(records)
    for needle in ("Logging experiment exp126a_musicnet_cnn_basic",
                   "Training set parameters:", "Validation set parameters:",
                   "Test set parameters:", "Optimizer parameters:",
                   "Scheduler parameters:", "Early stopping parameters:",
                   "Model parameters:", "Total mult-adds (G):"):
        assert needle in text, needle


def test_runner_resume_continues_from_checkpoint(tmp_path):
    """run_experiment(resume=True) restores the checkpoint and continues
    at the next epoch — the second run's history covers only the
    remaining epochs."""
    cfg = load_experiment("exp126a_musicnet_cnn_basic")
    corpus = SyntheticCorpus(cfg, frames=250, n_train_files=2)
    first = run_experiment(cfg, corpus, str(tmp_path),
                           max_epochs_override=1, do_test=False,
                           logger=logging.getLogger("resume1"))
    assert len(first["history"]["train_loss"]) == 1

    second = run_experiment(cfg, corpus, str(tmp_path),
                            max_epochs_override=3, do_test=False,
                            resume=True,
                            logger=logging.getLogger("resume2"))
    # epochs 1..2 remain after resuming past the checkpointed epoch 0
    assert len(second["history"]["train_loss"]) == 2


def test_audio_corpus_matches_precompute_pipeline(tmp_path):
    """AudioCorpus (train directly from .wav + MusicNet CSV, no
    precompute step) must produce exactly the features/targets the
    notebook-01 precompute path writes."""
    from scipy.io import wavfile

    from multipitch_architectures_tpu.dsp import (
        compute_annotation_array_nooverlap, compute_efficient_hcqt)
    from multipitch_architectures_tpu.experiments import AudioCorpus

    fs = 22050
    t = np.arange(fs * 2) / fs
    audio = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    (tmp_path / "audio").mkdir()
    (tmp_path / "csv").mkdir()
    wavfile.write(tmp_path / "audio" / "clip.wav", fs,
                  (audio * 32767).astype(np.int16))
    # MusicNet schema: sample indices at 44.1 kHz
    with open(tmp_path / "csv" / "clip.csv", "w") as f:
        f.write("start_time,end_time,instrument,note\n")
        f.write("0,44100,1,69\n22050,66150,1,72\n")

    corpus = AudioCorpus(str(tmp_path / "audio"), str(tmp_path / "csv"))
    inputs, targets = corpus.load("clip.wav")
    assert inputs.shape[0] == 6 and inputs.shape[2] == 216
    assert targets.shape == (inputs.shape[1], 128)
    assert targets[:, 69].any() and targets[:, 72].any()

    # oracle: the precompute path on the int16-roundtripped audio
    audio_rt = (audio * 32767).astype(np.int16) / 32767.0
    f_hcqt, fs_hcqt, _ = compute_efficient_hcqt(
        np.asarray(audio_rt, np.float32), fs=fs, fs_hcqt_target=50,
        bins_per_octave=36, num_octaves=6)
    events = np.array([[0.0, 1.0, 69.0], [0.5, 1.5, 72.0]])
    roll = compute_annotation_array_nooverlap(events, f_hcqt.shape[1],
                                              fs_hcqt, annot_type="pitch")
    np.testing.assert_allclose(
        inputs, np.transpose(f_hcqt, (2, 1, 0)), atol=1e-6)
    np.testing.assert_array_equal(targets, np.asarray(roll, np.float32).T)

    # cache: second load returns the same arrays without recompute
    again, _ = corpus.load("clip.wav")
    assert again is inputs


def test_note_event_schemas_cover_exp4_corpora(tmp_path):
    """The generic column-map adapter (VERDICT r3 task 5): synthetic
    annotation files in each Exp4 corpus's text-export shape — Bach10
    (whitespace, ms, midi), PHENICX-Anechoic (comma, seconds, note
    names), ChoralSingingDataset (per-frame f0 track in Hz) — must all
    produce the same (start_sec, end_sec, midi) events. The reference
    itself precomputes these corpora to .npy rolls (exp210d…py:160);
    this is the direct-from-audio path."""
    from multipitch_architectures_tpu.io import (NoteEventSchema,
                                                 load_note_events,
                                                 note_name_to_midi)

    assert note_name_to_midi("A4") == 69
    assert note_name_to_midi("C4") == 60
    assert note_name_to_midi("C#4") == 61 and note_name_to_midi("Db4") == 61

    want = np.array([[0.5, 1.0, 69.0], [1.0, 2.0, 72.0]])

    # Bach10-style: whitespace-separated, times in ms, midi pitch
    p = tmp_path / "b10.txt"
    p.write_text("500 1000 69\n1000 2000 72\n")
    np.testing.assert_allclose(load_note_events(str(p), schema="bach10"),
                               want)

    # PHENICX-style: comma, seconds, scientific note names
    p = tmp_path / "phx.txt"
    p.write_text("onset,offset,note\n0.5,1.0,A4\n1.0,2.0,C5\n")
    np.testing.assert_allclose(load_note_events(str(p), schema="phenicx"),
                               want)

    # CSD-style f0 track: (time_sec, f0_hz) frames at 10 ms hop;
    # unvoiced (f0=0) frames drop; voiced frames become per-frame events
    p = tmp_path / "csd.csv"
    rows = [(0.50 + 0.01 * i, 440.0) for i in range(50)]       # A4 0.5-1.0
    rows += [(1.00 + 0.01 * i, 523.25) for i in range(100)]    # C5 1.0-2.0
    rows += [(2.00 + 0.01 * i, 0.0) for i in range(10)]        # unvoiced
    p.write_text("".join(f"{t:.3f},{f:.2f}\n" for t, f in rows))
    ev = load_note_events(str(p), schema="csd")
    assert len(ev) == 150                        # unvoiced frames dropped
    np.testing.assert_allclose(ev[0], [0.5, 0.51, 69.0], atol=1e-9)
    np.testing.assert_allclose(ev[-1], [1.99, 2.0, 72.0], atol=1e-9)

    # custom column map: header, sample-index times at 48 kHz, Hz pitch
    p = tmp_path / "custom.csv"
    p.write_text("s,e,f\n24000,48000,440.0\n48000,96000,523.25\n")
    ev = load_note_events(str(p), schema=NoteEventSchema(
        sep=",", onset="s", offset="e", pitch="f",
        time_unit="samples", source_fs=48000.0, pitch_unit="hz"))
    np.testing.assert_allclose(ev, want)


def test_audio_corpus_with_annotation_schema(tmp_path):
    """Exp4 from raw audio: AudioCorpus with a schema preset reads .txt
    annotations (PHENICX shape) and rasterizes the same roll the
    auto-detected MusicNet path produces for equivalent events."""
    from scipy.io import wavfile

    from multipitch_architectures_tpu.experiments import AudioCorpus

    fs = 22050
    t = np.arange(fs * 2) / fs
    audio = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    (tmp_path / "audio").mkdir()
    (tmp_path / "ann").mkdir()
    wavfile.write(tmp_path / "audio" / "clip.wav", fs,
                  (audio * 32767).astype(np.int16))
    with open(tmp_path / "ann" / "clip.txt", "w") as f:
        f.write("onset,offset,note\n0.0,1.0,A4\n0.5,1.5,C5\n")

    corpus = AudioCorpus(str(tmp_path / "audio"), str(tmp_path / "ann"),
                         annotation_schema="phenicx")
    inputs, targets = corpus.load("clip.wav")
    assert inputs.shape[0] == 6 and inputs.shape[2] == 216
    assert targets[:, 69].any() and targets[:, 72].any()
    # same events through the MusicNet-schema path give the same roll
    (tmp_path / "csv").mkdir()
    with open(tmp_path / "csv" / "clip.csv", "w") as f:
        f.write("start_time,end_time,instrument,note\n")
        f.write("0,44100,1,69\n22050,66150,1,72\n")
    corpus2 = AudioCorpus(str(tmp_path / "audio"), str(tmp_path / "csv"))
    _, targets2 = corpus2.load("clip.wav")
    np.testing.assert_array_equal(targets, targets2)


def test_precompute_features_cli_schema(tmp_path, monkeypatch):
    """The notebook-01 CLI end to end (examples/precompute_features.py,
    reference 01_precompute_features.ipynb): a .wav + PHENICX-shape .txt
    annotation through --schema must write the reference-layout
    (216, T, 6) HCQT and a (128, T) pitch roll with the annotated note
    active. Also covers the .txt fallback when no .csv exists."""
    import importlib
    import sys as _sys

    from scipy.io import wavfile

    _sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "examples"))
    precompute = importlib.import_module("precompute_features")

    fs = 22050
    t = np.arange(int(fs * 1.2)) / fs
    audio = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    (tmp_path / "audio").mkdir()
    (tmp_path / "ann").mkdir()
    wavfile.write(tmp_path / "audio" / "clip.wav", fs,
                  (audio * 32767).astype(np.int16))
    (tmp_path / "ann" / "clip.txt").write_text(
        "onset,offset,note\n0.1,1.0,A4\n")

    monkeypatch.setattr(_sys, "argv", [
        "precompute_features.py",
        "--audio-dir", str(tmp_path / "audio"),
        "--csv-dir", str(tmp_path / "ann"),
        "--out-dir", str(tmp_path / "out"),
        "--schema", "phenicx"])
    precompute.main()

    f_hcqt = np.load(tmp_path / "out" / "hcqt" / "clip.npy")
    roll = np.load(tmp_path / "out" / "pitch" / "clip.npy")
    assert f_hcqt.ndim == 3 and f_hcqt.shape[0] == 216
    assert f_hcqt.shape[2] == 6 and f_hcqt.dtype == np.float32
    assert roll.shape == (128, f_hcqt.shape[1])
    mid = roll[:, roll.shape[1] // 2]          # inside the 0.1-1.0 s note
    assert mid[69] == 1.0 and mid.sum() == 1.0
    assert roll[:, 0].sum() == 0.0             # before onset: silence


def test_load_audio_normalizes_uint8_and_rejects_unknown(tmp_path):
    """8-bit WAVs are UNSIGNED (uint8, zero at 128): load_audio must
    remove the DC offset and scale to [-1, 1) — a raw passthrough would
    feed 0..255 into the HCQT (ADVICE r2). Unknown sample formats raise
    instead of silently mis-scaling."""
    from scipy.io import wavfile

    from multipitch_architectures_tpu.io import load_audio

    fs = 22050
    t = np.arange(fs // 2) / fs
    sig = 0.5 * np.sin(2 * np.pi * 440 * t)
    u8 = np.clip(np.round(sig * 127 + 128), 0, 255).astype(np.uint8)
    wavfile.write(tmp_path / "u8.wav", fs, u8)
    out = load_audio(str(tmp_path / "u8.wav"), fs)
    assert out.dtype == np.float32
    assert abs(out.mean()) < 2e-2                      # DC offset removed
    np.testing.assert_allclose(out, sig, atol=1.0 / 127)

    # int16 path unchanged: symmetric scaling by iinfo.max
    i16 = (sig * 32767).astype(np.int16)
    wavfile.write(tmp_path / "i16.wav", fs, i16)
    out16 = load_audio(str(tmp_path / "i16.wav"), fs)
    np.testing.assert_allclose(out16, sig, atol=1.0 / 32000)

    # STEREO int WAVs (ADVICE r3): the downmix mean must not promote the
    # samples to float64 before the dtype normalization — stereo int16
    # would otherwise be served at +/-32767 scale, and stereo uint8 would
    # keep its +128 DC offset. SWD/Exp3 raw audio is typically stereo.
    st16 = np.stack([i16, i16], axis=1)
    wavfile.write(tmp_path / "st16.wav", fs, st16)
    out_st = load_audio(str(tmp_path / "st16.wav"), fs)
    np.testing.assert_allclose(out_st, sig, atol=1.0 / 32000)
    st8 = np.stack([u8, u8], axis=1)
    wavfile.write(tmp_path / "st8.wav", fs, st8)
    out_st8 = load_audio(str(tmp_path / "st8.wav"), fs)
    assert abs(out_st8.mean()) < 2e-2
    np.testing.assert_allclose(out_st8, sig, atol=1.0 / 127)


@pytest.mark.slow
@pytest.mark.parametrize("name", [
    "exp180d_musicnet_unet_extremelylarge_doubleselfattn",   # SAUnet + BCE
    "exp195f_musicnet_unet_extremelylarge_polyphony_softmax",  # PUnet multitask
])
def test_flagship_families_end_to_end_smoke(name, tmp_path):
    """The attention flagship and the multitask PUnet run the FULL
    runner protocol (train + val + 3-subset stride-1 test) at smoke
    scale — covers tuple-output inference and the BCE+CE/25 loss through
    the runner, not just the trainer."""
    from multipitch_architectures_tpu.experiments import shrink_for_smoke

    cfg = shrink_for_smoke(load_experiment(name))
    corpus = SyntheticCorpus(cfg, frames=250, n_train_files=2)
    results = run_experiment(cfg, corpus, str(tmp_path),
                             max_epochs_override=1,
                             logger=logging.getLogger("flagship"))
    assert len(results["subsets"]) == 3
    fw = results["subsets"][0]["framewise_mean"]
    assert np.isfinite(fw["f_measure"])


def test_audio_corpus_cache_byte_bound(tmp_path):
    """cache_bytes bounds AudioCorpus residency with LRU eviction: with a
    cap that fits only one recording, loads still return correct arrays
    (recompute on miss) and the cache never exceeds the budget."""
    from scipy.io import wavfile

    from multipitch_architectures_tpu.experiments import AudioCorpus

    fs = 22050
    (tmp_path / "audio").mkdir()
    (tmp_path / "csv").mkdir()
    t = np.arange(fs) / fs
    for i, f0 in enumerate((330.0, 440.0)):
        audio = (0.4 * np.sin(2 * np.pi * f0 * t)).astype(np.float32)
        wavfile.write(tmp_path / "audio" / f"c{i}.wav", fs,
                      (audio * 32767).astype(np.int16))
        with open(tmp_path / "csv" / f"c{i}.csv", "w") as f:
            f.write("start_time,end_time,instrument,note\n")
            f.write(f"0,44100,1,{64 + i}\n")

    unbounded = AudioCorpus(str(tmp_path / "audio"), str(tmp_path / "csv"),
                            cache_bytes=None)
    assert unbounded.files() == ["c0.wav", "c1.wav"]
    want = {fn: unbounded.load(fn) for fn in unbounded.files()}
    one_size = want["c0.wav"][0].nbytes + want["c0.wav"][1].nbytes

    corpus = AudioCorpus(str(tmp_path / "audio"), str(tmp_path / "csv"),
                         cache_bytes=int(one_size * 1.5))
    for _epoch in range(2):                       # epochs keep re-reading
        for fn in corpus.files():
            got = corpus.load(fn)
            np.testing.assert_array_equal(got[0], want[fn][0])
            np.testing.assert_array_equal(got[1], want[fn][1])
            assert corpus._cache_nbytes <= corpus.cache_bytes
    assert len(corpus._cache) == 1                # LRU evicted the other


def test_runner_test_phase_shards_over_data_mesh(tmp_path):
    """With a multi-device mesh, the runner's test protocol dispatches
    through predict_framewise_sharded (cross-batch attention regrouped to
    per-reference-batch groups) and reproduces the single-device results
    (VERDICT r2 task 4)."""
    import dataclasses

    from multipitch_architectures_tpu.experiments import shrink_for_smoke
    from multipitch_architectures_tpu.parallel import make_mesh

    cfg = shrink_for_smoke(
        load_experiment(
            "exp180d_musicnet_unet_extremelylarge_doubleselfattn"))
    assert "cross_batch" in str(
        cfg.build_model().attn_mode)            # the regrouping path
    cfg = dataclasses.replace(cfg, test_batch_size=25)
    corpus = SyntheticCorpus(cfg, frames=250, n_train_files=1)

    kw = dict(do_train=False, do_val=False, store_predictions=True,
              store_results_filewise=False)
    single = run_experiment(cfg, corpus, str(tmp_path / "single"),
                            logger=logging.getLogger("shard_single"), **kw)

    log = logging.getLogger("shard_mesh")
    log.setLevel(logging.INFO)
    records = []

    class Capture(logging.Handler):
        def emit(self, r):
            records.append(r.getMessage())

    log.addHandler(Capture())
    sharded = run_experiment(cfg, corpus, str(tmp_path / "mesh"),
                             mesh=make_mesh(8), logger=log, **kw)
    assert any("Test dispatch sharded over 8 data devices" in m
               for m in records)

    for s_sub, m_sub in zip(single["subsets"], sharded["subsets"]):
        assert s_sub["n_files"] == m_sub["n_files"]
        for key in s_sub["framewise_mean"]:
            assert m_sub["framewise_mean"][key] == pytest.approx(
                s_sub["framewise_mean"][key], abs=1e-5), key
    # the stored stride-1 predictions themselves match
    for p in (tmp_path / "single" / "predictions" / cfg.name).glob("*.npy"):
        a = np.load(p)
        b = np.load(tmp_path / "mesh" / "predictions" / cfg.name / p.name)
        np.testing.assert_allclose(b, a, atol=2e-5)


def test_family_golden_exp126a_cnn():
    """Field-by-field golden vs exp126a_musicnet_cnn_basic.py:38-138
    (Exp1 CNN family) — catches silent registry mis-extraction."""
    cfg = load_experiment("exp126a_musicnet_cnn_basic")
    assert cfg.family == "Exp1_SectionIV-B"
    assert cfg.model_class == "basic_cnn_segm_sigmoid"
    assert cfg.model_kwargs["n_chan_layers"] == [20, 20, 10, 1]
    assert cfg.model_kwargs["a_lrelu"] == 0.3
    assert cfg.model_kwargs["p_dropout"] == 0.2
    assert cfg.model_kwargs["n_bins_in"] == 216
    assert (cfg.train_stride, cfg.val_stride, cfg.test_stride) == (50, 50, 1)
    assert cfg.train_config.batch_size == 25
    assert cfg.val_batch_size == 50 and cfg.test_batch_size == 50
    assert cfg.train_config.max_epochs == 100
    assert cfg.train_config.loss == "bce"
    assert cfg.train_config.initial_lr == 0.001
    assert cfg.train_config.betas == (0.9, 0.999)
    assert cfg.train_config.weight_decay == 0.01
    assert cfg.train_config.scheduler == "ReduceLROnPlateau"
    sp = cfg.train_config.scheduler_params
    assert (sp["factor"], sp["patience"], sp["min_lr"]) == (0.5, 5, 1e-6)
    assert cfg.train_config.es_min_delta == 1e-5
    assert cfg.train_config.es_patience == 12
    assert cfg.train_config.es_percentage is False
    a = cfg.augment
    assert (a.transposition, a.randomeq, a.noisestd, a.tuning,
            a.compression) == (5, 20, 1e-4, True, 10)
    assert cfg.train_config.max_train_batches is None   # not a moresamples run
    assert cfg.test_versions[0] == "2303_" and cfg.test_versions[-1] == "2629_"
    assert cfg.test_versions_small == ["2303_", "1819_", "2382_"]


def test_family_golden_retrain4_exp128c_moresamples():
    """Golden vs RETRAIN4_exp128c…moresamples.py:39-76,247-253,345-346
    (Exp2: deep resnet-wide CNN, stride-20 moresamples cap, 6 extra
    test subsets)."""
    cfg = load_experiment(
        "RETRAIN4_exp128c_musicnet_cnn_deepresnetwide_moresamples")
    assert cfg.family == "Exp2_SectionIV-C"
    assert cfg.model_class == "deep_cnn_segm_sigmoid"
    assert cfg.model_kwargs["n_chan_layers"] == [40, 40, 30, 10]
    assert cfg.model_kwargs["n_prefilt_layers"] == 5
    assert cfg.model_kwargs["residual"] is True
    assert (cfg.train_stride, cfg.val_stride, cfg.test_stride) == (20, 20, 1)
    assert cfg.train_config.initial_lr == 0.0002
    assert cfg.train_config.max_train_batches == 3800   # :345 n_batches cap
    # the 6-subset RETRAIN4 test loop (:253): versions1 == test_versions,
    # plus Wu / slow / fast variants and the TRIOS-style pieces
    assert set(cfg.extra_test_subsets) == {
        "test_versions1", "test_versions2", "test_versions3",
        "test_versions4", "test_pieces"}
    assert cfg.extra_test_subsets["test_versions1"] == cfg.test_versions
    assert cfg.extra_test_subsets["test_versions2"][-1] == "2628_"
    assert cfg.extra_test_subsets["test_versions3"][0] == "2302_"
    assert cfg.extra_test_subsets["test_versions4"][0] == "2310_"
    assert "Bach_BWV1006_ViolinPartita" in cfg.extra_test_subsets["test_pieces"]


def test_family_golden_exp201b_schubert_songsplit():
    """Golden vs exp201b_schubert_songsplit…py:39-84,240-242 (Exp3:
    explicit D911 song-level train/val/test splits)."""
    cfg = load_experiment(
        "exp201b_schubert_songsplit_unet_extremelylarge_doubleselfattn")
    assert cfg.family == "Exp3_SectionIV-D"
    assert cfg.model_class == "simple_u_net_doubleselfattn"
    assert cfg.model_kwargs["n_chan_layers"] == [128, 80, 50, 30]
    assert cfg.model_kwargs["scalefac"] == 4
    assert cfg.model_kwargs["embed_dim"] == 128       # 16*8, :81
    assert cfg.model_kwargs["mlp_dim"] == 8192
    assert cfg.model_kwargs["pos_encoding"] == "sinusoidal"
    assert (cfg.train_stride, cfg.val_stride, cfg.test_stride) == (10, 10, 1)
    assert cfg.train_config.initial_lr == 0.001
    assert cfg.train_versions == [f"D911-{i:02d}" for i in range(1, 14)]
    assert cfg.val_versions == ["D911-14", "D911-15", "D911-16"]
    assert cfg.test_versions == [f"D911-{i}" for i in range(17, 25)]


def test_family_golden_exp210d_bigmix():
    """Golden vs exp210d_bigmix…py:39,249,294-295,310-311,346-348,
    359-360,393-394,405,424-426,437-438,471 (Exp4: five-corpus big mix
    with per-corpus strides and the TRIOS final test set)."""
    from multipitch_architectures_tpu.experiments.configs import \
        BIGMIX_STRIDES

    cfg = load_experiment("exp210d_bigmix_unet_extremelylarge_doubleselfattn")
    assert cfg.family == "Exp4_SectionIV-E"
    assert cfg.model_class == "simple_u_net_doubleselfattn"
    assert cfg.model_kwargs["n_chan_layers"] == [128, 80, 50, 30]
    assert cfg.model_kwargs["scalefac"] == 4
    assert cfg.train_config.max_train_batches == 3800
    assert cfg.train_config.initial_lr == 0.001
    # base (MusicNet) stride 35 (:39); per-corpus overrides live in
    # BIGMIX_STRIDES, matching the script's in-place reassignments
    assert cfg.train_stride == 35
    assert BIGMIX_STRIDES["MusicNet"] == (35, 35)
    assert BIGMIX_STRIDES["SWD"] == (6, 4)              # :310-311
    assert BIGMIX_STRIDES["Bach10"] == (1, 1)           # :359-360
    assert BIGMIX_STRIDES["PHENICX-Anechoic"] == (2, 2)  # :405
    assert BIGMIX_STRIDES["ChoralSingingDataset"] == (4, 4)  # :437-438
    # the final aggregate test set is TRIOS (:471)
    assert cfg.test_versions == ["brahms", "lussier", "mozart", "schubert",
                                 "take_five"]


def test_audio_corpus_swd_annotation_schema(tmp_path):
    """AudioCorpus ingests SWD ann_audio_note CSVs (semicolon-separated,
    seconds, 'pitch' column) alongside MusicNet's sample-index schema —
    Exp3 runnable from raw audio (VERDICT r2 task 9)."""
    from scipy.io import wavfile

    from multipitch_architectures_tpu.experiments import AudioCorpus
    from multipitch_architectures_tpu.io import load_note_events

    fs = 22050
    t = np.arange(fs) / fs
    (tmp_path / "audio").mkdir()
    (tmp_path / "csv").mkdir()
    wavfile.write(tmp_path / "audio" / "D911-01_HU33.wav", fs,
                  (0.4 * np.sin(2 * np.pi * 440 * t) * 32767).astype(np.int16))
    with open(tmp_path / "csv" / "D911-01_HU33.csv", "w") as f:
        f.write("start;end;pitch;velocity;instrument\n")
        f.write("0.0;0.5;69;42;voice\n0.25;0.9;57;40;piano\n")

    ev = load_note_events(str(tmp_path / "csv" / "D911-01_HU33.csv"))
    np.testing.assert_allclose(ev, [[0.0, 0.5, 69], [0.25, 0.9, 57]])

    corpus = AudioCorpus(str(tmp_path / "audio"), str(tmp_path / "csv"))
    inputs, targets = corpus.load("D911-01_HU33.wav")
    assert targets[:, 69].any() and targets[:, 57].any()
    # 69 active only in the first half, 57 from 0.25 s on
    fs_frames = targets.shape[0]
    assert not targets[int(0.6 * fs_frames):, 69].any()
    assert not targets[:int(0.2 * fs_frames), 57].any()
