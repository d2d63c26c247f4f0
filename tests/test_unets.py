"""Parity tests for the U-Net family.

1. Parameter counts of the paper configs match the *true* torch parameter
   counts of the reference models. NB the torchinfo totals embedded in the
   reference logs undercount by 4e²+4e per ``nn.MultiheadAttention`` (its
   packed in_proj/out_proj params are invisible to old torchinfo); e.g.
   SAUnet:L logs 7,982,907 but ``sum(p.numel())`` = 8,115,003 — we assert
   both identities.
2. Forward parity vs the reference torch models on random ported weights
   (eval mode, cross-batch attention quirk included).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from multipitch_architectures_tpu import models as M
from multipitch_architectures_tpu.models import port

from conftest import reference_models, patched_torch_cpu

MHA_PARAMS = lambda e: 4 * e * e + 4 * e  # packed in_proj + out_proj


def flax_param_count(model, shape=(1, 6, 75, 216)):
    v = jax.eval_shape(
        lambda: model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros(shape, jnp.float32), train=False)
    )
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(v["params"]))


def torch_param_count(tm):
    return sum(p.numel() for p in tm.parameters())


# ---------------------------------------------------------------------------
# Paper-config parameter counts (SURVEY.md §2.8, reference logs §6)
# ---------------------------------------------------------------------------

def test_param_count_saunet_l():
    """SAUnet:L = exp180d config; log says 7,982,907 (torchinfo, misses MHA)."""
    ref = reference_models()
    kw = dict(n_chan_layers=(128, 80, 50, 30), n_bins_out=72, scalefac=4,
              embed_dim=128, num_heads=8, mlp_dim=8192,
              pos_encoding="sinusoidal")
    mine = flax_param_count(M.SimpleUNetDoubleSelfAttn(**kw))
    assert mine - 2 * MHA_PARAMS(128) == 7982907  # logged torchinfo total
    if ref is not None:
        with patched_torch_cpu():
            tm = ref.simple_u_net_doubleselfattn(
                n_chan_layers=[128, 80, 50, 30], n_bins_out=72, scalefac=4,
                embed_dim=128, num_heads=8, mlp_dim=8192,
                pos_encoding="sinusoidal")
        assert mine == torch_param_count(tm)


def test_param_count_sausnet_xl():
    """SAUSnet:XL = exp181f config; log says 14,435,647."""
    kw = dict(n_chan_layers=(128, 200, 150, 150), n_bins_out=72, scalefac=4,
              embed_dim=128, mlp_dim=8192, pos_encoding="sinusoidal")
    mine = flax_param_count(M.SimpleUNetDoubleSelfAttnTwoLayers(**kw))
    assert mine - 4 * MHA_PARAMS(128) == 14435647


def test_param_count_blunet_l():
    """BLUnet:L = exp186d config; log says 9,649,003 (no MHA: exact)."""
    kw = dict(n_chan_layers=(128, 80, 50, 30), n_bins_out=72, scalefac=8,
              embed_dim=832, hidden_size=416, lstm_depth=1, lstm_number=2)
    assert flax_param_count(M.UNetBlstmVarLayers(**kw)) == 9649003


def test_param_count_punet_xl():
    """PUnet:XL = exp195f config; log says 14,597,963 (no MHA: exact)."""
    kw = dict(n_chan_layers=(128, 180, 150, 100), n_bins_out=72, scalefac=2,
              num_polyphony_steps=24)
    assert flax_param_count(M.SimpleUNetPolyphonyClassifSoftmax(**kw)) == 14597963


def test_param_count_unet_m():
    """Unet:M = exp160g config; log says 1,654,633 (no MHA: exact)."""
    kw = dict(n_chan_layers=(128, 100, 80, 50), n_bins_out=72, scalefac=8)
    assert flax_param_count(M.SimpleUNetLargeKernels(**kw)) == 1654633


# ---------------------------------------------------------------------------
# Forward parity vs the reference torch models
# ---------------------------------------------------------------------------

TINY = dict(n_chan_layers=[8, 8, 4, 2], n_bins_out=72, scalefac=16)
ATTN = dict(embed_dim=32, num_heads=8, mlp_dim=64)


def _case(name):
    """(torch_name, torch_kwargs, flax_cls, flax_kwargs, porter, n_outputs)."""
    if name == "simple_u_net":
        return ("simple_u_net", TINY, M.SimpleUNet, TINY,
                port.port_unet_auto, 1)
    if name == "largekernels":
        return ("simple_u_net_largekernels", TINY, M.SimpleUNetLargeKernels,
                TINY, port.port_unet_auto, 1)
    if name == "selfattn":
        kw = {**TINY, **ATTN}
        return ("simple_u_net_selfattn", kw, M.SimpleUNetSelfAttn, kw,
                port.port_unet_auto, 1)
    if name == "doubleselfattn_pe":
        kw = {**TINY, **ATTN, "pos_encoding": "sinusoidal"}
        return ("simple_u_net_doubleselfattn", kw, M.SimpleUNetDoubleSelfAttn,
                kw, port.port_unet_auto, 1)
    if name == "doubleselfattn_residual":
        kw = {**TINY, **ATTN, "residual": True, "convdrop": 0.1}
        return ("simple_u_net_doubleselfattn", kw, M.SimpleUNetDoubleSelfAttn,
                kw, port.port_unet_auto, 1)
    if name == "sixselfattn":
        kw = {**TINY, **ATTN}
        return ("simple_u_net_sixselfattn", kw, M.SimpleUNetSixSelfAttn, kw,
                port.port_unet_auto, 1)
    if name == "twolayers":
        kw = {**TINY, **ATTN, "pos_encoding": "sinusoidal"}
        return ("simple_u_net_doubleselfattn_twolayers", kw,
                M.SimpleUNetDoubleSelfAttnTwoLayers, kw,
                port.port_unet_auto, 1)
    if name == "alllayers":
        kw = dict(n_chan_layers=[8, 8, 4, 2], n_bins_out=72, scalefac=8,
                  embed_dim=64, num_heads=8, mlp_dim=64)
        return ("simple_u_net_doubleselfattn_alllayers", kw,
                M.SimpleUNetDoubleSelfAttnAllLayers, kw,
                port.port_unet_auto, 1)
    if name == "varlayers_depth3":
        # no pos_encoding: at depth 3 the level-3 map has 18*54=972 tokens,
        # which overflows the reference's 600-entry positional table and
        # crashes there too (unet_cnns.py:117,152)
        kw = dict(n_chan_layers=[8, 8, 4, 2], n_bins_out=72, scalefac=8,
                  embed_dim=64, num_heads=8, mlp_dim=64, self_attn_depth=3,
                  self_attn_number=2)
        return ("simple_u_net_doubleselfattn_varlayers", kw,
                M.SimpleUNetDoubleSelfAttnVarLayers, kw,
                port.port_unet_auto, 1)
    if name == "blstm_depth1":
        # NB lstm_depth>1 is unusable in the reference too: embed_dim can
        # only match C*F at one level (13 vs 27 freq bins), so nn.LSTM would
        # reject the level-4 input. depth=1/number=2 is the exp186* config.
        kw = dict(n_chan_layers=[8, 8, 4, 2], n_bins_out=72, scalefac=16,
                  embed_dim=416, hidden_size=208, lstm_depth=1, lstm_number=2)
        return ("u_net_blstm_varlayers", kw, M.UNetBlstmVarLayers, kw,
                port.port_unet_auto, 1)
    if name == "temporal_selfattn":
        kw = dict(n_chan_layers=[8, 8, 4, 2], n_bins_out=72, scalefac=2,
                  embed_dim=1728, num_heads=8, mlp_dim=64, self_attn_depth=1,
                  self_attn_number=2, pos_encoding="sinusoidal")
        return ("u_net_temporal_selfattn_varlayers", kw,
                M.UNetTemporalSelfAttnVarLayers, kw, port.port_unet_auto, 1)
    if name == "temporal_blstm":
        kw = dict(n_chan_layers=[8, 8, 4, 2], n_bins_out=72, scalefac=2,
                  embed_dim=1728, hidden_size=864, lstm_depth=1, lstm_number=1)
        return ("u_net_temporal_blstm_varlayers", kw,
                M.UNetTemporalBlstmVarLayers, kw, port.port_unet_auto, 1)
    if name == "polyphony":
        kw = {**TINY, **ATTN}
        return ("simple_u_net_doubleselfattn_polyphony", kw,
                M.SimpleUNetDoubleSelfAttnPolyphony, kw,
                port.port_unet_auto, 2)
    if name == "polyphony_classif":
        kw = {**TINY, **ATTN, "num_polyphony_steps": 8}
        return ("simple_u_net_doubleselfattn_polyphony_classif", kw,
                M.SimpleUNetDoubleSelfAttnPolyphonyClassif, kw,
                port.port_unet_auto, 2)
    if name == "polyphony_softmax":
        kw = {**TINY, "num_polyphony_steps": 8}
        return ("simple_u_net_polyphony_classif_softmax", kw,
                M.SimpleUNetPolyphonyClassifSoftmax, kw,
                port.port_unet_auto, 2)
    if name == "polyphony_plain":
        kw = {**TINY, "num_polyphony_steps": 8}
        return ("simple_u_net_polyphony_classif", kw,
                M.SimpleUNetPolyphonyClassif, kw, port.port_unet_auto, 2)
    if name == "freq_selfattn":
        kw = dict(n_chan_layers=[32, 8, 4, 2], n_bins_out=72, scalefac=2,
                  embed_dim=32, num_heads=8, mlp_dim=64)
        return ("freq_u_net_selfattn", kw, M.FreqUNetSelfAttn, kw,
                port.port_freq_u_net_selfattn, 1)
    if name == "freq_doubleselfattn":
        kw = dict(n_chan_layers=[32, 8, 4, 2], n_bins_out=72, scalefac=2,
                  embed_dim=32, num_heads=8, mlp_dim=64)
        return ("freq_u_net_doubleselfattn", kw, M.FreqUNetDoubleSelfAttn, kw,
                lambda sd: port.port_freq_u_net_selfattn(sd, double=True), 1)
    raise KeyError(name)


CASES = [
    "simple_u_net", "largekernels", "selfattn", "doubleselfattn_pe",
    "doubleselfattn_residual", "sixselfattn", "twolayers", "alllayers",
    "varlayers_depth3", "blstm_depth1", "temporal_selfattn", "temporal_blstm",
    "polyphony", "polyphony_classif", "polyphony_softmax", "polyphony_plain",
    "freq_selfattn", "freq_doubleselfattn",
]

# The fast (-m "not slow") loop checks one representative of each
# architectural ingredient — plain conv U-Net, bottleneck attention,
# BLSTM, multitask softmax head, frequency-axis attention; the full
# sweep (every variant, every porter branch) runs with the slow suite.
FAST_CASES = {"simple_u_net", "doubleselfattn_pe", "blstm_depth1",
              "polyphony_softmax", "freq_doubleselfattn"}


@pytest.mark.parametrize(
    "name", [n if n in FAST_CASES else
             pytest.param(n, marks=pytest.mark.slow) for n in CASES])
def test_forward_parity_vs_reference(name):
    ref = reference_models()
    if ref is None:
        pytest.skip("reference torch models unavailable")
    import torch

    tname, tkw, fcls, fkw, porter, n_out = _case(name)
    torch.manual_seed(0)
    with patched_torch_cpu():
        tm = getattr(ref, tname)(**{k: (list(v) if isinstance(v, tuple) else v)
                                    for k, v in tkw.items()})
    tm.eval()
    jm = fcls(**{k: (tuple(v) if isinstance(v, list) else v)
                 for k, v in fkw.items()})

    x = np.random.RandomState(1).rand(3, 6, 75, 216).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x))
    want = [w.numpy() for w in (want if n_out > 1 else (want,))]

    variables = jax.tree.map(jnp.asarray, porter(tm.state_dict()))
    got = jm.apply(variables, jnp.asarray(x), train=False)
    got = [np.asarray(g) for g in (got if n_out > 1 else (got,))]

    assert len(got) == len(want)
    for i, (g, w) in enumerate(zip(got, want)):
        assert g.shape == w.shape
        # output 0 is bounded (sigmoid); output 1 (polyphony) is raw/ReLU
        # logits where fp32 conv accumulation-order noise is larger
        # (semantic parity is exact: 4e-13 in f64).
        np.testing.assert_allclose(g, w, atol=2e-4 if i == 0 else 5e-3,
                                   rtol=1e-2)


def test_unet_dense_inference_shape():
    """Dense whole-segment mode: T frames in → T-74 framewise predictions."""
    m = M.SimpleUNetLargeKernels(**{**TINY, "n_chan_layers": (8, 8, 4, 2)})
    x = jnp.zeros((1, 6, 150, 216))
    v = m.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    y = m.apply(v, x, train=False)
    assert y.shape == (1, 1, 76, 72)


def test_train_mode_runs_with_dropout_and_bn():
    """Train-mode forward with dropout RNG + BatchNorm stat mutation."""
    m = M.SimpleUNetDoubleSelfAttn(
        n_chan_layers=(8, 8, 4, 2), n_bins_out=72, scalefac=16,
        embed_dim=32, num_heads=8, mlp_dim=64)
    x = jnp.zeros((2, 6, 75, 216))
    v = m.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    y, updates = m.apply(
        v, x, train=True, rngs={"dropout": jax.random.PRNGKey(1)},
        mutable=["batch_stats"])
    assert y.shape == (2, 1, 1, 72)
    assert "batch_stats" in updates


def test_transenc_forward_parity():
    """simple_u_net_doubleselfattn_transenc: parity modulo the reference's
    stray 5-D unsqueeze (unet_cnns.py:1525) — we compare squeezed."""
    ref = reference_models()
    if ref is None:
        pytest.skip("reference torch models unavailable")
    import torch

    kw = dict(n_chan_layers=[8, 4, 4, 2], n_bins_out=72, scalefac=8,
              embed_dim=64, num_heads=8, mlp_dim=64, self_attn_depth=1,
              self_attn_number=2, time_embed_dim=4 * 72)
    torch.manual_seed(0)
    with patched_torch_cpu():
        tm = ref.simple_u_net_doubleselfattn_transenc(**kw)
    tm.eval()
    jm = M.SimpleUNetDoubleSelfAttnTransEnc(
        **{k: (tuple(v) if isinstance(v, list) else v) for k, v in kw.items()})
    x = np.random.RandomState(1).rand(2, 6, 75, 216).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()
    want = want.reshape(want.shape[0], -1, want.shape[-1])  # drop 5-D quirk
    variables = jax.tree.map(jnp.asarray,
                             port.port_unet_transenc(tm.state_dict()))
    got = np.asarray(jm.apply(variables, jnp.asarray(x), train=False))
    got = got.reshape(got.shape[0], -1, got.shape[-1])
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-2)


def test_export_state_dict_roundtrip():
    """flax -> torch state_dict -> flax roundtrip is exact, and the
    exported dict loads into the reference torch model."""
    ref = reference_models()
    if ref is None:
        pytest.skip("reference torch models unavailable")
    import torch

    kw = dict(n_chan_layers=[8, 8, 4, 2], n_bins_out=72, scalefac=16,
              embed_dim=32, num_heads=8, mlp_dim=64,
              pos_encoding="sinusoidal")
    jm = M.SimpleUNetDoubleSelfAttn(
        **{k: (tuple(v) if isinstance(v, list) else v) for k, v in kw.items()})
    variables = jm.init({"params": jax.random.PRNGKey(3)},
                        jnp.zeros((1, 6, 75, 216)), train=False)
    sd = port.export_state_dict(variables)
    back = port.port_unet_auto(sd)
    for (ka, a), (kb, b) in zip(
            sorted(jax.tree_util.tree_flatten_with_path(variables)[0],
                   key=lambda t: str(t[0])),
            sorted(jax.tree_util.tree_flatten_with_path(back)[0],
                   key=lambda t: str(t[0]))):
        assert str(ka) == str(kb)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)

    # the exported dict must load into the actual torch class
    with patched_torch_cpu():
        tm = ref.simple_u_net_doubleselfattn(**kw)
    tm.load_state_dict({k: torch.from_numpy(np.asarray(v))
                        for k, v in sd.items()})
    tm.eval()
    x = np.random.RandomState(5).rand(2, 6, 75, 216).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()
    got = np.asarray(jm.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-2)
