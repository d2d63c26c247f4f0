"""Checkpoint porter: torch ``state_dict`` -> flax variable pytrees.

Consumes state dicts saved by the reference's experiment scripts
(``torch.save(model.state_dict(), ...)``, exp180d...py:372-378) or the shipped
pretrained ``.pt`` files, and emits ``{'params': ..., 'batch_stats': ...}``
for the matching flax model class in this package.

Layout conversions:
- Conv2d OIHW -> HWIO; Linear (out,in) -> (in,out);
- the harmonic LayerNorm affine (C,F) -> (F,C) (we keep NHWC maps);
- MultiheadAttention packed in_proj / out_proj kept in torch layout
  (ops.attention applies them torch-style);
- LSTM weights kept in torch layout (ops.lstm applies them torch-style).
"""

from typing import Dict

import numpy as np


def _np(t):
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def _conv(sd, p):
    out = {"kernel": _np(sd[f"{p}.weight"]).transpose(2, 3, 1, 0)}
    if f"{p}.bias" in sd:
        out["bias"] = _np(sd[f"{p}.bias"])
    return out


def _dense(sd, p, bias=True):
    out = {"kernel": _np(sd[f"{p}.weight"]).T}
    if bias and f"{p}.bias" in sd:
        out["bias"] = _np(sd[f"{p}.bias"])
    return out


def _ln(sd, p):
    return {"scale": _np(sd[f"{p}.weight"]), "bias": _np(sd[f"{p}.bias"])}


def _harmonic_ln(sd, p):
    # torch stores (C, F); our NHWC layout wants (F, C).
    return {"scale": _np(sd[f"{p}.weight"]).T, "bias": _np(sd[f"{p}.bias"]).T}


def _bn(sd, p):
    params = {"scale": _np(sd[f"{p}.weight"]), "bias": _np(sd[f"{p}.bias"])}
    stats = {"mean": _np(sd[f"{p}.running_mean"]), "var": _np(sd[f"{p}.running_var"])}
    return params, stats


def _mha(sd, p):
    return {
        "in_proj_weight": _np(sd[f"{p}.in_proj_weight"]),
        "in_proj_bias": _np(sd[f"{p}.in_proj_bias"]),
        "out_proj_weight": _np(sd[f"{p}.out_proj.weight"]),
        "out_proj_bias": _np(sd[f"{p}.out_proj.bias"]),
    }


def _lstm(sd, p):
    prefix = f"{p}."
    return {k[len(prefix):]: _np(v) for k, v in sd.items() if k.startswith(prefix)}


def _transformer_enc(sd, p, learnable_pe=False):
    out = {
        "q_linear": _dense(sd, f"{p}.q_linear", bias=False),
        "k_linear": _dense(sd, f"{p}.k_linear", bias=False),
        "v_linear": _dense(sd, f"{p}.v_linear", bias=False),
        "o_linear": _dense(sd, f"{p}.o_linear", bias=False),
        "attn": _mha(sd, f"{p}.attn"),
        "mlp1": _dense(sd, f"{p}.mlp.0"),
        "mlp2": _dense(sd, f"{p}.mlp.2"),
        "layernorm1": _ln(sd, f"{p}.layernorm1"),
        "layernorm2": _ln(sd, f"{p}.layernorm2"),
    }
    if learnable_pe:
        out["pe"] = _np(sd[f"{p}.pe"])
    return out


def _double_conv(sd, p):
    """Port a reference ``double_conv`` Sequential, resolving which of the
    three layouts it was built with (unet_cnns.py:40-70):

    - convdrop=None:  0 conv, 1 bn, 3 conv, 4 bn
    - convdrop=p:     0 conv, 1 bn, 4 conv, 5 bn   (the default path)
    - alt_order:      1 bn, 3 conv, 5 bn, 7 conv
    """
    q = f"{p}.double_conv"
    params: Dict = {}
    stats: Dict = {}
    if f"{q}.0.weight" in sd and _np(sd[f"{q}.0.weight"]).ndim == 4:
        params["conv1"] = _conv(sd, f"{q}.0")
        params["bn1"], stats["bn1"] = _bn(sd, f"{q}.1")
        idx = 4 if f"{q}.4.weight" in sd and _np(sd[f"{q}.4.weight"]).ndim == 4 else 3
        params["conv2"] = _conv(sd, f"{q}.{idx}")
        params["bn2"], stats["bn2"] = _bn(sd, f"{q}.{idx + 1}")
    else:  # alt_order
        params["bn1"], stats["bn1"] = _bn(sd, f"{q}.1")
        params["conv1"] = _conv(sd, f"{q}.3")
        params["bn2"], stats["bn2"] = _bn(sd, f"{q}.5")
        params["conv2"] = _conv(sd, f"{q}.7")
    if f"{p}.resize.weight" in sd:
        params["resize"] = _conv(sd, f"{p}.resize")
    return params, stats


def _pitch_head(sd, conv2="conv2.0", conv3="conv3.0", conv4="conv4.0",
                conv5="conv4.3"):
    return {
        "conv2": {"conv": _conv(sd, conv2)},
        "conv3": {"conv": _conv(sd, conv3)},
        "conv4": {"conv": _conv(sd, conv4)},
        "conv5": _conv(sd, conv5),
    }


# --------------------------------------------------------------------------
# basic_cnns.py family
# --------------------------------------------------------------------------

def port_basic_cnn(sd):
    """basic_cnn / basic_cnn_pool / basic_cnn_segm_sigmoid share key names."""
    params = {
        "layernorm": {"ln": _harmonic_ln(sd, "layernorm")},
        "conv1": {"conv": _conv(sd, "conv1.0")},
        "conv2": {"conv": _conv(sd, "conv2.0")},
        "conv3": {"conv": _conv(sd, "conv3.0")},
        "conv4": {"conv": _conv(sd, "conv4.0")},
        "conv5": _conv(sd, "conv4.3"),
    }
    return {"params": params}


def port_basic_cnn_segm(sd, n_out_convs=1):
    """Segm variants: trunk(layernorm+conv1) + head(conv2..conv5)."""
    params = {
        "trunk": {
            "layernorm": {"ln": _harmonic_ln(sd, "layernorm")},
            "conv1": {"conv": _conv(sd, "conv1.0")},
        },
        "head": _pitch_head(sd),
    }
    return {"params": params}


def port_basic_cnn_segm_blank(sd):
    params = {
        "trunk": {
            "layernorm": {"ln": _harmonic_ln(sd, "layernorm")},
            "conv1": {"conv": _conv(sd, "conv1.0")},
        },
        "conv2": {"conv": _conv(sd, "conv2.0")},
        "conv3": {"conv": _conv(sd, "conv3.0")},
        "conv4": {"conv": _conv(sd, "conv4.0")},
        "conv5a": _conv(sd, "conv5a"),
        "conv5b": _conv(sd, "conv5b"),
    }
    return {"params": params}


def port_deep_cnn_segm_sigmoid(sd, n_prefilt_layers):
    params = {
        "trunk": {
            "layernorm": {"ln": _harmonic_ln(sd, "layernorm")},
            "conv1": {"conv": _conv(sd, "conv1.0")},
        },
        "head": _pitch_head(sd),
    }
    for p in range(n_prefilt_layers - 1):
        params[f"prefilt{p}"] = {"conv": _conv(sd, f"prefilt_list.{p}.0")}
    return {"params": params}


# --------------------------------------------------------------------------
# unet_cnns.py family
# --------------------------------------------------------------------------

def _unet_trunk(sd):
    """layernorm + inc/down1..4 + upconv1..4 (all simple_u_net* models)."""
    params = {"layernorm": {"ln": _harmonic_ln(sd, "layernorm")}}
    stats = {}
    params["inc"], stats["inc"] = _double_conv(sd, "inc")
    for i in range(1, 5):
        params[f"down{i}"], stats[f"down{i}"] = _double_conv(sd, f"down{i}.1")
    for i in range(1, 5):
        params[f"upconv{i}"], stats[f"upconv{i}"] = _double_conv(sd, f"upconv{i}")
    return params, stats


def port_simple_u_net(sd, attention_names=(), learnable_pe=(), lstm_names=(),
                      polyphony=False):
    """Generic porter for the simple_u_net family.

    ``attention_names``: reference module names of transformer_enc_layers
    (e.g. ('attention1', 'attention2')); ``learnable_pe`` lists which of them
    carry a learnable positional encoding. ``lstm_names`` for BLSTM layers.
    ``polyphony=True`` also ports the convP head.
    """
    params, stats = _unet_trunk(sd)
    for name in attention_names:
        params[name] = _transformer_enc(sd, name, learnable_pe=name in learnable_pe)
    for name in lstm_names:
        params[name] = {"blstm": _lstm(sd, f"{name}.blstm")}
    params["head"] = _pitch_head(sd)
    if polyphony:
        params["convP1"] = _conv(sd, "convP.0")
        params["convP2"] = _conv(sd, "convP.4")
    return {"params": params, "batch_stats": stats}


def _attn_names_in(sd):
    """All transformer_enc_layer module names present in a state dict
    (keys look like '<name>.q_linear.weight')."""
    return sorted({k.split(".")[0] for k in sd
                   if k.endswith(".q_linear.weight")})


def _lstm_names_in(sd):
    return sorted({k.split(".")[0] for k in sd if ".blstm.weight_ih_l0" in k})


def port_unet_auto(sd, polyphony=None, learnable_pe=()):
    """Port any simple_u_net / u_net_*_varlayers state dict by discovering
    which attention/LSTM modules it contains. ``polyphony`` default:
    auto-detect from the presence of convP keys."""
    if polyphony is None:
        polyphony = "convP.0.weight" in sd
    return port_simple_u_net(
        sd,
        attention_names=[n for n in _attn_names_in(sd)
                         if n.startswith("attention")],
        learnable_pe=learnable_pe,
        lstm_names=_lstm_names_in(sd),
        polyphony=polyphony,
    )


def port_unet_transenc(sd, learnable_pe=()):
    """Port ``simple_u_net_doubleselfattn_transenc`` (unet_cnns.py:1370-1526):
    varlayers-style trunk + conv2 + two temporal attention layers + 1x1
    reduction head."""
    params, stats = _unet_trunk(sd)
    for name in _attn_names_in(sd):
        if name.startswith("attention"):
            params[name] = _transformer_enc(sd, name,
                                            learnable_pe=name in learnable_pe)
    params["conv2"] = {"conv": _conv(sd, "conv2.0")}
    params["reduction"] = _conv(sd, "reduction.0")
    return {"params": params, "batch_stats": stats}


def _bn_conv_selu(sd, p):
    """torch Sequential(BatchNorm2d, Conv2d, SELU) -> _BNConvSELU params."""
    bn_params, bn_stats = _bn(sd, f"{p}.0")
    return ({"bn": bn_params, "conv": _conv(sd, f"{p}.1")}, {"bn": bn_stats})


def _freq_attn_block(sd, suffix="", ln_ids=(5, 6)):
    """Inline attention block of freq_u_net_*selfattn (unet_cnns.py:1730-1746).
    torch names: q/k/v/o_linear{suffix}, attn{suffix}, layernorm{i}/{j},
    mlp{j} (a Sequential with Linears at .0 and .2)."""
    i, j = ln_ids
    return {
        f"q_linear{suffix}": _dense(sd, f"q_linear{suffix}", bias=False),
        f"k_linear{suffix}": _dense(sd, f"k_linear{suffix}", bias=False),
        f"v_linear{suffix}": _dense(sd, f"v_linear{suffix}", bias=False),
        f"o_linear{suffix}": _dense(sd, f"o_linear{suffix}", bias=False),
        f"attn{suffix}": _mha(sd, f"attn{suffix}"),
        f"layernorm{i}": _ln(sd, f"layernorm{i}"),
        f"mlp{j}_1": _dense(sd, f"mlp{j}.0"),
        f"mlp{j}_2": _dense(sd, f"mlp{j}.2"),
        f"layernorm{j}": _ln(sd, f"layernorm{j}"),
    }


def port_freq_u_net_selfattn(sd, double=False):
    """Port ``freq_u_net_selfattn`` / ``freq_u_net_doubleselfattn``
    (unet_cnns.py:1691-1970). Heads are conv4/conv5/conv6 in torch."""
    params = {"layernorm": {"ln": _harmonic_ln(sd, "layernorm")}}
    stats = {}
    params["conv1"] = {"conv": _conv(sd, "conv1.0")}
    for name in ("conv2", "conv3", "up_conv3", "up_conv2", "up_conv1"):
        params[name], stats[name] = _bn_conv_selu(sd, name)
    params["attnblock1"] = _freq_attn_block(sd)
    if double:
        params["attnblock2"] = _freq_attn_block(sd, suffix="2", ln_ids=(7, 8))
    params["head"] = _pitch_head(sd, conv2="conv4.0", conv3="conv5.0",
                                 conv4="conv6.0", conv5="conv6.3")
    return {"params": params, "batch_stats": stats}


# --------------------------------------------------------------------------
# Reverse direction: flax variables -> torch state_dict
# --------------------------------------------------------------------------

def _inv_conv(params, p, out):
    out[f"{p}.weight"] = np.asarray(params["kernel"]).transpose(3, 2, 0, 1)
    if "bias" in params:
        out[f"{p}.bias"] = np.asarray(params["bias"])


def _inv_dense(params, p, out):
    out[f"{p}.weight"] = np.asarray(params["kernel"]).T
    if "bias" in params:
        out[f"{p}.bias"] = np.asarray(params["bias"])


def _inv_ln(params, p, out):
    out[f"{p}.weight"] = np.asarray(params["scale"])
    out[f"{p}.bias"] = np.asarray(params["bias"])


def _inv_harmonic_ln(params, p, out):
    out[f"{p}.weight"] = np.asarray(params["scale"]).T
    out[f"{p}.bias"] = np.asarray(params["bias"]).T


def _inv_bn(params, stats, p, out):
    out[f"{p}.weight"] = np.asarray(params["scale"])
    out[f"{p}.bias"] = np.asarray(params["bias"])
    out[f"{p}.running_mean"] = np.asarray(stats["mean"])
    out[f"{p}.running_var"] = np.asarray(stats["var"])
    out[f"{p}.num_batches_tracked"] = np.asarray(0)


def _inv_mha(params, p, out):
    out[f"{p}.in_proj_weight"] = np.asarray(params["in_proj_weight"])
    out[f"{p}.in_proj_bias"] = np.asarray(params["in_proj_bias"])
    out[f"{p}.out_proj.weight"] = np.asarray(params["out_proj_weight"])
    out[f"{p}.out_proj.bias"] = np.asarray(params["out_proj_bias"])


def _inv_transformer_enc(params, p, out):
    for name in ("q_linear", "k_linear", "v_linear", "o_linear"):
        _inv_dense(params[name], f"{p}.{name}", out)
    _inv_mha(params["attn"], f"{p}.attn", out)
    _inv_dense(params["mlp1"], f"{p}.mlp.0", out)
    _inv_dense(params["mlp2"], f"{p}.mlp.2", out)
    _inv_ln(params["layernorm1"], f"{p}.layernorm1", out)
    _inv_ln(params["layernorm2"], f"{p}.layernorm2", out)
    if "pe" in params:
        out[f"{p}.pe"] = np.asarray(params["pe"])


def _inv_double_conv(params, stats, p, out, convdrop=0.0, alt_order=False):
    """Inverse of _double_conv for the three torch Sequential layouts."""
    q = f"{p}.double_conv"
    if alt_order:
        _inv_bn(params["bn1"], stats["bn1"], f"{q}.1", out)
        _inv_conv(params["conv1"], f"{q}.3", out)
        _inv_bn(params["bn2"], stats["bn2"], f"{q}.5", out)
        _inv_conv(params["conv2"], f"{q}.7", out)
    elif convdrop is None:
        _inv_conv(params["conv1"], f"{q}.0", out)
        _inv_bn(params["bn1"], stats["bn1"], f"{q}.1", out)
        _inv_conv(params["conv2"], f"{q}.3", out)
        _inv_bn(params["bn2"], stats["bn2"], f"{q}.4", out)
    else:
        _inv_conv(params["conv1"], f"{q}.0", out)
        _inv_bn(params["bn1"], stats["bn1"], f"{q}.1", out)
        _inv_conv(params["conv2"], f"{q}.4", out)
        _inv_bn(params["bn2"], stats["bn2"], f"{q}.5", out)
    if "resize" in params:
        _inv_conv(params["resize"], f"{p}.resize", out)


def export_state_dict(variables, convdrop=0.0, alt_order=False):
    """flax variables -> torch-layout state_dict (numpy values) for any
    model built by this package's porters (the reverse migration path:
    train on TPU, export to the reference's torch classes).

    The module tree is discovered from the parameter structure (same
    naming scheme the forward porters consume)."""
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    out = {}
    for name, sub in params.items():
        if name == "layernorm":
            _inv_harmonic_ln(sub["ln"], "layernorm", out)
        elif name == "head":
            _inv_conv(sub["conv2"]["conv"], "conv2.0", out)
            _inv_conv(sub["conv3"]["conv"], "conv3.0", out)
            _inv_conv(sub["conv4"]["conv"], "conv4.0", out)
            _inv_conv(sub["conv5"], "conv4.3", out)
        elif name == "trunk":
            _inv_harmonic_ln(sub["layernorm"]["ln"], "layernorm", out)
            _inv_conv(sub["conv1"]["conv"], "conv1.0", out)
        elif name.startswith("prefilt"):
            idx = name[len("prefilt"):]
            _inv_conv(sub["conv"], f"prefilt_list.{idx}.0", out)
        elif name == "inc":
            _inv_double_conv(sub, stats.get("inc", {}), "inc", out,
                             convdrop, alt_order)
        elif name.startswith("down"):
            _inv_double_conv(sub, stats.get(name, {}), f"{name}.1", out,
                             convdrop, alt_order)
        elif name.startswith("upconv"):
            _inv_double_conv(sub, stats.get(name, {}), name, out,
                             convdrop, alt_order)
        elif name.startswith("attention"):
            _inv_transformer_enc(sub, name, out)
        elif name.startswith("lstm"):
            for k, v in sub["blstm"].items():
                out[f"{name}.blstm.{k}"] = np.asarray(v)
        elif name == "convP1":
            _inv_conv(sub, "convP.0", out)
        elif name == "convP2":
            _inv_conv(sub, "convP.4", out)
        elif name in ("conv1", "conv2", "conv3", "conv4"):
            _inv_conv(sub["conv"], f"{name}.0", out)
        elif name == "conv5":
            _inv_conv(sub, "conv4.3", out)
        elif name in ("conv5a", "conv5b", "reduction", "conv3b"):
            _inv_conv(sub, name if name not in ("reduction",)
                      else "reduction.0", out)
        else:
            raise KeyError(f"export_state_dict: unknown module {name!r}")
    return out
