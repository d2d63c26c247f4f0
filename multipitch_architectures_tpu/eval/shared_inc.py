"""Exact cross-window sharing of the U-Net ``inc`` layer's interior.

The windowed protocol (stride-1 75-frame windows, exp180d…py:427-443)
recomputes every layer per window. For all layers below ``down1`` the
window's zero-padded edges reach every output row (two 15x15 convs at
stride 2 per level), so per-window compute is inherent — but the FIRST
block (``inc``: LayerNorm + DoubleConv, no pooling) is time-invariant in
its interior: output row ``r`` of a window centered at frame ``c``
depends only on absolute frames ``c-37+r-14 .. c-37+r+14`` (two k=15
convs), which for rows ``14..60`` never touch the window's zero padding.
Those 47 of 75 rows (63%) are therefore IDENTICAL across all windows
containing them and equal to a single dense computation over the padded
recording — measured ~6.7% of total pipeline FLOPs (ROADMAP r2).

This module computes the dense LayerNorm+inc ONCE per recording, then
per window dispatch:

  - gathers the interior rows from the dense result (free reuse), and
  - recomputes only the 2x14 edge rows with exact asymmetric-padding
    convolutions (the window's own zero padding on the outer side, real
    frames on the inner side) — ~40% of inc's per-window FLOPs.

The rest of the model runs unchanged via a flax interceptor that
substitutes the assembled ``inc`` output (the model's own pre-``inc``
ops are dead-code-eliminated by XLA). Composes with the int8 serving
mode (eval/quant.py): the downstream convs quantize as usual while the
shared ``inc`` stays f32 — slightly MORE accurate than the all-int8
windowed protocol, and exact (float-reassociation-level) vs the f32
protocol otherwise.

Supports the plain DoubleConv branch (alt_order=False, residual=False,
inc_residual=False) used by every ``simple_u_net*`` paper config; other
configurations raise.

.. note:: **Measured on the v5e (rounds 3-4, bench.py): this mode is
   ~9% SLOWER than recomputing** — 38.4x vs 42.1x f32 windowed (46.1x
   vs 46.5x with int8 downstream; round-4 real-recording span). At
   ~94% of achievable MXU peak the inc
   FLOPs overlap HBM traffic, and the interior gather + edge assembly
   move more bytes than the saved FLOPs are worth. It remains exact and
   tested; use it on compute-bound backends (CPU) or skip it on TPU.
"""

from functools import partial

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..models.layers import DoubleConv, HarmonicLayerNorm
from .quant import make_int8_interceptor


def _fold_bn(params, stats, eps=1e-5):
    """BatchNorm (eval mode, running stats) folded to y = x*scale + off."""
    scale = params["scale"] / jnp.sqrt(stats["var"] + eps)
    return scale, params["bias"] - stats["mean"] * scale


def _conv_bn_relu(x, kernel, bias, scale, off, time_pad, freq_pad):
    y = jax.lax.conv_general_dilated(
        x, kernel, (1, 1), (time_pad, freq_pad),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if bias is not None:
        y = y + bias
    return jnp.maximum(y * scale + off, 0.0)


class SharedIncForward:
    """Windowed forward with the ``inc`` interior shared across windows.

    Usage (per recording)::

        fwd = SharedIncForward(model)              # or int8 kwargs
        ln_dense, inc_dense = fwd.precompute(variables, xp)
        y = fwd.forward(variables, ln_dense, inc_dense, centers)

    where ``xp`` is the compressed, (half, half+1)-padded HCQT
    ``(6, T_pad, n_bins)`` and ``centers`` are window-center indices into
    ``xp`` (as in eval/inference.py). ``model`` must be a
    ``simple_u_net*`` whose first block is the plain DoubleConv branch.

    Args:
        min_kernel_elems / activation_scales: enable the int8 serving
            mode (eval/quant.py) for the downstream convs; the shared
            ``inc`` itself stays f32 (4% of FLOPs, and exactness of the
            shared interior is the point).
    """

    def __init__(self, model, context: int = 75, min_kernel_elems=4096,
                 activation_scales=None, int8: bool = False):
        # only options that change INC itself are disqualifying:
        # alt_order reorders inc's conv/BN/activation (unets._encode
        # passes it through), inc_residual is rejected in _inc_arith.
        # `residual` shortcuts apply to down/up blocks only — the
        # reference never passes it to inc (unets.py:97-101) — and those
        # blocks run unchanged through model.apply here.
        if getattr(model, "alt_order", False):
            raise ValueError("shared-inc supports the plain DoubleConv "
                             "inc branch only (alt_order changes inc)")
        self.model = model
        self.context = context
        self._int8 = int8 or activation_scales is not None
        self._quant = (make_int8_interceptor(min_kernel_elems,
                                             activation_scales)
                       if self._int8 else None)
        self._precompute = jax.jit(self._precompute_impl)
        self._forward = jax.jit(self._forward_impl,
                                static_argnames=("with_aux",))

    # -- per-recording dense pass -----------------------------------------

    def _inc_arith(self, variables):
        p = variables["params"]["inc"]
        if "resize" in p:
            raise ValueError("shared-inc does not support inc_residual")
        s = variables.get("batch_stats", {}).get("inc", {})
        k1, b1 = p["conv1"]["kernel"], p["conv1"].get("bias")
        k2, b2 = p["conv2"]["kernel"], p["conv2"].get("bias")
        s1, o1 = _fold_bn(p["bn1"], s["bn1"])
        s2, o2 = _fold_bn(p["bn2"], s["bn2"])
        return (k1, b1, s1, o1), (k2, b2, s2, o2)

    def _precompute_impl(self, variables, xp):
        """Dense LayerNorm + inc over the padded recording.

        xp: (6, T_pad, F) compressed+padded. Returns
        (ln_dense (T_pad, F, 6), inc_dense (T_pad, F, C))."""
        x = jnp.transpose(xp, (1, 2, 0))[None]            # (1, T_pad, F, 6)
        ln = HarmonicLayerNorm().apply(
            {"params": variables["params"]["layernorm"]}, x)
        (k1, b1, s1, o1), (k2, b2, s2, o2) = self._inc_arith(variables)
        pf = (k1.shape[1] // 2,) * 2
        pt = (k1.shape[0] // 2,) * 2
        h = _conv_bn_relu(ln, k1, b1, s1, o1, pt, pf)
        h = _conv_bn_relu(h, k2, b2, s2, o2, pt, pf)
        return ln[0], h[0]

    def precompute(self, variables, xp):
        return self._precompute(variables, xp)

    # -- per-dispatch assembled forward -----------------------------------

    def _assemble(self, variables, ln_dense, inc_dense, centers):
        (k1, b1, s1, o1), (k2, b2, s2, o2) = self._inc_arith(variables)
        k = k1.shape[0]
        p, half = k // 2, self.context // 2
        e = 2 * p                                         # edge rows/side
        if self.context <= 2 * e:
            raise ValueError("context too small for shared-inc interior")
        pf = (k1.shape[1] // 2,) * 2
        centers = jnp.asarray(centers)

        def slab(src, starts, rows):
            return jax.vmap(lambda s: jax.lax.dynamic_slice(
                src, (s, 0, 0), (rows, src.shape[1], src.shape[2])))(starts)

        # top edge: window rows 0..e-1 from input rows 0..4p-1, zero pad
        # on the window's outer (top) side only
        top_in = slab(ln_dense, centers - half, 4 * p)
        h = _conv_bn_relu(top_in, k1, b1, s1, o1, (p, 0), pf)
        top = _conv_bn_relu(h, k2, b2, s2, o2, (p, 0), pf)
        # bottom edge mirrored
        bot_in = slab(ln_dense, centers + half - (4 * p - 1), 4 * p)
        h = _conv_bn_relu(bot_in, k1, b1, s1, o1, (0, p), pf)
        bot = _conv_bn_relu(h, k2, b2, s2, o2, (0, p), pf)
        # interior rows e..context-1-e straight from the dense result
        interior = slab(inc_dense, centers - half + e, self.context - 2 * e)
        return jnp.concatenate([top, interior, bot], axis=1)

    def _forward_impl(self, variables, ln_dense, inc_dense, centers,
                      with_aux=False):
        x1 = self._assemble(variables, ln_dense, inc_dense, centers)

        def replace_inc(next_fun, args, kwargs, context):
            mod = context.module
            if (isinstance(mod, DoubleConv) and mod.name == "inc"
                    and context.method_name == "__call__"):
                return x1
            return next_fun(*args, **kwargs)

        dummy = jnp.zeros((x1.shape[0], self.model.n_chan_input,
                           self.context, self.model.n_bins_in), x1.dtype)
        if self._quant is not None:
            with nn.intercept_methods(self._quant):
                with nn.intercept_methods(replace_inc):
                    y = self.model.apply(variables, dummy, train=False)
        else:
            with nn.intercept_methods(replace_inc):
                y = self.model.apply(variables, dummy, train=False)
        aux = None
        if isinstance(y, tuple):
            y, aux = y[0], y[1]
        y = y.reshape(y.shape[0], -1)
        if with_aux:
            return y, (aux.reshape(aux.shape[0], -1)
                       if aux is not None else jnp.zeros((y.shape[0], 0)))
        return y

    def forward(self, variables, ln_dense, inc_dense, centers,
                with_aux=False):
        return self._forward(variables, ln_dense, inc_dense,
                             jnp.asarray(centers), with_aux=with_aux)


_FWD_CACHE = {}


def _forward_for(model, context, min_kernel_elems, activation_scales,
                 int8):
    """SharedIncForward instances cached per (model, context, policy) —
    a fresh instance per serving call would carry fresh jax.jit wrappers
    and recompile the full forward for every recording (minutes through
    a relayed TPU backend). Scale values are frozen into the key (they
    are baked into the compiled programs as constants)."""
    import numpy as np

    scales_key = None
    if activation_scales is not None:
        scales_key = tuple(sorted(
            (k, np.asarray(v, np.float32).tobytes())
            for k, v in activation_scales.items()))
    key = (model, context, min_kernel_elems, scales_key, bool(int8))
    fwd = _FWD_CACHE.get(key)
    if fwd is None:
        while len(_FWD_CACHE) >= 16:              # bound compiled programs
            _FWD_CACHE.pop(next(iter(_FWD_CACHE)))
        fwd = _FWD_CACHE[key] = SharedIncForward(
            model, context, min_kernel_elems, activation_scales, int8=int8)
    return fwd


def predict_framewise_shared(model, variables, inputs, context=75,
                             batch_size=50, compression=10.0, group=None,
                             min_kernel_elems=4096, activation_scales=None,
                             int8=False, return_aux=False):
    """``eval.predict_framewise`` with the shared-``inc`` forward: same
    protocol batching (full batches, grouped-tail drain, natural-size
    remainder — see inference.py), ~6% less compute per window. Output is
    float-reassociation-close to ``predict_framewise`` (tested ≤1e-5 on
    CPU); pass the int8 kwargs for the quantized serving mode.

    The SharedIncForward (and its jitted programs) is cached per
    (model, context, quantization policy), so repeated serving calls do
    not recompile. NB the int8 scales are baked into the cached programs
    as constants here — per-RECORDING scales would recompile per
    recording; use recording-independent (e.g. training-set) scales with
    shared-inc, or the plain ``predict_framewise_int8`` path whose
    scales are traced arguments."""
    import numpy as np

    from .inference import _next_batch_size, _pad_inputs

    fwd = _forward_for(model, context, min_kernel_elems,
                       activation_scales, int8)
    x = jnp.asarray(inputs, jnp.float32)
    if compression is not None:
        x = jnp.log1p(compression * x)
    t = x.shape[1]
    xp = _pad_inputs(x, context)
    half = context // 2
    if group is not None and batch_size % group:
        raise ValueError(f"batch_size {batch_size} not a multiple of "
                         f"attention group {group}")
    ln_dense, inc_dense = fwd.precompute(variables, xp)

    outs, auxs = [], []
    start = 0
    while start < t:
        n = _next_batch_size(t - start, batch_size, group)
        centers = half + start + np.arange(n)
        y = fwd.forward(variables, ln_dense, inc_dense, centers,
                        with_aux=return_aux)
        if return_aux:
            y, aux = y
            auxs.append(aux)
        outs.append(y)
        start += n
    pred = np.concatenate([np.asarray(y) for y in outs], axis=0)
    if return_aux:
        return pred, np.concatenate([np.asarray(a) for a in auxs], axis=0)
    return pred
