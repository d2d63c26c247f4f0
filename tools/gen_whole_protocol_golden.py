#!/usr/bin/env python
"""Generate tests/goldens/predict_framewise_golden.npz (VERDICT r3
task 9): a committed whole-protocol output pin.

Stores EXACT tiny-SAUnet variables (so the pin is independent of any
future change in flax initializer numerics), a fixed synthetic HCQT, and
the predict_framewise outputs for both the plain batch-50-style path and
the grouped cross_batch path with a tail that exercises every batch
composition case (full batch, full-group tail, natural-size remainder —
the reference loader's drain order, exp180d…py:427-443). The regression
test (tests/test_eval.py) re-runs the protocol and compares bitwise-
tightly, guarding the windowed path (gather, grouping, pad, head)
against silent numeric drift from jax/XLA upgrades.

Run on CPU (the suite's platform): python tools/gen_whole_protocol_golden.py
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_platforms", "cpu")

import dataclasses

import jax.numpy as jnp
import numpy as np

from multipitch_architectures_tpu.eval import predict_framewise
from multipitch_architectures_tpu.models import SimpleUNetDoubleSelfAttn

OUT = os.path.join(REPO, "tests", "goldens",
                   "predict_framewise_golden.npz")

# batch drain for T=57, batch 20, group 10: [20, 20, 10, 7] — a full
# batch, the tail's full group, and the natural-size remainder
T_FRAMES, BATCH, GROUP = 57, 20, 10


def main():
    model = SimpleUNetDoubleSelfAttn(
        n_chan_layers=(8, 8, 4, 2), n_bins_out=72, scalefac=16,
        embed_dim=32, num_heads=8, mlp_dim=64, pos_encoding="sinusoidal")
    variables = model.init({"params": jax.random.PRNGKey(42)},
                           jnp.zeros((1, 6, 75, 216), jnp.float32),
                           train=False)

    rng = np.random.RandomState(1234)
    inputs = rng.rand(6, T_FRAMES, 216).astype(np.float32)

    def apply_plain(v, xw):
        return model.apply(v, xw, train=False)

    grouped = dataclasses.replace(model, attn_mode=f"cross_batch:{GROUP}")

    def apply_grouped(v, xw):
        return grouped.apply(v, xw, train=False)

    pred_plain = predict_framewise(apply_plain, variables, inputs,
                                   batch_size=GROUP)
    pred_grouped = predict_framewise(apply_grouped, variables, inputs,
                                     batch_size=BATCH, group=GROUP)
    # the grouped fused path must reproduce the plain batch-of-10 loader
    np.testing.assert_allclose(pred_grouped, pred_plain, atol=2e-5)

    from flax import serialization

    var_bytes = np.frombuffer(serialization.to_bytes(variables),
                              dtype=np.uint8)
    np.savez_compressed(
        OUT, inputs=inputs, pred_plain=pred_plain,
        pred_grouped=pred_grouped, variables_msgpack=var_bytes,
        batch=np.int64(BATCH), group=np.int64(GROUP))
    print(f"wrote {OUT} ({os.path.getsize(OUT) / 1e6:.2f} MB), "
          f"pred range [{pred_plain.min():.4f}, {pred_plain.max():.4f}]")


if __name__ == "__main__":
    main()
