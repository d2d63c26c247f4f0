"""Shared scaffolding for using the READ-ONLY reference checkout as a
numerical oracle (torch CPU) — the single home for the three things
every oracle user needs (tests/conftest.py, tools/parity_gate.py,
perf/gated_mode_experiment.py previously each carried a diverging
copy):

- ``patched_torch_cpu``: strips the reference's hard-coded
  ``device="cuda:0"`` (libdl/nn_models/unet_cnns.py:121,128,176,183) so
  its models build on CPU;
- ``reference_models()``: imports ``libdl.nn_models`` from
  ``$MULTIPITCH_REFERENCE`` (default /root/reference), stubbing the
  absent ``torchvision``;
- ``build_reference_model()``: seed-deterministic construction with the
  kwargs filtered by the constructor signature (reference experiment
  scripts carry unused keys like ``n_ch_out`` in their ``model_params``
  dicts that they never pass to the constructor).

Never vendored into the package: oracle use is a dev/test concern.
"""

import inspect
import os
import sys
import types

REFERENCE_ROOT = os.environ.get("MULTIPITCH_REFERENCE", "/root/reference")


class patched_torch_cpu:
    """Context manager stripping the reference's hard-coded
    ``device="cuda:0"`` (libdl/nn_models/unet_cnns.py:121,128,176,183)
    so its models build on CPU."""

    def __enter__(self):
        import torch

        self._orig = torch.zeros

        def cpu_zeros(*a, **k):
            k.pop("device", None)
            return self._orig(*a, **k)

        torch.zeros = cpu_zeros
        return self

    def __exit__(self, *exc):
        import torch

        torch.zeros = self._orig
        return False


def reference_models(required=False):
    """Import the reference torch model zoo. ``required=False`` returns
    None when the checkout is absent (tests skip); ``required=True``
    propagates the ImportError (CLI tools should fail loudly)."""
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    sys.modules.setdefault("torchvision", types.ModuleType("torchvision"))
    try:
        from libdl import nn_models
        return nn_models
    except Exception:
        if required:
            raise
        return None


def build_reference_model(model_name, model_kwargs, seed=0):
    """Construct + eval() the reference class ``model_name`` with
    ``model_kwargs`` filtered to its constructor signature, under a
    fixed torch seed, on CPU."""
    import torch

    nn_models = reference_models(required=True)
    ref_cls = getattr(nn_models, model_name)
    accepted = inspect.signature(ref_cls.__init__).parameters
    torch.manual_seed(seed)
    with patched_torch_cpu():
        tm = ref_cls(**{k: v for k, v in model_kwargs.items()
                        if k in accepted})
    return tm.eval()
