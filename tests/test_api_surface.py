"""API-surface completeness: every public name the reference exports has
a same-named counterpart in this package.

The reference's public interface is the union of its subpackage
``__init__`` re-exports (libdl/nn_models/__init__.py:1-10,
libdl/data_loaders/__init__.py:1-2, libdl/data_preprocessing/__init__.py:1-2,
libdl/metrics/__init__.py, libdl/schedulers/__init__.py) plus the three
load-bearing libfmp functions (SURVEY §2.7). Export names are parsed
textually because the reference inits import librosa/mir_eval at module
scope, which this image does not ship.
"""

import ast
import os

import pytest

REF = "/root/reference/libdl"


def _ref_exports(subpackage):
    path = os.path.join(REF, subpackage, "__init__.py")
    names = []
    for node in ast.walk(ast.parse(open(path).read())):
        if isinstance(node, ast.ImportFrom):
            names += [a.asname or a.name for a in node.names]
    assert names, f"no exports parsed from {path}"
    return sorted(set(names))


def _our_modules(*names):
    import importlib

    return [importlib.import_module(f"multipitch_architectures_tpu.{n}")
            for n in names]


@pytest.mark.parametrize("subpackage,ours", [
    ("nn_models", ("models",)),
    ("data_loaders", ("data",)),
    ("data_preprocessing", ("dsp", "data")),
    ("metrics", ("eval", "train")),
    ("schedulers", ("train",)),
])
def test_every_reference_export_has_a_counterpart(subpackage, ours):
    mods = _our_modules(*ours)
    missing = [n for n in _ref_exports(subpackage)
               if not any(hasattr(m, n) for m in mods)]
    assert not missing, (subpackage, missing)


def test_libfmp_load_bearing_functions_have_counterparts():
    """libfmp.c5.compute_eval_measures, libfmp.c3.normalize_feature_sequence,
    libfmp.b.plot_matrix (SURVEY §2.7)."""
    from multipitch_architectures_tpu.eval import (compute_eval_measures,
                                                   normalize_feature_sequence)
    from multipitch_architectures_tpu.utils.plot import plot_matrix

    assert callable(compute_eval_measures)
    assert callable(normalize_feature_sequence)
    assert callable(plot_matrix)


def test_model_aliases_are_the_documented_classes():
    """Spot-check that snake_case aliases resolve to the parity-tested
    classes (not stubs)."""
    import multipitch_architectures_tpu.models as m

    assert m.simple_u_net_doubleselfattn is m.SimpleUNetDoubleSelfAttn
    assert m.double_conv is m.DoubleConv
    assert callable(m.unet_up_concat_padding)
