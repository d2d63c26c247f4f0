"""Extract experiment configurations from the reference's 111 experiment
scripts into one JSON registry.

The reference encodes every experiment as a copy of a ~500-line script
with inline config dicts (SURVEY §2.8). This tool ast-parses each script
and evaluates ONLY constant-expression assignments (numbers, strings,
tuples, lists, dicts, arithmetic on those and on the few scalar config
names like num_octaves_inp) — no reference code is executed or copied;
the output is a table of configuration VALUES.

Usage: python tools/extract_reference_configs.py [ref_dir] [out_json]
"""

import ast
import json
import os
import sys

CAPTURE_DICTS = [
    "train_dataset_params", "val_dataset_params", "test_dataset_params",
    "train_params", "val_params", "test_params", "model_params",
    "optimizer_params", "scheduler_params", "early_stopping_params",
]
CAPTURE_SCALARS = [
    "max_epochs", "eval_thresh", "num_output_bins", "min_pitch",
    "num_octaves_inp",
]
CAPTURE_LISTS = [
    "eval_measures", "val_versions", "test_versions", "test_versions_small",
    "test_versions1", "test_versions2", "test_versions3", "test_versions4",
    "train_versions", "test_pieces", "val_pieces", "train_pieces",
    "test_dataset_names",
]


class _SafeEval(ast.NodeVisitor):
    """Evaluate constant expressions + known scalar names."""

    def __init__(self, env):
        self.env = env

    def eval(self, node):
        if isinstance(node, ast.Constant):
            return node.value
        if isinstance(node, ast.Num):  # pragma: no cover (py<3.8 nodes)
            return node.n
        if isinstance(node, ast.Str):  # pragma: no cover
            return node.s
        if isinstance(node, ast.Name):
            if node.id in self.env:
                return self.env[node.id]
            raise ValueError(f"unknown name {node.id}")
        if isinstance(node, ast.Tuple):
            return tuple(self.eval(e) for e in node.elts)
        if isinstance(node, ast.List):
            return [self.eval(e) for e in node.elts]
        if isinstance(node, ast.Dict):
            return {self.eval(k): self.eval(v)
                    for k, v in zip(node.keys, node.values)}
        if isinstance(node, ast.UnaryOp) and isinstance(node.op, ast.USub):
            return -self.eval(node.operand)
        if isinstance(node, ast.BinOp):
            left, right = self.eval(node.left), self.eval(node.right)
            if isinstance(node.op, ast.Mult):
                return left * right
            if isinstance(node.op, ast.Add):
                return left + right
            if isinstance(node.op, ast.Sub):
                return left - right
            if isinstance(node.op, ast.Div):
                return left / right
            if isinstance(node.op, ast.FloorDiv):
                return left // right
            if isinstance(node.op, ast.Pow):
                return left ** right
        raise ValueError(f"cannot eval {ast.dump(node)[:80]}")


def extract_script(path):
    src = open(path).read()
    tree = ast.parse(src)
    env = {}
    out = {}
    evaluator = _SafeEval(env)
    model_class = None
    loss = "bce"
    max_train_batches = None

    def linear(nodes):
        """Yield statements in source order (ast.walk is BFS, which breaks
        name-dependency ordering like num_octaves_inp → model_params)."""
        for n in nodes:
            yield n
            for attr in ("body", "orelse", "finalbody"):
                if hasattr(n, attr):
                    yield from linear(getattr(n, attr))

    for node in linear(tree.body):
        # tuple assignments like `num_output_bins, min_pitch = 72, 24`
        if isinstance(node, ast.Assign) and len(node.targets) == 1 \
                and isinstance(node.targets[0], ast.Tuple):
            try:
                vals = evaluator.eval(node.value)
            except ValueError:
                continue
            for tgt, val in zip(node.targets[0].elts, vals):
                if isinstance(tgt, ast.Name) and \
                        tgt.id in CAPTURE_SCALARS:
                    out[tgt.id] = val
                    env[tgt.id] = val
            continue
        if isinstance(node, ast.Assign) and len(node.targets) == 1 \
                and isinstance(node.targets[0], ast.Name):
            name = node.targets[0].id
            if name in CAPTURE_DICTS + CAPTURE_SCALARS + CAPTURE_LISTS:
                try:
                    val = evaluator.eval(node.value)
                except ValueError:
                    continue
                out[name] = val
                if name in CAPTURE_SCALARS and isinstance(val, (int, float)):
                    env[name] = val
            elif name == "model":
                call = node.value
                if isinstance(call, ast.Call):
                    fn = call.func
                    model_class = fn.id if isinstance(fn, ast.Name) else \
                        getattr(fn, "attr", None)
            elif name == "criterion2":
                loss = "multitask"
        # 'moresamples' cap: `if n_batches>3800: break`
        if isinstance(node, ast.If) and isinstance(node.test, ast.Compare):
            t = node.test
            if (isinstance(t.left, ast.Name) and t.left.id == "n_batches"
                    and t.comparators
                    and isinstance(t.comparators[0], ast.Constant)):
                if any(isinstance(n, ast.Break) for n in ast.walk(node)):
                    max_train_batches = t.comparators[0].value

    out["model_class"] = model_class
    out["loss"] = loss
    if max_train_batches is not None:
        out["max_train_batches"] = max_train_batches
    return out


def main(ref_dir="/root/reference", out_json=None):
    exp_root = os.path.join(ref_dir, "experiments")
    registry = {}
    for family in sorted(os.listdir(exp_root)):
        fam_dir = os.path.join(exp_root, family)
        if not os.path.isdir(fam_dir) or family == "logs":
            continue
        for fn in sorted(os.listdir(fam_dir)):
            if not fn.endswith(".py"):
                continue
            name = os.path.splitext(fn)[0]
            try:
                cfg = extract_script(os.path.join(fam_dir, fn))
            except SyntaxError as e:
                print(f"SKIP {name}: {e}")
                continue
            cfg["family"] = family
            registry[name] = cfg
    if out_json:
        with open(out_json, "w") as f:
            json.dump(registry, f, indent=1, sort_keys=True)
        print(f"wrote {len(registry)} configs to {out_json}")
    return registry


if __name__ == "__main__":
    args = sys.argv[1:]
    main(*(args or ["/root/reference",
                    "multipitch_architectures_tpu/experiments/registry.json"]))
