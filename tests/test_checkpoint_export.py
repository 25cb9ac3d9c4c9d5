"""Export (JAX -> torch state_dict) round-trip and reference-load tests.

v1t_tpu/utils/torch_export.py must be the exact inverse of
torch_transplant.convert_state_dict: exporting a parameter tree and
re-importing it reproduces every leaf bit-for-bit, and the exported dict
loads into the ACTUAL reference implementation (/root/reference/src/v1t)
with forward parity — the "switch back" direction of import_checkpoint.py.
"""

import numpy as np
import pytest

from v1t_tpu.models import build_model
from v1t_tpu.models.model import init_model
from v1t_tpu.utils.torch_export import export_state_dict
from v1t_tpu.utils.torch_transplant import (
    assert_tree_shapes_match,
    convert_state_dict,
)

from tests.test_reference_parity import _card, _config


def _leaves(tree, path=""):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _leaves(v, f"{path}/{k}")
    else:
        yield path, np.asarray(tree)


def _assert_roundtrip(cfg, card):
    cfg.mouse_ids = list(card.mouse_ids)
    model = build_model(cfg, card)
    params = init_model(model, seed=3)
    sd = export_state_dict(params, cfg)
    back = convert_state_dict(sd, cfg)
    assert_tree_shapes_match(back, params)
    orig = dict(_leaves(params))
    for path, arr in _leaves(back):
        np.testing.assert_array_equal(
            arr, orig[path].astype(np.float32), err_msg=path
        )
    assert len(dict(_leaves(back))) == len(orig)


@pytest.mark.parametrize(
    "kw",
    [
        dict(behavior_mode=3, shift_mode=2, use_lsa=True),
        dict(behavior_mode=4, shift_mode=4),
        dict(behavior_mode=2, shift_mode=1, patch_mode=2),
        dict(patch_mode=1), dict(patch_mode=3),
        dict(readout="dense"), dict(readout="linear"),
        dict(core="cct", behavior_mode=1, pos_emb="learn"),
        dict(core="stn", num_layers=2, num_filters=4),
        dict(disable_grid_predictor=True),
    ],
)
def test_export_roundtrip(kw):
    _assert_roundtrip(_config(**kw), _card())


def test_export_roundtrip_stacked2d_with_stats():
    cfg = _config(core="stacked2d", num_layers=3, num_filters=8)
    card = _card()
    cfg.mouse_ids = list(card.mouse_ids)
    model = build_model(cfg, card)
    params = init_model(model, seed=3)
    _assert_roundtrip(cfg, card)
    # batch_stats round trip
    from v1t_tpu.utils.torch_transplant import convert_batch_stats

    rng = np.random.default_rng(0)
    stats = {
        "core": {
            f"layer{l}_norm": {
                "mean": rng.normal(size=cfg.num_filters).astype(np.float32),
                "var": rng.uniform(0.5, 2.0, cfg.num_filters).astype(
                    np.float32
                ),
            }
            for l in range(cfg.num_layers)
        }
    }
    sd = export_state_dict(params, cfg, batch_stats=stats)
    back = convert_batch_stats(sd, cfg)["batch_stats"]["core"]
    for l in range(cfg.num_layers):
        np.testing.assert_array_equal(
            back[f"layer{l}_norm"]["mean"],
            stats["core"][f"layer{l}_norm"]["mean"],
        )
        np.testing.assert_array_equal(
            back[f"layer{l}_norm"]["var"],
            stats["core"][f"layer{l}_norm"]["var"],
        )


def test_export_loads_into_reference():
    """The exported dict must key-match the real reference Model and carry
    our weights into it: reference forward == our forward."""
    torch = pytest.importorskip("torch")
    from tests.test_reference_parity import (
        REFERENCE_SRC, _forward_both, _reference_model,
    )
    import os

    if not os.path.isdir(REFERENCE_SRC):
        pytest.skip("reference source unavailable")

    cfg = _config(behavior_mode=3, shift_mode=2, use_lsa=True)
    card = _card()
    cfg.mouse_ids = list(card.mouse_ids)
    model = build_model(cfg, card)
    params = init_model(model, seed=7)
    sd = {
        k: torch.from_numpy(v)
        for k, v in export_state_dict(params, cfg).items()
    }

    ref = _reference_model(cfg, card)
    full = ref.state_dict()
    unknown = set(sd) - set(full)
    assert not unknown, f"exported keys unknown to the reference: {unknown}"
    full.update(sd)
    ref.load_state_dict(full)
    ref.eval()

    params32 = __import__("jax").tree_util.tree_map(
        lambda x: np.asarray(x, np.float32), params
    )
    for mouse_id in card.mouse_ids:
        (t_out, _, _), (j_out, _, _) = _forward_both(
            ref, model, params32, card, mouse_id
        )
        np.testing.assert_allclose(
            t_out, j_out, rtol=2e-5, atol=2e-5,
            err_msg=f"reference forward with exported weights diverged "
                    f"(mouse {mouse_id})",
        )
