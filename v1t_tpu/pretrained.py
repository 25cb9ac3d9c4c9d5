"""Pretrained-core injection: copy the ``core`` subtree from another run's
checkpoint into a fresh model, then freeze it (reference
src/v1t/models/utils.py:14-30, model.py:183-185)."""

from __future__ import annotations

import os

from v1t_tpu.utils.scheduler import CKPT_NAME, load_checkpoint_file


def _merge_core(init: dict, ckpt: dict, path: str = "core"):
    """Partial merge with the reference's ``state_dict.update`` semantics
    (reference models/utils.py:24-27): checkpoint leaves overwrite the
    fresh init; modules absent from the checkpoint KEEP their init — the
    paper's own workflow pretrains the core on ImageNet without behavior
    (no BehaviorMLPs) and injects it into a behavior-conditioned model,
    where the b-mlps stay freshly initialized (and are then frozen with
    the rest of the core, as the reference does). Checkpoint keys the
    model does not have are an error, exactly as the reference's
    ``load_state_dict`` would raise on unexpected keys."""
    merged = {}
    for k, v in init.items():
        if k not in ckpt:
            merged[k] = v
        elif isinstance(v, dict):
            merged[k] = _merge_core(v, ckpt[k], f"{path}.{k}")
        else:
            if getattr(ckpt[k], "shape", None) != getattr(v, "shape", None):
                raise ValueError(
                    f"pretrained core leaf {path}.{k} has shape "
                    f"{getattr(ckpt[k], 'shape', None)} but the model "
                    f"expects {getattr(v, 'shape', None)}"
                )
            merged[k] = ckpt[k]
    unknown = set(ckpt) - set(init)
    if unknown:
        raise ValueError(
            f"pretrained core has modules the model does not: "
            f"{sorted(f'{path}.{k}' for k in unknown)}"
        )
    return merged


def load_pretrain_core(config, params: dict, model_state: dict = None):
    """Inject the pretrained ``core`` parameter subtree — and, when a
    ``model_state`` is passed, the core's non-parameter collections
    (BatchNorm running statistics for stacked2d/stn cores, which are part
    of the torch state_dict the reference copies, models/utils.py:24-27).

    Returns ``params`` when called without ``model_state`` (pure-parameter
    cores), else ``(params, model_state)``."""
    filename = os.path.join(config.pretrain_core, "ckpt", CKPT_NAME)
    assert os.path.exists(filename), f"Cannot find pretrain core {filename}."
    ckpt = load_checkpoint_file(filename)
    core = ckpt["model"].get("core")
    assert core is not None, f"checkpoint {filename} has no core parameters."
    new_params = dict(params)
    new_params["core"] = _merge_core(params["core"], core)
    new_state = model_state
    if model_state is not None:
        ckpt_state = ckpt.get("model_state", {})
        new_state = dict(model_state)
        for coll, ck_tree in ckpt_state.items():
            ck_core = ck_tree.get("core")
            if ck_core is None:
                continue
            if coll not in new_state or "core" not in new_state[coll]:
                raise ValueError(
                    f"pretrained core carries a '{coll}.core' collection "
                    f"the model does not have"
                )
            tree = dict(new_state[coll])
            tree["core"] = _merge_core(
                tree["core"], ck_core, path=f"{coll}.core"
            )
            new_state[coll] = tree
    if getattr(config, "verbose", 1):
        print(
            f"\nLoaded pretrained core from {config.pretrain_core} "
            f"(value: {float(ckpt['value']):.04f})."
        )
    if model_state is not None:
        return new_params, new_state
    return new_params
