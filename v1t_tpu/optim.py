"""Optimizer construction: AdamW with per-module learning-rate groups.

The reference builds torch AdamW param groups — core at ``core_lr``,
readouts/cropper/shifters at ``lr`` (reference model.py:112-139,
train.py:217-223, weight_decay=0). Here that is an
``optax.multi_transform`` over {"core", "rest"} labels, each arm wrapped in
``optax.inject_hyperparams`` so the plateau scheduler can decay learning
rates in-place (reference scheduler.py:162-171). A frozen core
(``--pretrain_core``) maps to ``optax.set_to_zero`` on the core label
(reference models/utils.py:14-30, model.py:183-185).
"""

from __future__ import annotations

import typing as t

import jax
import optax

from v1t_tpu.models.model import param_labels


def build_optimizer(
    config,
    params: dict,
    core_frozen: bool = False,
    trainable_modules: t.Optional[t.List[str]] = None,
    weight_decay: float = 0.0,
) -> t.Tuple[optax.GradientTransformation, t.Any]:
    """AdamW over {core, rest} LR groups. When ``trainable_modules`` is given
    (the ensemble's output-head-only training, reference ensemble.py:313-334),
    only those top-level modules train — everything else is frozen."""
    core_lr = config.lr if config.core_lr is None else config.core_lr

    def adamw(lr):
        return optax.inject_hyperparams(optax.adamw)(
            learning_rate=lr,
            b1=config.adam_beta1,
            b2=config.adam_beta2,
            eps=config.adam_eps,
            weight_decay=weight_decay,
        )

    if trainable_modules is not None:
        labels = {
            top: jax.tree_util.tree_map(
                lambda _: "rest" if top in trainable_modules else "core", sub
            )
            for top, sub in params.items()
        }
        transforms = {"core": optax.set_to_zero(), "rest": adamw(config.lr)}
    else:
        labels = param_labels(params)
        transforms = {
            "core": optax.set_to_zero() if core_frozen else adamw(core_lr),
            "rest": adamw(config.lr),
        }
    tx = optax.multi_transform(transforms, labels)
    opt_state = tx.init(params)
    return tx, opt_state


def adaptive_grad_clip(
    percentile: float = 10.0, history: int = 100
) -> optax.GradientTransformation:
    """Percentile-history gradient clipping — the optax equivalent of the
    reference's AutoGradClip (utils/utils.py:474-503, defined upstream but
    never wired into training; provided here for capability parity and
    opt-in use via optax.chain).

    Keeps a rolling buffer of recent global grad norms and clips to the
    ``percentile``-th percentile of that history.
    """
    import jax.numpy as jnp

    def init_fn(params):
        del params
        return {
            "norms": jnp.zeros((history,), jnp.float32),
            "count": jnp.zeros((), jnp.int32),
        }

    def update_fn(updates, state, params=None):
        del params
        norm = optax.global_norm(updates)
        norms = state["norms"].at[state["count"] % history].set(norm)
        count = state["count"] + 1
        n_valid = jnp.minimum(count, history)
        # percentile over the valid prefix: mask invalid slots to +inf so
        # they never lower the clip threshold
        idx = jnp.arange(history)
        valid = jnp.where(idx < n_valid, norms, jnp.inf)
        k = jnp.clip(
            (percentile / 100.0 * n_valid.astype(jnp.float32)).astype(jnp.int32),
            0, history - 1,
        )
        clip_value = jnp.sort(valid)[k]
        scale = jnp.where(norm > clip_value, clip_value / (norm + 1e-6), 1.0)
        updates = jax.tree_util.tree_map(lambda g: g * scale, updates)
        return updates, {"norms": norms, "count": count}

    return optax.GradientTransformation(init_fn, update_fn)


def get_learning_rates(opt_state) -> t.Dict[str, float]:
    """Current LR per group (for logging and checkpointing)."""
    lrs = {}
    for label, inner in opt_state.inner_states.items():
        hp = getattr(inner.inner_state, "hyperparams", None)
        if hp is not None and "learning_rate" in hp:
            lrs[label] = float(hp["learning_rate"])
    return lrs


def scale_learning_rates(opt_state, factor: float):
    """Return a new opt_state with every group's LR multiplied by ``factor``
    (the scheduler's plateau decay, reference scheduler.py:162-171)."""

    def _scale(inner):
        hp = getattr(inner.inner_state, "hyperparams", None)
        if hp is None or "learning_rate" not in hp:
            return inner
        new_hp = dict(hp)
        new_hp["learning_rate"] = hp["learning_rate"] * factor
        return inner._replace(inner_state=inner.inner_state._replace(hyperparams=new_hp))

    new_inner = {
        label: _scale(inner) for label, inner in opt_state.inner_states.items()
    }
    return opt_state._replace(inner_states=new_inner)


def set_learning_rates(opt_state, lrs: t.Dict[str, float]):
    """Force specific per-group LRs (used after checkpoint rollback so the
    decayed LR survives the parameter restore)."""

    def _set(label, inner):
        hp = getattr(inner.inner_state, "hyperparams", None)
        if hp is None or "learning_rate" not in hp or label not in lrs:
            return inner
        new_hp = dict(hp)
        new_hp["learning_rate"] = jax.numpy.asarray(lrs[label], dtype=jax.numpy.float32)
        return inner._replace(inner_state=inner.inner_state._replace(hyperparams=new_hp))

    new_inner = {
        label: _set(label, inner) for label, inner in opt_state.inner_states.items()
    }
    return opt_state._replace(inner_states=new_inner)
