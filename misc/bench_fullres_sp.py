"""Full-resolution (34k-token) step: composed flash vs sequence-parallel.

SURVEY §5.7's scenario — 144x256 stimuli, no resize, patch 8 / stride 1 ->
34,114 tokens. Runs the complete train step (grads + Poisson + regularizers,
batch 1) twice on the available chip(s):

1. single-chip blocked-flash path (no mesh) — the round-2 baseline,
2. the sequence-parallel path over a "seq" mesh (all local devices; on the
   1-chip environment a 1-shard mesh, which still executes the full SP
   machinery: shard_map body, in-body flash kernel, LSE normalization).

Prints both step times; the SP path must stay within ~2x of the composed
path at equal resources (VERDICT round 2, next-step #5 done-criterion).

grad_checkpointing is OFF: with O(N)-memory flash attention the full
34k-token activation set fits HBM easily at these batch sizes, and the
checkpointed re-forward costs ~22% of the step (0.832 -> 0.645 s/step
measured round 3) — exactly SURVEY §7's "jax.checkpoint largely obsoleted
by flash attention". The flag still exists for memory-constrained runs.
"""

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import jax

jax.config.update(
    "jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache")
)
jax.config.update("jax_default_prng_impl", "rbg")

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh


def build_step(batch_size=1):
    from v1t_tpu.configs import Config
    from v1t_tpu.data.cards import synthetic_data_card
    from v1t_tpu.losses import get_criterion
    from v1t_tpu.models import build_model, model_regularizer
    from v1t_tpu.models.model import init_model

    config = Config(
        core="vit", readout="gaussian2d", behavior_mode=3, shift_mode=2,
        batch_size=batch_size, precision="bf16", attention_impl="auto",
        resize_image=0, core_reg_scale=0.5379, readout_reg_scale=0.0076,
        lr=0.001647, grad_checkpointing=0,
    )
    card = synthetic_data_card(
        mouse_ids=("A",), num_neurons=7000, input_shape=(1, 144, 256),
        ds_size=4096,
    )
    model = build_model(config, card)
    params = init_model(model, seed=0, batch_size=1)
    criterion = get_criterion(config, card.ds_sizes)

    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.normal(size=(batch_size, 1, 144, 256)), jnp.float32
    )
    behaviors = jnp.asarray(rng.normal(size=(batch_size, 3)), jnp.float32)
    pupils = jnp.asarray(rng.normal(size=(batch_size, 2)), jnp.float32)
    responses = jnp.asarray(
        rng.poisson(2.0, size=(batch_size, 7000)), jnp.float32
    )

    def loss_fn(p, step_rng):
        rngs = {
            "dropout": jax.random.fold_in(step_rng, 0),
            "droppath": jax.random.fold_in(step_rng, 1),
            "sample": jax.random.fold_in(step_rng, 2),
        }
        y_pred, _, _ = model.apply(
            {"params": p}, images, mouse_id="A", behaviors=behaviors,
            pupil_centers=pupils, train=True, rngs=rngs,
        )
        loss = criterion(responses, y_pred, mouse_id="A",
                         batch_size=batch_size)
        return loss + model_regularizer(config, p, mouse_id="A")

    return jax.jit(jax.grad(loss_fn)), params


def timed(grad_fn, params, iters=5):
    base = jax.random.key(0)
    grads = grad_fn(params, jax.random.fold_in(base, 0))
    jax.block_until_ready(grads)
    t0 = time.perf_counter()
    for i in range(iters):
        grads = grad_fn(params, jax.random.fold_in(base, i + 1))
    jax.block_until_ready(grads)
    leaf = jax.tree_util.tree_leaves(grads)[0]
    assert np.all(np.isfinite(np.asarray(leaf)))
    return (time.perf_counter() - t0) / iters


def main():
    from v1t_tpu.parallel.context import set_sequence_mesh

    grad_fn, params = build_step()
    t_plain = timed(grad_fn, params)
    print(f"composed flash (no mesh):  {t_plain:.3f} s/step")

    devices = jax.devices()
    mesh = Mesh(np.asarray(devices), ("seq",))
    set_sequence_mesh(mesh, axis="seq", impl="allgather")
    try:
        grad_fn_sp, params_sp = build_step()
        t_sp = timed(grad_fn_sp, params_sp)
    finally:
        set_sequence_mesh(None)
    print(
        f"sequence-parallel ({len(devices)} shard(s)): {t_sp:.3f} s/step "
        f"({t_sp / t_plain:.2f}x the composed path)"
    )


if __name__ == "__main__":
    main()
