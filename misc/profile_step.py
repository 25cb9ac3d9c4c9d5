"""Capture a jax.profiler trace of the benchmark training step and print an
op-level time breakdown (parsed from the xplane proto via
tensorboard-plugin-profile). Round-2 tool for attacking the non-attention
step-time residual (BENCH_NOTES.md)."""

import glob
import os
import sys
import time

# tensorboard-plugin-profile's generated protos need the pure-Python
# protobuf backend on this image
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

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


def build_step(batch_size=64):
    from v1t_tpu.configs import Config
    from v1t_tpu.data.cards import synthetic_data_card
    from v1t_tpu.losses import get_criterion
    from v1t_tpu.models import build_model, model_regularizer
    from v1t_tpu.models.model import init_model

    config = Config(
        core="vit", readout="gaussian2d", behavior_mode=3, shift_mode=2,
        batch_size=batch_size, precision="bf16", attention_impl="auto",
        resize_image=0, core_reg_scale=0.5379, readout_reg_scale=0.0076,
        lr=0.001647,
    )
    card = synthetic_data_card(
        mouse_ids=("A",), num_neurons=7000, input_shape=(1, 36, 64),
        ds_size=4096,
    )
    model = build_model(config, card)
    params = init_model(model, seed=0, batch_size=1)
    criterion = get_criterion(config, card.ds_sizes)

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(batch_size, 1, 36, 64)), jnp.float32)
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
        loss = criterion(responses, y_pred, mouse_id="A", batch_size=batch_size)
        return loss + model_regularizer(config, p, mouse_id="A")

    grad_fn = jax.jit(jax.grad(loss_fn))
    base_rng = jax.random.key(0)
    return grad_fn, params, base_rng


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/v1t_profile"
    batch_size = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    grad_fn, params, base_rng = build_step(batch_size)

    g = grad_fn(params, jax.random.fold_in(base_rng, 0))
    jax.block_until_ready(g)

    t0 = time.perf_counter()
    for i in range(10):
        g = grad_fn(params, jax.random.fold_in(base_rng, i + 1))
    jax.block_until_ready(g)
    print(f"step time: {(time.perf_counter() - t0) / 10 * 1e3:.1f} ms")

    jax.profiler.start_trace(out_dir)
    for i in range(5):
        g = grad_fn(params, jax.random.fold_in(base_rng, 100 + i))
    jax.block_until_ready(g)
    jax.profiler.stop_trace()

    xplanes = glob.glob(os.path.join(out_dir, "**", "*.xplane.pb"), recursive=True)
    print("xplane files:", xplanes)
    if xplanes:
        summarize(sorted(xplanes)[-1])


def summarize(xplane_path):
    from tensorboard_plugin_profile.convert import raw_to_tool_data

    for tool in ("hlo_op_stats", "op_stats", "hlo_stats", "framework_op_stats"):
        try:
            data, _ = raw_to_tool_data.xspace_to_tool_data(
                [xplane_path], tool + "^", {}
            )
        except Exception as e:
            print(f"[{tool}] failed: {type(e).__name__}: {e}")
            continue
        out = f"/tmp/profile_{tool}.out"
        mode = "wb" if isinstance(data, bytes) else "w"
        with open(out, mode) as f:
            f.write(data)
        print(f"[{tool}] wrote {out} ({len(data)} bytes)")


if __name__ == "__main__":
    main()
