"""Pretrain a core on ImageNet-style data (classification or reconstruction)
and checkpoint it in the standard format for ``train.py --pretrain_core``.

The reference repo contains the pretraining data pipeline + task losses
(src/v1t/pretrain/) but no driver; this completes the capability.
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from v1t_tpu.configs import Config, save_args
from v1t_tpu.models.registry import get_core
from v1t_tpu.pretrain.data import ArrayImageDataset, load_image_folder
from v1t_tpu.pretrain.ssim import reconstruction_loss
from v1t_tpu.pretrain.tasks import (
    ClassificationModel,
    ReconstructionModel,
    nll_loss,
)
from v1t_tpu.utils.scheduler import Scheduler


def main(args):
    config = Config(
        output_dir=args.output_dir,
        core=args.core,
        behavior_mode=0,
        num_blocks=args.num_blocks,
        emb_dim=args.emb_dim,
        num_heads=args.num_heads,
        mlp_dim=args.mlp_dim,
        patch_size=args.patch_size,
        patch_stride=args.patch_stride,
        p_dropout=args.p_dropout,
        t_dropout=args.t_dropout,
        core_reg_scale=args.core_reg_scale,
        lr=args.lr,
        seed=args.seed,
        precision=args.precision,
        resize_image=args.resize_image,
        verbose=args.verbose,
    )
    os.makedirs(config.output_dir, exist_ok=True)

    images, labels = load_image_folder(
        args.dataset, resize_image=config.resize_image, limit=args.limit_data
    )
    ds = ArrayImageDataset(images, labels, seed=config.seed)
    image_shape = tuple(images.shape[1:])
    num_classes = int(labels.max()) + 1

    if args.mode == 0:
        model = ClassificationModel(
            config=config, image_shape=image_shape, num_classes=num_classes,
            dtype=jnp.bfloat16 if config.precision == "bf16" else None,
        )
    else:
        model = ReconstructionModel(
            config=config, image_shape=image_shape,
            dtype=jnp.bfloat16 if config.precision == "bf16" else None,
        )

    key = jax.random.key(config.seed)
    variables = model.init(
        {"params": key, "dropout": key, "droppath": key, "sample": key},
        jnp.zeros((1, *image_shape), jnp.float32),
        train=False,
    )
    variables = dict(variables)
    params = variables.pop("params")
    model_state = variables

    import optax

    tx = optax.adamw(config.lr, b1=0.9, b2=0.9999, weight_decay=0.0)
    opt_state = tx.init(params)
    core_cls = get_core(config.core)

    def loss_fn(p, state, batch_images, batch_labels, rng, train):
        mutable = list(state.keys()) if (train and state) else False
        rngs = {"dropout": rng, "droppath": rng, "sample": rng} if train else None
        out = model.apply(
            {"params": p, **state}, batch_images, train=train, rngs=rngs,
            mutable=mutable,
        )
        preds, new_state = out if mutable else (out, state)
        if args.mode == 0:
            loss = nll_loss(preds, batch_labels)
        else:
            loss = reconstruction_loss(batch_images, preds)
        reg = core_cls.regularizer(p["core"], config.core_reg_scale)
        return loss + reg, (loss, preds, new_state)

    @jax.jit
    def train_step(p, state, opt_state, batch_images, batch_labels, rng):
        (total, (loss, preds, new_state)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(p, state, batch_images, batch_labels, rng, True)
        updates, opt_state = tx.update(grads, opt_state, p)
        p = optax.apply_updates(p, updates)
        return p, new_state, opt_state, loss, preds

    @jax.jit
    def eval_step(p, state, batch_images, batch_labels):
        _, (loss, preds, _) = loss_fn(
            p, state, batch_images, batch_labels, None, False
        )
        return loss, preds

    save_args(config)
    scheduler = Scheduler(config, mode="min", save_optimizer=False)
    base_rng = jax.random.key(config.seed)
    step_count = 0

    for epoch in range(1, args.epochs + 1):
        start = time.time()
        train_losses, correct, seen = [], 0, 0
        for batch_images, batch_labels in ds.loader(
            "train", args.batch_size, shuffle=True, seed=config.seed + epoch
        )():
            step_count += 1
            params, model_state, opt_state, loss, preds = train_step(
                params, model_state, opt_state,
                jnp.asarray(batch_images), jnp.asarray(batch_labels),
                jax.random.fold_in(base_rng, step_count),
            )
            train_losses.append(float(loss))
            if args.mode == 0:
                correct += int((np.asarray(preds).argmax(1) == batch_labels).sum())
                seen += len(batch_labels)

        val_losses = []
        for batch_images, batch_labels in ds.loader(
            "validation", args.batch_size
        )():
            loss, _ = eval_step(
                params, model_state,
                jnp.asarray(batch_images), jnp.asarray(batch_labels),
            )
            val_losses.append(float(loss))
        val_loss = float(np.mean(val_losses))

        if config.verbose:
            acc = f"  acc: {100 * correct / max(seen, 1):.2f}%" if args.mode == 0 else ""
            print(
                f"Epoch {epoch:03d}: train {np.mean(train_losses):.4f}  "
                f"val {val_loss:.4f}{acc}  ({time.time() - start:.1f}s)"
            )
        stop, params, opt_state = scheduler.step(
            val_loss, epoch, params, opt_state, model_state=model_state
        )
        if stop:
            break

    print(f"Pretrained core saved to {config.output_dir}.")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", type=str, required=True,
                        help="ImageFolder-style directory")
    parser.add_argument("--output_dir", type=str, required=True)
    parser.add_argument("--mode", type=int, default=0, choices=[0, 1],
                        help="0: classification, 1: reconstruction")
    parser.add_argument("--core", type=str, default="vit")
    parser.add_argument("--epochs", type=int, default=100)
    parser.add_argument("--batch_size", type=int, default=64)
    parser.add_argument("--limit_data", type=int, default=None)
    parser.add_argument("--resize_image", type=int, default=1, choices=[0, 1])
    parser.add_argument("--num_blocks", type=int, default=4)
    parser.add_argument("--num_heads", type=int, default=4)
    parser.add_argument("--emb_dim", type=int, default=155)
    parser.add_argument("--mlp_dim", type=int, default=488)
    parser.add_argument("--patch_size", type=int, default=8)
    parser.add_argument("--patch_stride", type=int, default=1)
    parser.add_argument("--p_dropout", type=float, default=0.0229)
    parser.add_argument("--t_dropout", type=float, default=0.2544)
    parser.add_argument("--core_reg_scale", type=float, default=0.0)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--seed", type=int, default=1234)
    parser.add_argument("--precision", type=str, default="bf16",
                        choices=["bf16", "fp32"])
    parser.add_argument("--verbose", type=int, default=1)
    main(parser.parse_args())
