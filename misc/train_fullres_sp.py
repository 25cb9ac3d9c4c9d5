"""Short full-resolution sequence-parallel training smoke on real hardware.

SURVEY §5.7 / §2.12's promised configuration: 144x256 stimuli with NO
resize (patch 8 / stride 1 -> 34,114 tokens), the dt-blocked flash kernels
(auto-selected above the whole-K VMEM cap), composed with the
sequence-parallel attention bodies over a "seq" mesh of all local devices —
on the 1-chip environment a 1-shard mesh, which still runs the full SP
machinery (shard_map bodies, in-body rectangular flash kernel, LSE
normalization). Uses the REAL pipeline end to end: synthetic Sensorium
fixture on disk -> loaders -> Trainer -> plateau scheduler metrics.

Prints per-epoch train s/step and validation single-trial correlation, and
writes misc/results/fullres_sp_train_r05.json.

Usage: python misc/train_fullres_sp.py [epochs] [batch_size]
"""

import json
import os
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import jax

jax.config.update(
    "jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache")
)
jax.config.update("jax_default_prng_impl", "rbg")

import numpy as np
from jax.sharding import Mesh


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    batch_size = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    from v1t_tpu import training
    from v1t_tpu.configs import Config
    from v1t_tpu.data import get_mouse_ids, get_training_ds
    from v1t_tpu.data.synthetic import generate_dataset
    from v1t_tpu.models import build_model
    from v1t_tpu.models.model import init_model
    from v1t_tpu.parallel.context import set_sequence_mesh

    root = os.environ.get("V1T_FULLRES_DATA") or tempfile.mkdtemp(
        prefix="v1t_fullres_"
    )
    data_dir = os.path.join(root, "sensorium")
    if not os.path.isdir(data_dir):
        data_dir = generate_dataset(
            root, ds_name="sensorium", mouse_ids=("A", "B"),
            num_train=32, num_validation=8, num_test_images=4,
            num_test_repeats=2, num_neurons=1000,
            image_shape=(1, 144, 256),
        )

    config = Config(
        dataset=data_dir, output_dir=os.path.join(root, "run"),
        core="vit", readout="gaussian2d", behavior_mode=3, shift_mode=2,
        batch_size=batch_size, precision="bf16", attention_impl="auto",
        readout_impl="auto", resize_image=0, grad_checkpointing=0,
        core_reg_scale=0.5379, readout_reg_scale=0.0076, lr=0.001647,
        mouse_ids=["A", "B"], verbose=0,
    )
    get_mouse_ids(config)
    train_ds, val_ds, _, card = get_training_ds(
        config, data_dir=config.dataset, mouse_ids=config.mouse_ids,
        batch_size=config.batch_size,
    )
    model = build_model(config, card)
    params = init_model(model, seed=0)

    devices = jax.devices()
    mesh = Mesh(np.asarray(devices), ("seq",))
    set_sequence_mesh(mesh, axis="seq", impl="allgather")
    try:
        trainer = training.Trainer(config, model, params, card)
        steps_per_epoch = len(training.CycleLoaders(train_ds))
        log = {"epochs": [], "seq_shards": len(devices),
               "batch_size": batch_size,
               "tokens": 34114, "steps_per_epoch": steps_per_epoch}
        for epoch in range(1, epochs + 1):
            t0 = time.perf_counter()
            train_res = training.train_epoch(trainer, ds=train_ds, epoch=epoch)
            jax.block_until_ready(trainer.params)
            dt = time.perf_counter() - t0
            val_res = training.validate(trainer, ds=val_ds, epoch=epoch)
            row = {
                "epoch": epoch,
                "train_loss": round(train_res["loss"], 5),
                "s_per_step": round(dt / steps_per_epoch, 3),
                "val_corr": round(
                    val_res["single_trial_correlation"], 4
                ),
            }
            log["epochs"].append(row)
            print(json.dumps(row), flush=True)
            assert np.isfinite(train_res["loss"]), "NaN/inf train loss"
    finally:
        set_sequence_mesh(None)

    out = os.path.join(_REPO, "misc", "results", "fullres_sp_train_r05.json")
    with open(out, "w") as f:
        json.dump(log, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
