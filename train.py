"""Train a V1T-family model on Sensorium/Franke2022 — TPU-native rebuild of
the reference CLI (reference train.py:328-661; same flag names and tuned
defaults).

Example:
    python train.py --dataset data/sensorium --output_dir runs/v1t \\
        --core vit --readout gaussian2d --behavior_mode 3 --batch_size 16
"""

from __future__ import annotations

import argparse
import os
import shutil

import numpy as np

from v1t_tpu import training
from v1t_tpu.configs import Config, save_args
from v1t_tpu.data import get_mouse_ids, get_training_ds
from v1t_tpu.models import build_model
from v1t_tpu.models.model import init_model_variables
from v1t_tpu.parallel.mesh import DataParallel
from v1t_tpu.pretrained import load_pretrain_core
from v1t_tpu.utils.logger import Logger
from v1t_tpu.utils.scheduler import Scheduler
from v1t_tpu.utils.tensorboard import Summary


def main(config: Config, wandb_sweep: bool = False):
    if config.clear_output_dir and os.path.isdir(config.output_dir):
        shutil.rmtree(config.output_dir)
    os.makedirs(config.output_dir, exist_ok=True)

    import jax

    # platform override (e.g. V1T_PLATFORM=cpu with
    # XLA_FLAGS=--xla_force_host_platform_device_count=8 for virtual-mesh
    # runs); needed because a site config may pin jax_platforms before the
    # JAX_PLATFORMS env var is honored
    if os.environ.get("V1T_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["V1T_PLATFORM"])

    # multi-host bootstrap BEFORE any device query (SURVEY §5.8); no-op for
    # the common single-process case
    if config.num_processes and config.num_processes > 1:
        from v1t_tpu.parallel.multihost import initialize_distributed

        initialize_distributed(
            coordinator_address=config.coordinator_address,
            num_processes=config.num_processes,
            process_id=config.process_id,
        )

    if jax.default_backend() in ("tpu", "axon") and not config.deterministic:
        # hardware RNG for dropout masks (~5% step time vs threefry);
        # --deterministic keeps the counter-based threefry streams
        try:
            jax.config.update("jax_default_prng_impl", "rbg")
        except Exception:
            pass

    logger = Logger(config.output_dir)
    np.random.seed(config.seed)

    get_mouse_ids(config)
    train_ds, val_ds, test_ds, card = get_training_ds(
        config,
        data_dir=config.dataset,
        mouse_ids=config.mouse_ids,
        batch_size=config.batch_size,
    )
    summary = Summary(config)

    model = build_model(config, card)
    params, model_state = init_model_variables(model, seed=config.seed)

    core_frozen = False
    if config.pretrain_core:
        params, model_state = load_pretrain_core(config, params, model_state)
        core_frozen = True

    num_params = sum(
        int(np.prod(p.shape))
        for p in __import__("jax").tree_util.tree_leaves(params)
    )
    config.trainable_params = num_params
    if config.verbose:
        print(f"Model parameters: {num_params:,}")
    summary.scalar("model/trainable_parameters", num_params, step=0)
    # model.txt / model_core.txt / model_readout.txt (reference
    # model.py:19-47, 211-224 torchinfo summaries)
    from v1t_tpu.utils.summary import write_model_summaries

    write_model_summaries(config, model, card, config.output_dir)

    mesh = None
    if config.data_parallel != 1 or config.sequence_parallel > 1:
        mesh = DataParallel.create(
            num_devices=config.data_parallel or None,
            sequence_parallel=config.sequence_parallel,
        )
        if mesh is not None and config.verbose:
            print(
                f"Mesh {dict(zip(mesh.mesh.axis_names, mesh.mesh.devices.shape))}"
            )
    if mesh is not None and mesh.seq_axis:
        from v1t_tpu.parallel.context import set_sequence_mesh

        set_sequence_mesh(
            mesh.mesh, axis="seq", impl=config.sequence_parallel_impl,
            batch_axis="data",
        )
        if config.core == "vit":
            from v1t_tpu.models.cores.vit import sp_bypasses_fused_attention
            from v1t_tpu.models.model import core_token_count

            # NOT model.core.num_patches: submodules assigned in setup() are
            # inaccessible on the unbound Model (Flax raises AttributeError)
            ntok = core_token_count(config, card)
            if sp_bypasses_fused_attention(config, ntok):
                print(
                    f"WARNING: --sequence_parallel shards attention through "
                    f"the composed (non-fused) path; at {ntok} tokens the "
                    f"fused sublayer kernel is faster on a single chip — "
                    f"use sequence parallelism only when the token count or "
                    f"memory requires it."
                )
    elif config.sequence_parallel > 1:
        print(
            f"WARNING: --sequence_parallel {config.sequence_parallel} "
            f"requested but only {len(jax.devices())} device(s) visible — "
            "running without token sharding."
        )

    trainer = training.Trainer(
        config, model, params, card, core_frozen=core_frozen, mesh=mesh,
        model_state=model_state,
    )
    scheduler = Scheduler(config, mode="max")

    wandb_run = None
    if config.use_wandb:
        try:
            import wandb

            wandb_run = wandb.init(
                project="v1t_tpu",
                group=config.wandb_group or None,
                config={k: v for k, v in config.to_dict().items()
                        if isinstance(v, (int, float, str, bool))},
            )
        except Exception as e:
            print(f"wandb unavailable: {e}")

    save_args(config)
    epoch, trainer.params, trainer.opt_state, trainer.model_state = (
        scheduler.restore(
            trainer.params, trainer.opt_state, trainer.model_state,
            load_optimizer=True, load_scheduler=True,
        )
    )

    import time as _time

    while (epoch := epoch + 1) < config.epochs + 1:
        if config.verbose:
            print(f"\nEpoch {epoch:03d}/{config.epochs:03d}")

        start = _time.time()
        train_result = training.train_epoch(
            trainer, ds=train_ds, epoch=epoch, summary=summary
        )
        val_result = training.validate(
            trainer, ds=val_ds, epoch=epoch, summary=summary
        )
        elapse = _time.time() - start

        summary.scalar("model/elapse", value=elapse, step=epoch, mode=0)
        from v1t_tpu.optim import get_learning_rates

        for name, lr in get_learning_rates(trainer.opt_state).items():
            summary.scalar(f"model/lr/{name}", value=lr, step=epoch)
        if epoch % 10 == 0:
            from v1t_tpu.utils.plots import plot_samples

            plot_samples(config, trainer, ds=val_ds, summary=summary, epoch=epoch)
        if config.verbose:
            print(
                f'Train\t\tloss: {train_result["loss"]:.04f}\n'
                f'Validation\tloss: {val_result["loss"]:.04f}\t'
                f'correlation: {val_result["single_trial_correlation"]:.04f}\n'
                f"Elapse: {elapse:.02f}s"
            )
        early_stop, trainer.params, trainer.opt_state = scheduler.step(
            val_result["single_trial_correlation"],
            epoch=epoch,
            params=trainer.params,
            opt_state=trainer.opt_state,
            model_state=trainer.model_state,
        )
        if wandb_run is not None:
            wandb_run.log(
                {
                    "train_loss": train_result["loss"],
                    "val_loss": val_result["loss"],
                    "val_corr": val_result["single_trial_correlation"],
                    "best_corr": scheduler.best_value,
                    "elapse": elapse,
                },
                step=epoch,
            )
        if np.isnan(train_result["loss"]) or np.isnan(val_result["loss"]):
            if wandb_run is not None:
                wandb_run.finish(exit_code=1)
            exit("\nNaN loss detected, terminate training.")
        if early_stop:
            break

    training.restore_best(scheduler, trainer)
    eval_result = training.evaluate(
        config,
        trainer,
        ds=test_ds,
        epoch=epoch,
        summary=summary,
        mode=2,
        print_result=True,
        save_result=config.output_dir,
    )
    if wandb_run is not None and "single_trial_correlation" in eval_result:
        wandb_run.log(
            {"test_corr": eval_result["single_trial_correlation"]}, step=epoch
        )
    # TB-HParams row: swept hyperparameters -> final metrics (companion to
    # the wandb sweep table; configs/sweep_v1t.yaml defines the space)
    hparam_metrics = {}
    if np.isfinite(scheduler.best_value):
        hparam_metrics["best_val_correlation"] = float(scheduler.best_value)
    if "single_trial_correlation" in eval_result:
        hparam_metrics["test_correlation"] = float(
            eval_result["single_trial_correlation"]
        )
    if hparam_metrics:
        summary.hparams(
            {k: v for k, v in config.to_dict().items()
             if isinstance(v, (int, float, bool, str))},
            hparam_metrics,
        )
    if config.verbose:
        print(f"\nResults saved to {config.output_dir}.")
    summary.close()
    logger.close()
    return eval_result


# --- CLI --------------------------------------------------------------------


def add_common_args(parser: argparse.ArgumentParser):
    parser.add_argument("--dataset", type=str, required=True)
    parser.add_argument("--output_dir", type=str, required=True)
    parser.add_argument("--mouse_ids", nargs="+", type=str, default=None)
    parser.add_argument(
        "--behavior_mode", required=True, type=int, choices=[0, 1, 2, 3, 4]
    )
    parser.add_argument("--center_crop", type=float, default=1.0)
    parser.add_argument("--resize_image", type=int, default=1, choices=[0, 1])
    parser.add_argument("--gray_scale", action="store_true")
    parser.add_argument("--limit_data", type=int, default=None)
    parser.add_argument("--num_workers", type=int, default=2)
    parser.add_argument("--epochs", type=int, default=400)
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--micro_batch_size", type=int, default=0)
    parser.add_argument("--device", type=str, default="",
                        choices=["", "cpu", "tpu", "axon"])
    parser.add_argument("--seed", type=int, default=1234)
    parser.add_argument("--amp", action="store_true",
                        help="bf16 compute (TPU equivalent of AMP)")
    parser.add_argument("--precision", type=str, default="bf16",
                        choices=["bf16", "fp32"])
    parser.add_argument("--image_wire_dtype", type=str, default="auto",
                        choices=["auto", "fp32"],
                        help="host->device image dtype; fp32 keeps the "
                             "reference's exact wire for strict parity")
    parser.add_argument("--attention_impl", type=str, default="auto",
                        choices=["auto", "pallas", "xla"])
    parser.add_argument("--readout_impl", type=str, default="auto",
                        choices=["auto", "pallas", "xla"])
    parser.add_argument("--data_parallel", type=int, default=0,
                        help="devices for DP; 0 = all local devices")
    parser.add_argument("--sequence_parallel", type=int, default=0,
                        help="shard attention tokens over a 'seq' mesh axis "
                             "of this size (0/1 = off)")
    parser.add_argument("--sequence_parallel_impl", type=str,
                        default="allgather", choices=["allgather", "ring"])
    parser.add_argument("--coordinator_address", type=str, default=None,
                        help="host:port of process 0 for multi-host runs")
    parser.add_argument("--num_processes", type=int, default=0,
                        help="total processes in a multi-host run (0/1 = "
                             "single process)")
    parser.add_argument("--process_id", type=int, default=0)
    parser.add_argument("--grad_checkpointing", type=int, default=None,
                        choices=[0, 1])
    parser.add_argument("--deterministic", action="store_true")
    parser.add_argument("--adam_beta1", type=float, default=0.9)
    parser.add_argument("--adam_beta2", type=float, default=0.9999)
    parser.add_argument("--adam_eps", type=float, default=1e-8)
    parser.add_argument("--criterion", type=str, default="poisson")
    parser.add_argument("--ds_scale", type=int, default=1, choices=[0, 1])
    parser.add_argument("--pretrain_core", type=str, default="")
    parser.add_argument("--save_plots", action="store_true")
    parser.add_argument("--dpi", type=int, default=120)
    parser.add_argument("--format", type=str, default="svg",
                        choices=["pdf", "svg", "png"])
    parser.add_argument("--use_wandb", action="store_true")
    parser.add_argument("--wandb_group", type=str, default="")
    parser.add_argument("--clear_output_dir", action="store_true")
    parser.add_argument("--verbose", type=int, default=1, choices=[0, 1, 2, 3])


def add_model_args(parser: argparse.ArgumentParser):
    parser.add_argument("--core", type=str, required=True)
    parser.add_argument("--readout", type=str, required=True)
    parser.add_argument("--shift_mode", type=int, default=2,
                        choices=[0, 1, 2, 3, 4])

    temp_args = parser.parse_known_args()[0]

    # per-core hyper-parameters with the reference's tuned defaults
    # (reference train.py:521-659)
    if temp_args.core in ("vit", "cct"):
        parser.add_argument("--patch_size", type=int, default=8)
        if temp_args.core == "vit":
            parser.add_argument("--patch_mode", type=int, default=0,
                                choices=[0, 1, 2, 3])
        parser.add_argument("--patch_stride", type=int, default=1)
        parser.add_argument("--num_blocks", type=int, default=4)
        parser.add_argument("--num_heads", type=int, default=4)
        parser.add_argument(
            "--emb_dim", type=int, default=155 if temp_args.core == "vit" else 160
        )
        parser.add_argument("--mlp_dim", type=int, default=488)
        if temp_args.core == "cct":
            parser.add_argument("--pos_emb", type=str, default="sine",
                                choices=["sine", "learn", "none"])
        parser.add_argument("--p_dropout", type=float, default=0.0229)
        parser.add_argument("--t_dropout", type=float, default=0.2544)
        parser.add_argument("--drop_path", type=float, default=0.0)
        if temp_args.core == "vit":
            parser.add_argument("--use_lsa", action="store_true")
            parser.add_argument("--disable_bias", action="store_true")
        parser.add_argument("--core_reg_scale", type=float, default=0.5379)
        parser.add_argument("--lr", type=float, default=0.001647)
        parser.add_argument("--core_lr", type=float, default=None)
    elif temp_args.core == "stacked2d":
        parser.add_argument("--num_layers", type=int, default=4)
        parser.add_argument("--dropout", type=float, default=0.0)
        parser.add_argument("--core_reg_input", type=float, default=6.3831)
        parser.add_argument("--core_reg_hidden", type=float, default=0.0)
        parser.add_argument("--linear", action="store_true")
        parser.add_argument("--lr", type=float, default=0.009)
        parser.add_argument("--core_lr", type=float, default=None)
        parser.add_argument("--core_reg_scale", type=float, default=0.0)
        # architecture variants (reference stacked2d.py:315-601 kwargs)
        parser.add_argument("--stacked2d_conv_type", type=str, default="ds",
                            choices=["ds", "attention", "conv"])
        parser.add_argument("--stacked2d_skip", type=int, default=0)
        parser.add_argument("--stacked2d_stack", type=int, default=-1)
        parser.add_argument("--stacked2d_pad_input", type=int, default=0,
                            choices=[0, 1])
        parser.add_argument("--stacked2d_batch_norm", type=int, default=1,
                            choices=[0, 1])
        parser.add_argument("--stacked2d_independent_bn_bias", type=int,
                            default=1, choices=[0, 1])
        parser.add_argument("--stacked2d_batch_norm_scale", type=int,
                            default=1, choices=[0, 1])
        parser.add_argument("--stacked2d_final_batchnorm_scale", type=int,
                            default=1, choices=[0, 1])
        parser.add_argument("--stacked2d_final_nonlinearity", type=int,
                            default=1, choices=[0, 1])
    elif temp_args.core == "stn":
        parser.add_argument("--num_layers", type=int, default=7)
        parser.add_argument("--num_filters", type=int, default=63)
        parser.add_argument("--dropout", type=float, default=0.1135)
        parser.add_argument("--core_reg_scale", type=float, default=0.0450)
        parser.add_argument("--lr", type=float, default=0.001)
        parser.add_argument("--core_lr", type=float, default=None)
    else:  # linear / random / mixer baselines
        parser.add_argument("--num_layers", type=int, default=4)
        parser.add_argument("--num_filters", type=int, default=8)
        parser.add_argument("--dropout", type=float, default=0.0)
        parser.add_argument("--num_blocks", type=int, default=4)
        parser.add_argument("--emb_dim", type=int, default=128)
        parser.add_argument("--mlp_dim", type=int, default=256)
        parser.add_argument("--patch_size", type=int, default=8)
        parser.add_argument("--patch_stride", type=int, default=1)
        parser.add_argument("--core_reg_scale", type=float, default=0.0)
        parser.add_argument("--lr", type=float, default=0.001)
        parser.add_argument("--core_lr", type=float, default=None)

    # readout hyper-parameters (reference train.py:634-650)
    if temp_args.readout == "gaussian2d":
        parser.add_argument("--disable_grid_predictor", action="store_true")
        parser.add_argument("--grid_predictor_dim", type=int, default=2,
                            choices=[2, 3])
        parser.add_argument("--bias_mode", type=int, default=0, choices=[0, 1, 2])
        parser.add_argument("--readout_reg_scale", type=float, default=0.0076)
    else:
        parser.add_argument("--readout_reg_scale", type=float, default=0.0)

    if temp_args.shift_mode in (1, 2, 3, 4):
        parser.add_argument("--shifter_reg_scale", type=float, default=0.0)
    if temp_args.shift_mode in (2, 3, 4):
        parser.add_argument("--cropper_reg_scale", type=float, default=0.0)


def parse_config() -> Config:
    parser = argparse.ArgumentParser()
    add_common_args(parser)
    add_model_args(parser)
    args = parser.parse_args()
    known = {f.name for f in __import__("dataclasses").fields(Config)}
    kwargs = {k: v for k, v in vars(args).items() if k in known and v is not None}
    if args.amp:
        kwargs["precision"] = "bf16"
    return Config(**kwargs)


if __name__ == "__main__":
    main(parse_config())
