"""Cross-framework convergence A/B: train the ACTUAL torch reference
(/root/reference, via v1t_tpu/utils/reference_bridge.py) and this framework
on the SAME on-disk synthetic fixture, from the SAME initialization, with
the same schedule (epochs, plateau patience, LR decay), and compare the
validation-correlation trajectories and final challenge metrics.

This is the strongest real-data proxy available while the Sensorium
archives are absent (BASELINE.md): it crosses the scheduler's
plateau-rollback boundary (reference scheduler.py:173-197) under full
50-epoch training dynamics, not just the leaf-for-leaf 3-step parity of
tests/test_reference_parity.py. Multiple reference seeds give the
seed-noise band the JAX run must land inside.

Usage:
    python misc/convergence_ab.py [--workdir DIR] [--epochs 60]
        [--lr_patience 10] [--ref_seeds 11 23 42]
        [--jax_seeds 11 23 42] [--out results.json]

Seed design (VERDICT r4 #4): every entry in --jax_seeds trains from this
framework's OWN native initialization, giving the rebuild's seed-to-seed
spread to set against the reference band; one extra matched run
("jax_matched") starts from the torch reference's captured seed-11 init
so the trajectory-correlation comparison of earlier rounds is preserved.

Results land in <workdir>/convergence_ab.json; the PARITY.md section
"Cross-framework convergence A/B" is generated from this file.
"""

import argparse
import json
import os
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update(
    "jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache_cpu")
)


def ab_config(seed: int = 11, batch_size: int = 16):
    """Small-but-real config: flagship architecture scaled down so 60 CPU
    epochs finish in minutes; dropout/ds_scale/shift machinery all ON."""
    from v1t_tpu.configs import Config

    return Config(
        core="vit", readout="gaussian2d", behavior_mode=3, shift_mode=2,
        precision="fp32", attention_impl="xla", resize_image=0,
        num_blocks=2, emb_dim=32, num_heads=2, mlp_dim=64,
        patch_size=8, patch_stride=4, p_dropout=0.02, t_dropout=0.25,
        core_reg_scale=0.1, readout_reg_scale=0.01,
        batch_size=batch_size, lr=1.647e-3, ds_scale=True, seed=seed,
    )


def make_fixture(workdir: str, num_train=280, num_validation=64,
                 num_neurons=100):
    from v1t_tpu.data.synthetic import generate_dataset

    return generate_dataset(
        workdir, ds_name="sensorium", mouse_ids=("A", "B"),
        num_neurons=num_neurons, num_train=num_train,
        num_validation=num_validation, num_test_images=8,
        num_test_repeats=5,
    )


def run_ab(workdir: str, epochs: int = 60, lr_patience: int = 10,
           ref_seeds=(11, 23, 42), jax_seeds=(11, 23, 42),
           matched_seed: int = 11) -> dict:
    from v1t_tpu.utils import reference_bridge as rb
    from v1t_tpu.utils.torch_transplant import convert_state_dict

    fixture = make_fixture(os.path.join(workdir, "data"))
    results: dict = {"ref": {}, "jax": {}, "jax_matched": None,
                     "config": {}}

    def _log(tag, seed, rec):
        print(
            f"[{tag} seed {seed}] {rec['stopped_epoch']} epochs in "
            f"{rec['elapsed_s']}s best={rec['best_value']:.4f} "
            f"test={rec.get('eval', {}).get('single_trial_correlation')} "
            f"feve={rec.get('eval', {}).get('feve')}"
        )

    init_sd = None
    for seed in ref_seeds:
        cfg = ab_config(seed=seed)
        t0 = time.time()
        rec = rb.run_reference_training(
            cfg, fixture, os.path.join(workdir, f"ref_seed{seed}"),
            mouse_ids=("A", "B"), epochs=epochs, lr_patience=lr_patience,
            capture_init=(seed == matched_seed),
        )
        rec["elapsed_s"] = round(time.time() - t0, 1)
        if "init_state_dict" in rec:
            init_sd = rec.pop("init_state_dict")
        results["ref"][seed] = rec
        _log("ref", seed, rec)

    # The rebuild's own seed band: native flax init per seed (same init
    # DISTRIBUTIONS as torch — pinned by tests/test_torch_init.py — but
    # independent draws), its own data order and dropout RNG.
    for seed in jax_seeds:
        cfg = ab_config(seed=seed)
        cfg.mouse_ids = ["A", "B"]
        t0 = time.time()
        rec = rb.run_jax_training(
            cfg, fixture, os.path.join(workdir, f"jax_seed{seed}"),
            mouse_ids=("A", "B"), epochs=epochs, lr_patience=lr_patience,
        )
        rec["elapsed_s"] = round(time.time() - t0, 1)
        rec["init_from_reference"] = False
        results["jax"][seed] = rec
        _log("jax", seed, rec)

    # Matched-init run: start from the reference's captured init so the
    # epoch-level trajectory correlation is same-init, as in round 4.
    if init_sd is not None:
        cfg = ab_config(seed=matched_seed)
        cfg.mouse_ids = ["A", "B"]
        init_params = convert_state_dict(init_sd, cfg)
        t0 = time.time()
        rec = rb.run_jax_training(
            cfg, fixture, os.path.join(workdir, "jax_matched"),
            mouse_ids=("A", "B"), epochs=epochs, lr_patience=lr_patience,
            init_params=init_params,
        )
        rec["elapsed_s"] = round(time.time() - t0, 1)
        rec["init_from_reference"] = True
        results["jax_matched"] = rec
        _log("jax_matched", matched_seed, rec)

    results["config"] = {
        "epochs": epochs, "lr_patience": lr_patience,
        "ref_seeds": list(ref_seeds), "jax_seeds": list(jax_seeds),
        "matched_seed": matched_seed,
    }
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--lr_patience", type=int, default=10)
    ap.add_argument("--ref_seeds", type=int, nargs="+",
                    default=[11, 23, 42])
    ap.add_argument("--jax_seeds", type=int, nargs="+",
                    default=[11, 23, 42])
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    workdir = args.workdir or tempfile.mkdtemp(prefix="convergence_ab_")
    os.makedirs(workdir, exist_ok=True)
    results = run_ab(
        workdir, epochs=args.epochs, lr_patience=args.lr_patience,
        ref_seeds=tuple(args.ref_seeds), jax_seeds=tuple(args.jax_seeds),
    )
    out = args.out or os.path.join(workdir, "convergence_ab.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
