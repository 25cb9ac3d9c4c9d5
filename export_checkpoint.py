"""Export a run from this framework into the reference (PyTorch) format.

The inverse of ``import_checkpoint.py``: converts a run directory written by
``train.py`` (``args.yaml`` + ``ckpt/model_state.msgpack``) into the
reference's checkpoint layout

    <torch_out>/args.yaml               copied run configuration (the CLI
                                        flag names are shared by design)
    <torch_out>/ckpt/model_state.pt     torch pickle {epoch, value, model}
                                        (reference src/v1t/utils/
                                        scheduler.py:84-102 layout)

so a model trained on TPU here can be restored by the reference's
``Scheduler.restore`` (partial ``state_dict.update``, reference
scheduler.py:122-136) and driven by its own submission.py / demo.ipynb.
The JAX -> torch parameter mapping is v1t_tpu/utils/torch_export.py, the
exact inverse of the canonical transplant mapping (round-trip and
reference-load parity pinned by tests/test_checkpoint_export.py).

Usage:
    python export_checkpoint.py --output_dir <run dir> --torch_out <dir>
"""

from __future__ import annotations

import argparse
import os
import shutil

from v1t_tpu.configs import load_args
from v1t_tpu.utils.scheduler import CKPT_NAME, load_checkpoint_file
from v1t_tpu.utils.torch_export import export_state_dict


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "--output_dir", type=str, required=True,
        help="run directory written by train.py (args.yaml + ckpt/)",
    )
    parser.add_argument(
        "--torch_out", type=str, required=True,
        help="destination directory for the reference-format run",
    )
    args = parser.parse_args()

    import torch

    config = load_args(args.output_dir)
    ckpt_path = os.path.join(args.output_dir, "ckpt", CKPT_NAME)
    ckpt = load_checkpoint_file(ckpt_path)

    if not config.mouse_ids:
        raise ValueError(
            f"{args.output_dir}/args.yaml has no mouse_ids — cannot map "
            "per-mouse modules"
        )
    sd = export_state_dict(
        ckpt["model"], config, batch_stats=ckpt.get("model_state")
    )

    os.makedirs(os.path.join(args.torch_out, "ckpt"), exist_ok=True)
    payload = {
        "epoch": int(ckpt.get("epoch", 0)),
        "value": float(ckpt.get("value", 0.0)),
        "model": {k: torch.from_numpy(v) for k, v in sd.items()},
    }
    out_path = os.path.join(args.torch_out, "ckpt", "model_state.pt")
    torch.save(payload, out_path)
    src_yaml = os.path.join(args.output_dir, "args.yaml")
    if os.path.isfile(src_yaml):
        shutil.copy(src_yaml, os.path.join(args.torch_out, "args.yaml"))
    print(
        f"exported {len(sd)} tensors (epoch {payload['epoch']}, "
        f"best value {payload['value']:.4f}) -> {out_path}"
    )


if __name__ == "__main__":
    main()
