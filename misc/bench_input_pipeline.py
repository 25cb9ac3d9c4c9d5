"""Input-pipeline micro-benchmark: packed-array batch serving vs the
reference's per-trial .npy reads (SURVEY §7 hard part #6 — tens of thousands
of tiny file reads would starve a TPU slice).

    python misc/bench_input_pipeline.py --dataset <dir> --mouse_id A
"""


from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)


import argparse
import time

import numpy as np

from v1t_tpu.configs import Config
from v1t_tpu.data import MouseDataset, get_mouse_ids
from v1t_tpu.data.datasets import load_trial_data
from v1t_tpu.data.loaders import BatchLoader


def main(args):
    cfg = Config(dataset=args.dataset, behavior_mode=0,
                 mouse_ids=[args.mouse_id], verbose=0)
    get_mouse_ids(cfg)
    ds = MouseDataset(cfg, tier="train", data_dir=args.dataset,
                      mouse_id=args.mouse_id)
    n = len(ds)

    # per-trial file reads + per-sample transforms (the reference's
    # __getitem__ path, data.py:412-434)
    t0 = time.perf_counter()
    for pos in range(min(n, args.samples)):
        trial = ds.indexes[pos]
        raw = load_trial_data(ds.mouse_dir, trial=trial)
        ds.transform_image(raw["image"])
        ds.transform_response(raw["response"])
        ds.transform_behavior(raw["behavior"])
        ds.transform_pupil_center(raw["pupil_center"])
    per_trial = (time.perf_counter() - t0) / min(n, args.samples)

    # packed-array vectorized batches: numpy transforms vs the native
    # fastbatch kernels (v1t_tpu/data/_fastbatch.c)
    import os

    from v1t_tpu.data import fastbatch

    def run_loader():
        loader = BatchLoader(ds, batch_size=args.batch_size, shuffle=True)
        count = 0
        t0 = time.perf_counter()
        for batch in loader:
            count += len(batch["image"])
        return count, (time.perf_counter() - t0) / count

    os.environ["V1T_HOST_FASTPATH"] = "0"
    count, packed = run_loader()
    os.environ["V1T_HOST_FASTPATH"] = "1"
    native = None
    if fastbatch.lib() is not None:
        _, native = run_loader()

    print(f"samples: {count} (batch {args.batch_size})")
    print(f"per-trial .npy path : {per_trial * 1e6:9.1f} us/sample "
          f"({1 / per_trial:,.0f} samples/s)")
    print(f"packed numpy path   : {packed * 1e6:9.1f} us/sample "
          f"({1 / packed:,.0f} samples/s)  [{per_trial / packed:.1f}x]")
    if native is not None:
        print(f"packed native path  : {native * 1e6:9.1f} us/sample "
              f"({1 / native:,.0f} samples/s)  [{per_trial / native:.1f}x]")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", type=str, required=True)
    parser.add_argument("--mouse_id", type=str, default="A")
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--samples", type=int, default=256)
    main(parser.parse_args())
