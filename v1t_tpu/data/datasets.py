"""Sensorium / Franke2022 dataset layer.

Ingest format is identical to the reference (zip archives that extract to
``<scan>/data/{images,responses,behavior,pupil_center}/<trial>.npy`` plus
``<scan>/meta/{neurons,trials,statistics}``; reference src/v1t/data.py:113-231),
but the serving path is TPU-first:

- **Packed-array cache**: the reference reads 4 small .npy files per sample
  per step (data.py:412-434) — tens of thousands of tiny file reads per epoch
  that would starve a TPU slice. On first touch each (mouse) directory is
  packed once into contiguous per-field arrays
  (``<scan>/packed/<field>.npy``), then served via memory-mapped reads.
- **Vectorized transforms**: standardization runs on whole batches in numpy
  (the per-sample transform semantics of data.py:354-410 are preserved
  exactly, incl. the response-precision rule at data.py:394-404).
"""

from __future__ import annotations

import os
import typing as t
from glob import glob
from zipfile import ZipFile

import numpy as np

from v1t_tpu.data.cards import DataCard, NeuronCard

DS_NAMES = ("sensorium", "franke2022")

# mouse_id -> recording basename. S0: Sensorium, S1: Sensorium+
# (reference data.py:19-40)
SENSORIUM = {
    "S0": "static26872-17-20-GrayImageNet-94c6ff995dac583098847cfecd43e7b6",
    "S1": "static27204-5-13-GrayImageNet-94c6ff995dac583098847cfecd43e7b6",
    "A": "static21067-10-18-GrayImageNet-94c6ff995dac583098847cfecd43e7b6",
    "B": "static22846-10-16-GrayImageNet-94c6ff995dac583098847cfecd43e7b6",
    "C": "static23343-5-17-GrayImageNet-94c6ff995dac583098847cfecd43e7b6",
    "D": "static23656-14-22-GrayImageNet-94c6ff995dac583098847cfecd43e7b6",
    "E": "static23964-4-22-GrayImageNet-94c6ff995dac583098847cfecd43e7b6",
}

FRANKE2022 = {
    "F": "static25311-10-26-ColorImageNet-104e446ed0128d89c639eef0abe4655b",
    "G": "static25340-3-19-ColorImageNet-104e446ed0128d89c639eef0abe4655b",
    "H": "static25704-2-12-ColorImageNet-b23ac8521543becfd382e56c657ba29b",
    "I": "static25830-10-4-ColorImageNet-104e446ed0128d89c639eef0abe4655b",
    "J": "static26085-6-3-ColorImageNet-104e446ed0128d89c639eef0abe4655b",
    "K": "static26142-2-11-ColorImageNet-6a21297215f4dbb802554a60c0e72877",
    "L": "static26426-18-13-ColorImageNet-b23ac8521543becfd382e56c657ba29b",
    "M": "static26470-4-5-ColorImageNet-104e446ed0128d89c639eef0abe4655b",
    "N": "static26644-6-2-ColorImageNet-b23ac8521543becfd382e56c657ba29b",
    "O": "static26872-21-6-ColorImageNet-104e446ed0128d89c639eef0abe4655b",
}

FIELDS = ("images", "responses", "behavior", "pupil_center")


def get_mouse2path(ds_name: str) -> t.Dict[str, str]:
    assert ds_name in DS_NAMES
    return SENSORIUM if ds_name == "sensorium" else FRANKE2022


def get_mouse_ids(config) -> t.List[str]:
    """Resolve the mouse list; S0 has no behavior data so it is dropped when
    behavior_mode > 0 (reference data.py:48-68). Returns the list and fills
    config.ds_name / config.mouse_ids."""
    config.ds_name = os.path.basename(os.path.normpath(config.dataset))
    if config.ds_name == "sensorium":
        all_animals = list(SENSORIUM.keys())
        if not config.mouse_ids:
            config.mouse_ids = list(all_animals)
            if config.behavior_mode > 0:
                config.mouse_ids.remove("S0")
    elif config.ds_name == "franke2022":
        all_animals = list(FRANKE2022.keys())
        if not config.mouse_ids:
            config.mouse_ids = list(all_animals)
    else:
        raise KeyError(f"--dataset {config.ds_name} not implemented.")
    for mouse_id in config.mouse_ids:
        assert mouse_id in all_animals
    return config.mouse_ids


def unzip(filename: str, unzip_dir: str):
    if not os.path.exists(filename):
        raise FileNotFoundError(f"file {filename} not found.")
    print(f"Unzipping {filename}...")
    with ZipFile(filename, mode="r") as file:
        file.extractall(unzip_dir)


def _ensure_extracted(mouse_dir: str):
    if not os.path.isdir(mouse_dir):
        unzip(filename=f"{mouse_dir}.zip", unzip_dir=os.path.dirname(mouse_dir))


def get_num_trials(mouse_dir: str) -> int:
    return len(glob(os.path.join(mouse_dir, "data", "images", "*.npy")))


def get_image_shape(mouse_dir: str) -> t.Tuple[int, ...]:
    return np.load(os.path.join(mouse_dir, "data", "images", "0.npy")).shape


def load_trial_data(mouse_dir: str, trial: int) -> t.Dict[str, np.ndarray]:
    """Load one trial's raw (untransformed) data (reference data.py:138-153)."""
    filename, data_dir = f"{trial}.npy", os.path.join(mouse_dir, "data")

    def _load(item):
        return np.load(os.path.join(data_dir, item, filename)).astype(np.float32)

    return {
        "image": _load("images"),
        "response": _load("responses"),
        "behavior": _load("behavior"),
        "pupil_center": _load("pupil_center"),
    }


def load_mouse_metadata(ds_name: str, mouse_dir: str) -> t.Dict[str, t.Any]:
    """Neuron ids/coordinates, tiers, per-field statistics, image/trial ids
    (reference data.py:156-231)."""
    _ensure_extracted(mouse_dir)
    meta_dir = os.path.join(mouse_dir, "meta")
    neuron_dir = os.path.join(meta_dir, "neurons")
    trial_dir = os.path.join(meta_dir, "trials")
    stats_dir = os.path.join(meta_dir, "statistics")

    load_neuron = lambda a: np.load(os.path.join(neuron_dir, a))
    load_trial = lambda a: np.load(os.path.join(trial_dir, a))
    load_stat = lambda a, b: np.load(os.path.join(stats_dir, a, "all", f"{b}.npy"))

    stat_keys = ["min", "max", "median", "mean", "std"]
    metadata = {
        "mouse_dir": mouse_dir,
        "num_neurons": len(load_neuron("unit_ids.npy")),
        "neuron_ids": load_neuron("unit_ids.npy").astype(np.int32),
        "coordinates": load_neuron("cell_motor_coordinates.npy").astype(np.float32),
        "tiers": load_trial("tiers.npy"),
        "stats": {
            "image": {k: load_stat("images", k) for k in stat_keys},
            "response": {k: load_stat("responses", k) for k in stat_keys},
            "behavior": {k: load_stat("behavior", k) for k in stat_keys},
            "pupil_center": {k: load_stat("pupil_center", k) for k in stat_keys},
        },
    }
    if ds_name == "sensorium":
        metadata["image_ids"] = load_trial("frame_image_id.npy")
    else:
        metadata["image_ids"] = load_trial("colorframeprojector_image_id.npy")
    metadata["trial_ids"] = load_trial("trial_idx.npy")
    if np.issubdtype(metadata["trial_ids"].dtype, np.integer):
        metadata["trial_ids"] = metadata["trial_ids"].astype(np.int32)
    return metadata


def pack_mouse_dir(mouse_dir: str, verbose: int = 1) -> str:
    """Pack the per-trial .npy files into one contiguous array per field.

    Done once per mouse; all tiers then serve memory-mapped slices. This is
    the input-pipeline fix for SURVEY.md §7 hard-part #6 (tens of thousands
    of tiny file reads would starve a TPU slice).
    """
    packed_dir = os.path.join(mouse_dir, "packed")
    done_marker = os.path.join(packed_dir, ".complete")
    if os.path.exists(done_marker):
        return packed_dir
    os.makedirs(packed_dir, exist_ok=True)
    num_trials = get_num_trials(mouse_dir)
    if verbose:
        print(f"Packing {num_trials} trials in {mouse_dir}...")

    # thread pool over trial ranges: the packing cost is tens of thousands
    # of tiny-file reads (SURVEY §7 hard-part #6) and np.load releases the
    # GIL during the read syscalls; threads write disjoint slices of the
    # destination memmap, so no synchronization is needed
    import concurrent.futures

    # V1T_PACK_WORKERS is the TOTAL reader-thread budget: the 4 fields pack
    # concurrently in an outer pool, so each field gets budget/len(FIELDS)
    # threads (ADVICE r4: the knob used to be per-field, 4x the ask)
    budget = int(os.environ.get("V1T_PACK_WORKERS") or 0) or min(
        16, os.cpu_count() or 4
    )
    workers = max(1, budget // len(FIELDS))

    def _pack_field(field: str):
        first = np.load(os.path.join(mouse_dir, "data", field, "0.npy"))
        out = np.lib.format.open_memmap(
            os.path.join(packed_dir, f"{field}.npy"),
            mode="w+",
            dtype=np.float32,
            shape=(num_trials,) + first.shape,
        )

        def _fill(lo: int, hi: int):
            for trial in range(lo, hi):
                out[trial] = np.load(
                    os.path.join(mouse_dir, "data", field, f"{trial}.npy")
                )

        step = max(64, -(-num_trials // workers))
        ranges = [
            (lo, min(lo + step, num_trials))
            for lo in range(0, num_trials, step)
        ]
        if len(ranges) > 1:
            with concurrent.futures.ThreadPoolExecutor(workers) as pool:
                list(pool.map(lambda r: _fill(*r), ranges))
        else:
            _fill(0, num_trials)
        out.flush()
        del out

    with concurrent.futures.ThreadPoolExecutor(len(FIELDS)) as pool:
        list(pool.map(_pack_field, FIELDS))
    with open(done_marker, "w") as f:
        f.write("ok")
    return packed_dir


class MouseDataset:
    """Per-(mouse, tier) dataset over packed arrays, with the reference's
    transform semantics (reference MiceDataset, data.py:275-434)."""

    def __init__(self, config, tier: str, data_dir: str, mouse_id: str):
        assert tier in ("train", "validation", "test", "final_test")
        self.tier = tier
        self.mouse_id = mouse_id
        self.ds_name = config.ds_name
        assert self.ds_name in DS_NAMES
        mouse2path = get_mouse2path(self.ds_name)
        mouse_dir = os.path.join(data_dir, mouse2path[mouse_id])
        metadata = load_mouse_metadata(self.ds_name, mouse_dir=mouse_dir)
        self.behavior_mode = config.behavior_mode
        if self.behavior_mode and mouse_id == "S0":
            raise ValueError("Mouse S0 does not have behaviour data.")
        self.mouse_dir = mouse_dir
        self.neuron_ids = metadata["neuron_ids"]
        self.coordinates = metadata["coordinates"]
        self.stats = metadata["stats"]

        indexes = np.where(metadata["tiers"] == tier)[0].astype(np.int32)
        if tier == "train" and getattr(config, "limit_data", None):
            if len(indexes) > config.limit_data:
                rng = np.random.default_rng(seed=config.seed)
                indexes = rng.choice(indexes, size=config.limit_data, replace=False)
        self.indexes = indexes
        self.image_ids = metadata["image_ids"][self.indexes]
        self.trial_ids = metadata["trial_ids"][self.indexes]
        self.compute_response_precision()

        # S0/S1 live/final test responses+trial ids are hashed
        # (reference data.py:319)
        self.hashed = self.ds_name == "sensorium" and mouse_id in ("S0", "S1")

        self.image_shape = get_image_shape(mouse_dir)
        self.gray_scale = False
        if config.gray_scale and self.ds_name == "franke2022":
            self.gray_scale = True
            self.image_shape = (1,) + tuple(self.image_shape[1:])

        packed_dir = pack_mouse_dir(mouse_dir, verbose=getattr(config, "verbose", 1))
        self._packed = {
            field: np.load(os.path.join(packed_dir, f"{field}.npy"), mmap_mode="r")
            for field in FIELDS
        }

    def __len__(self) -> int:
        return len(self.indexes)

    @property
    def image_stats(self):
        return self.stats["image"]

    @property
    def response_stats(self):
        return self.stats["response"]

    @property
    def behavior_stats(self):
        return self.stats["behavior"]

    @property
    def pupil_stats(self):
        return self.stats["pupil_center"]

    @property
    def num_neurons(self) -> int:
        return len(self.neuron_ids)

    def neuron_card(self) -> NeuronCard:
        return NeuronCard(
            mouse_id=self.mouse_id,
            num_neurons=self.num_neurons,
            coordinates=self.coordinates,
            response_mean=np.asarray(self.response_stats["mean"], np.float32),
            response_std=np.asarray(self.response_stats["std"], np.float32),
            neuron_ids=self.neuron_ids,
        )

    # --- transforms (reference data.py:354-410), vectorized over a leading
    # batch axis -------------------------------------------------------------

    def color2gray(self, image: np.ndarray) -> np.ndarray:
        axis = image.ndim - 3  # channel axis with or without batch dim
        return np.mean(image, axis=axis, keepdims=True)

    def transform_image(self, image: np.ndarray) -> np.ndarray:
        stats = self.image_stats
        image = (image - stats["mean"]) / stats["std"]
        if self.gray_scale:
            image = self.color2gray(image)
        return image

    def i_transform_image(self, image: np.ndarray) -> np.ndarray:
        if self.behavior_mode == 1:
            # strip the appended behavior channels
            image = image[..., :1, :, :]
        stats = self.image_stats
        return (image * stats["std"]) + stats["mean"]

    def transform_pupil_center(self, pupil_center: np.ndarray) -> np.ndarray:
        stats = self.pupil_stats
        return (pupil_center - stats["mean"]) / stats["std"]

    def i_transform_pupil_center(self, pupil_center: np.ndarray) -> np.ndarray:
        stats = self.pupil_stats
        return (pupil_center * stats["std"]) + stats["mean"]

    def transform_behavior(self, behavior: np.ndarray) -> np.ndarray:
        return behavior / self.behavior_stats["std"]

    def i_transform_behavior(self, behavior: np.ndarray) -> np.ndarray:
        return behavior * self.behavior_stats["std"]

    def compute_response_precision(self):
        """response * (1/std) with stds below 1% of the mean std clipped
        (reference data.py:394-404)."""
        std = self.response_stats["std"]
        threshold = 0.01 * np.mean(std)
        idx = std > threshold
        response_precision = np.ones_like(std) / threshold
        response_precision[idx] = 1 / std[idx]
        self._response_precision = response_precision.astype(np.float32)

    def transform_response(self, response: np.ndarray) -> np.ndarray:
        return response * self._response_precision

    def i_transform_response(self, response: np.ndarray) -> np.ndarray:
        return response / self._response_precision

    # --- batch serving -------------------------------------------------------

    def get_batch(
        self, positions: np.ndarray, image_dtype: t.Any = None
    ) -> t.Dict[str, np.ndarray]:
        """Assemble a transformed batch for dataset positions (not trial ids).

        ``image_dtype`` is the wire dtype for the image field (bf16 under
        bf16 compute, loaders.py _wire_image_dtype); None keeps float32.
        The hot chain (gather -> standardize -> gray reduce -> cast) runs
        through the native fastbatch kernels when available — bit-exact with
        the numpy path below (tests/test_fastbatch.py) — so the host keeps
        an 8-chip slice fed (BENCH_NOTES.md input-pipeline headroom).
        """
        trials = self.indexes[positions]
        batch = self._get_batch_native(trials, image_dtype)
        if batch is None:
            order = np.argsort(trials)  # memmap fancy-indexing wants sorted
            inverse = np.argsort(order)
            batch = {
                "image": np.asarray(
                    self._packed["images"][trials[order]], np.float32
                )[inverse],
                "response": np.asarray(
                    self._packed["responses"][trials[order]], np.float32
                )[inverse],
                "behavior": np.asarray(
                    self._packed["behavior"][trials[order]], np.float32
                )[inverse],
                "pupil_center": np.asarray(
                    self._packed["pupil_center"][trials[order]], np.float32
                )[inverse],
            }
            batch["image"] = self.transform_image(batch["image"]).astype(
                np.float32
            )
            if image_dtype is not None:
                batch["image"] = batch["image"].astype(image_dtype)
            batch["response"] = self.transform_response(batch["response"])
        batch["behavior"] = self.transform_behavior(batch["behavior"]).astype(
            np.float32
        )
        batch["pupil_center"] = self.transform_pupil_center(
            batch["pupil_center"]
        ).astype(np.float32)
        batch["image_id"] = self.image_ids[positions]
        batch["trial_id"] = self.trial_ids[positions]
        return batch

    def _get_batch_native(
        self, trials: np.ndarray, image_dtype: t.Any
    ) -> t.Optional[t.Dict[str, np.ndarray]]:
        """Native gather+transform for the heavy fields; None -> numpy path.
        behavior/pupil_center stay numpy (tiny, per-mouse stats shapes vary)
        but ride the native row gather."""
        from v1t_tpu.data import fastbatch

        if fastbatch.lib() is None:
            return None
        out_bf16 = image_dtype is not None and np.dtype(image_dtype).name == (
            "bfloat16"
        )
        if image_dtype is not None and not out_bf16:
            return None  # unknown wire dtype: keep the validated numpy path
        # cheap fields first: if any of them disqualifies (non-float32 /
        # non-contiguous packed array), bail BEFORE spending the expensive
        # fused image gather — a permanently-disqualified small field would
        # otherwise discard the image work on every batch
        response = fastbatch.gather_scale(
            self._packed["responses"], trials, self._response_precision
        )
        behavior = fastbatch.gather_rows(self._packed["behavior"], trials)
        pupil = fastbatch.gather_rows(self._packed["pupil_center"], trials)
        if response is None or behavior is None or pupil is None:
            return None
        stats = self.image_stats
        image = fastbatch.gather_image(
            self._packed["images"], trials,
            np.asarray(stats["mean"]), np.asarray(stats["std"]),
            reduce_gray=bool(self.gray_scale), out_bf16=out_bf16,
        )
        if image is None:
            return None
        return {
            "image": image,
            "response": response,
            "behavior": behavior,
            "pupil_center": pupil,
        }

    def __getitem__(self, idx: int) -> t.Dict[str, np.ndarray]:
        batch = self.get_batch(np.array([idx]))
        return {
            k: (v[0] if isinstance(v, np.ndarray) else v) for k, v in batch.items()
        }


def load_mouse_data(ds_name: str, mouse_dir: str) -> t.Tuple[dict, dict]:
    """Load every trial of one mouse into RAM (reference data.py:234-251),
    via the packed cache."""
    _ensure_extracted(mouse_dir)
    packed_dir = pack_mouse_dir(mouse_dir, verbose=0)
    data = {
        "image": np.asarray(np.load(os.path.join(packed_dir, "images.npy"), mmap_mode="r")),
        "response": np.asarray(np.load(os.path.join(packed_dir, "responses.npy"), mmap_mode="r")),
        "behavior": np.asarray(np.load(os.path.join(packed_dir, "behavior.npy"), mmap_mode="r")),
        "pupil_center": np.asarray(np.load(os.path.join(packed_dir, "pupil_center.npy"), mmap_mode="r")),
    }
    return data, load_mouse_metadata(ds_name, mouse_dir=mouse_dir)


def load_mice_data(
    ds_name: str, mice_dir: str, mouse_ids: t.Optional[t.List[str]] = None
):
    """Per-mouse whole-scan arrays (reference data.py:254-272)."""
    mouse2path = get_mouse2path(ds_name)
    if mouse_ids is None:
        mouse_ids = list(mouse2path.keys())
    mice_data, mice_meta = {}, {}
    for mouse_id in mouse_ids:
        mice_data[mouse_id], mice_meta[mouse_id] = load_mouse_data(
            ds_name=ds_name, mouse_dir=os.path.join(mice_dir, mouse2path[mouse_id])
        )
    return mice_data, mice_meta
