"""Immutable "data cards" — the typed replacement for the reference's
args-blackboard mutation (reference src/v1t/data.py:487-489 sets
args.output_shapes/args.input_shape; model/readout construction then reads
dataset statistics through DataLoader handles, e.g. gaussian2d.py:186).

A ``NeuronCard`` carries everything model construction needs to know about
one mouse; a ``DataCard`` aggregates the whole run. Both are plain host-side
numpy — they parameterize module construction and never enter jit.
"""

from __future__ import annotations

import dataclasses
import typing as t

import numpy as np


@dataclasses.dataclass(frozen=True)
class NeuronCard:
    """Per-mouse facts the model needs (neuron count, anatomical coordinates
    for the grid predictor, response statistics for bias init)."""

    mouse_id: str
    num_neurons: int
    coordinates: np.ndarray  # (N, 3) anatomical (x, y, z)
    response_mean: np.ndarray  # (N,)
    response_std: np.ndarray  # (N,)
    neuron_ids: t.Optional[np.ndarray] = None  # (N,)

    def __post_init__(self):
        assert self.coordinates.shape[0] == self.num_neurons


@dataclasses.dataclass(frozen=True)
class DataCard:
    """Run-level facts derived from the dataset."""

    ds_name: str  # "sensorium" | "franke2022"
    input_shape: t.Tuple[int, int, int]  # raw image shape (C, H, W)
    mouse_ids: t.Tuple[str, ...]
    neuron_cards: t.Dict[str, NeuronCard]
    ds_sizes: t.Dict[str, int]  # mouse_id -> len(train set)

    @property
    def output_shapes(self) -> t.Dict[str, t.Tuple[int]]:
        return {m: (c.num_neurons,) for m, c in self.neuron_cards.items()}


def synthetic_data_card(
    mouse_ids: t.Sequence[str] = ("A", "B"),
    num_neurons: t.Union[int, t.Sequence[int]] = 100,
    input_shape: t.Tuple[int, int, int] = (1, 36, 64),
    ds_name: str = "sensorium",
    ds_size: int = 256,
    seed: int = 0,
) -> DataCard:
    """A small synthetic DataCard for tests and dry runs."""
    rng = np.random.default_rng(seed)
    if isinstance(num_neurons, int):
        num_neurons = [num_neurons] * len(mouse_ids)
    cards = {}
    for mouse_id, n in zip(mouse_ids, num_neurons):
        cards[mouse_id] = NeuronCard(
            mouse_id=mouse_id,
            num_neurons=n,
            coordinates=rng.normal(size=(n, 3)).astype(np.float32) * 100,
            response_mean=rng.gamma(2.0, 1.0, size=n).astype(np.float32),
            response_std=rng.gamma(2.0, 1.0, size=n).astype(np.float32) + 0.1,
            neuron_ids=np.arange(n, dtype=np.int32),
        )
    return DataCard(
        ds_name=ds_name,
        input_shape=tuple(input_shape),
        mouse_ids=tuple(mouse_ids),
        neuron_cards=cards,
        ds_sizes={m: ds_size for m in mouse_ids},
    )
