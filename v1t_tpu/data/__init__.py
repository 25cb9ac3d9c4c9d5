from v1t_tpu.data.cards import NeuronCard, DataCard
from v1t_tpu.data.datasets import (
    SENSORIUM,
    FRANKE2022,
    get_mouse2path,
    get_mouse_ids,
    MouseDataset,
    load_mouse_metadata,
    load_trial_data,
    load_mouse_data,
    load_mice_data,
)
from v1t_tpu.data.loaders import (
    CycleLoaders,
    micro_batching,
    get_training_ds,
    get_submission_ds,
)

__all__ = [
    "NeuronCard",
    "DataCard",
    "SENSORIUM",
    "FRANKE2022",
    "get_mouse2path",
    "get_mouse_ids",
    "MouseDataset",
    "load_mouse_metadata",
    "load_trial_data",
    "load_mouse_data",
    "load_mice_data",
    "CycleLoaders",
    "micro_batching",
    "get_training_ds",
    "get_submission_ds",
]
