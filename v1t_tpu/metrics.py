"""Sensorium challenge metrics, numpy semantics identical to the reference
(src/v1t/metrics.py, itself ported from sinzlab/sensorium).

Computed on the host after inference (metrics are cheap; the device does the
forward pass). All definitions must match the reference verbatim — they define
the parity target (~0.29 single-trial correlation on Sensorium+).
"""

from __future__ import annotations

import typing as t

import numpy as np
from scipy.stats import pearsonr

from v1t_tpu import losses


class Metrics:
    """Performance metrics of neural response predictions.

    Args:
        results: dict with numpy arrays "targets" (T, N), "predictions" (T, N),
            "image_ids" (T,), "trial_ids" (T,) — trial_ids may be an array of
            hashed strings for the S0/S1 live/final test sets.
        neuron_ids: (N,) neuron ids from the data card.
        tier: the dataset tier the results came from.
        hashed: True when trial ids are hashed (S0/S1), disabling re-ordering
            and repeat-based metrics (reference metrics.py:19-43).
    """

    def __init__(
        self,
        results: t.Dict[str, np.ndarray],
        neuron_ids: np.ndarray,
        tier: str,
        hashed: bool = False,
    ):
        self.repeat_image = tier == "test"
        self.hashed = hashed
        self.targets = np.asarray(results["targets"])
        self.predictions = np.asarray(results["predictions"])
        self.image_ids = np.asarray(results["image_ids"])
        self.neuron_ids = np.array(neuron_ids, copy=True)
        self.trial_ids = results["trial_ids"]
        if not self.hashed:
            self.trial_ids = np.asarray(self.trial_ids)
            self.order()

    def order(self):
        """Re-order responses by trial IDs and neuron IDs (metrics.py:34-43)."""
        trial_ids = np.argsort(self.trial_ids)
        neuron_ids = np.argsort(self.neuron_ids)
        self.targets = self.targets[trial_ids, :][:, neuron_ids]
        self.predictions = self.predictions[trial_ids, :][:, neuron_ids]
        self.image_ids = self.image_ids[trial_ids]
        self.neuron_ids = self.neuron_ids[neuron_ids]
        self.trial_ids = trial_ids

    def split_responses(self):
        """Group responses by image id — repeats of the same stimulus
        (metrics.py:45-63)."""
        repeat_targets, repeat_predictions = [], []
        for image_id in np.unique(self.image_ids):
            indexes = self.image_ids == image_id
            repeat_targets.append(self.targets[indexes])
            repeat_predictions.append(self.predictions[indexes])
        return repeat_targets, repeat_predictions

    def single_trial_correlation(self, per_neuron: bool = False):
        corr = losses.correlation(y1=self.predictions, y2=self.targets, dim=0)
        return corr if per_neuron else corr.mean()

    def correlation_to_average(self, per_neuron: bool = False):
        """Correlation between repeat-averaged responses and predictions
        (metrics.py:74-89)."""
        if not self.repeat_image or self.hashed:
            return None
        mean_responses, mean_predictions = [], []
        for repeat_responses, repeat_predictions in zip(*self.split_responses()):
            mean_responses.append(repeat_responses.mean(axis=0, keepdims=True))
            mean_predictions.append(repeat_predictions.mean(axis=0, keepdims=True))
        mean_responses = np.vstack(mean_responses)
        mean_predictions = np.vstack(mean_predictions)
        corr = losses.correlation(y1=mean_responses, y2=mean_predictions, dim=0)
        return corr if per_neuron else corr.mean()

    def _fev(self, targets, predictions, return_exp_var: bool = False):
        """Fraction of explainable variance (explained) per neuron
        (metrics.py:91-124)."""
        img_var, pred_var = [], []
        for target, prediction in zip(targets, predictions):
            pred_var.append((target - prediction) ** 2)
            img_var.append(np.var(target, axis=0, ddof=1))
        pred_var = np.vstack(pred_var)
        img_var = np.vstack(img_var)

        total_var = np.var(np.vstack(targets), axis=0, ddof=1)
        noise_var = np.mean(img_var, axis=0)
        fev = (total_var - noise_var) / total_var

        pred_var = np.mean(pred_var, axis=0)
        fev_e = 1 - (pred_var - noise_var) / (total_var - noise_var)
        return [fev, fev_e] if return_exp_var else fev_e

    def feve(self, per_neuron: bool = False, fev_threshold: float = 0.15):
        """FEVE with neurons below the FEV threshold dropped
        (metrics.py:126-142)."""
        if not self.repeat_image or self.hashed:
            return None
        repeat_targets, repeat_predictions = self.split_responses()
        fev_val, feve_val = self._fev(
            targets=repeat_targets,
            predictions=repeat_predictions,
            return_exp_var=True,
        )
        feve_val = feve_val[fev_val >= fev_threshold]
        return feve_val if per_neuron else feve_val.mean()

    def normalized_correlation(self):
        """CC_abs / CC_max over repeats (metrics.py:144-166)."""
        if not self.repeat_image or self.hashed:
            return None
        cc_norm = []
        for repeated_response, repeated_prediction in zip(*self.split_responses()):
            mean_response = np.mean(repeated_response, axis=0)
            mean_prediction = np.mean(repeated_prediction, axis=0)
            cc_abs, _ = pearsonr(mean_response, mean_prediction)
            n = len(repeated_response)
            cc_max = np.sqrt(
                (
                    n * np.var(mean_response, ddof=1)
                    - np.mean(np.var(repeated_response, axis=0, ddof=1))
                )
                / ((n - 1) * np.var(mean_response, ddof=1))
            )
            cc_norm.append(cc_abs / cc_max)
        return np.mean(cc_norm)
