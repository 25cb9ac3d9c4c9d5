"""Losses/metrics parity vs the reference's numpy semantics (the numpy twins
in reference src/v1t/losses.py:61-75 are framework-free oracles)."""

import jax.numpy as jnp
import numpy as np
import pytest

from v1t_tpu import losses, metrics
from v1t_tpu.configs import Config


def _pair(seed, shape=(16, 50)):
    rng = np.random.default_rng(seed)
    y_true = rng.poisson(2.0, size=shape).astype(np.float32)
    y_pred = np.abs(rng.normal(2.0, 1.0, size=shape)).astype(np.float32) + 0.1
    return y_true, y_pred


def test_msse_hand_value():
    y_true = np.array([[1.0, 2.0], [3.0, 4.0]], np.float32)
    y_pred = np.array([[1.5, 2.0], [2.0, 6.0]], np.float32)
    # per-row sums: 0.25, 1+4=5 -> sum 5.25, mean 2.625
    assert float(losses.msse(jnp.asarray(y_true), jnp.asarray(y_pred))) == 5.25
    assert (
        float(losses.msse(jnp.asarray(y_true), jnp.asarray(y_pred), reduction="mean"))
        == 2.625
    )


def test_poisson_hand_value():
    y_true, y_pred = _pair(0)
    expect = np.sum(y_pred - y_true * np.log(y_pred + 1e-12))
    got = float(losses.poisson_loss(jnp.asarray(y_true), jnp.asarray(y_pred)))
    np.testing.assert_allclose(got, expect, rtol=1e-5)


def test_correlation_np_jax_twins_agree():
    y1, y2 = _pair(1)
    c_np = losses.correlation(y1, y2, dim=0)
    c_j = np.asarray(losses.correlation(jnp.asarray(y1), jnp.asarray(y2), dim=0))
    np.testing.assert_allclose(c_j, c_np, rtol=1e-5, atol=1e-6)
    # cross-check against np.corrcoef per column
    for n in range(5):
        expect = np.corrcoef(y1[:, n], y2[:, n])[0, 1]
        np.testing.assert_allclose(c_np[n], expect, rtol=1e-4)


def test_ds_scale():
    """loss * sqrt(ds_size / batch_size) (reference losses.py:114-119)."""
    cfg = Config(ds_scale=1, criterion="poisson")
    crit = losses.get_criterion(cfg, ds_sizes={"A": 1000})
    y_true, y_pred = _pair(2, shape=(10, 20))
    got = float(crit(jnp.asarray(y_true), jnp.asarray(y_pred), mouse_id="A"))
    eps = losses.EPS
    base = np.sum((y_pred + eps) - (y_true + eps) * np.log(y_pred + eps))
    np.testing.assert_allclose(got, np.sqrt(1000 / 10) * base, rtol=1e-5)

    cfg0 = Config(ds_scale=0, criterion="poisson")
    crit0 = losses.get_criterion(cfg0, ds_sizes={"A": 1000})
    got0 = float(crit0(jnp.asarray(y_true), jnp.asarray(y_pred), mouse_id="A"))
    np.testing.assert_allclose(got0, base, rtol=1e-5)


def _repeat_results(seed=3, num_images=8, num_repeats=5, num_neurons=30):
    """Synthetic repeated-image results for the challenge metrics."""
    rng = np.random.default_rng(seed)
    signal = rng.gamma(2.0, 1.0, size=(num_images, num_neurons))
    image_ids = np.repeat(np.arange(num_images), num_repeats)
    targets = signal[image_ids] + rng.normal(0, 0.5, (len(image_ids), num_neurons))
    predictions = signal[image_ids] + rng.normal(0, 0.7, (len(image_ids), num_neurons))
    trial_ids = rng.permutation(len(image_ids))
    neuron_ids = rng.permutation(num_neurons).astype(np.int32)
    return {
        "targets": targets[trial_ids].astype(np.float32),
        "predictions": predictions[trial_ids].astype(np.float32),
        "image_ids": image_ids[trial_ids],
        "trial_ids": trial_ids,
    }, neuron_ids


def test_metrics_single_trial_correlation_is_order_invariant():
    results, neuron_ids = _repeat_results()
    m = metrics.Metrics(results, neuron_ids=neuron_ids, tier="test")
    corr = m.single_trial_correlation()
    assert 0.3 < corr < 1.0
    per_neuron = m.single_trial_correlation(per_neuron=True)
    assert per_neuron.shape == (30,)
    np.testing.assert_allclose(per_neuron.mean(), corr)


def test_metrics_repeat_based():
    results, neuron_ids = _repeat_results()
    m = metrics.Metrics(results, neuron_ids=neuron_ids, tier="test")
    cta = m.correlation_to_average()
    feve = m.feve()
    ncc = m.normalized_correlation()
    assert cta is not None and 0.0 < cta <= 1.0
    assert feve is not None and feve <= 1.0
    assert ncc is not None
    # correlation-to-average should beat single-trial correlation (noise avgs out)
    assert cta > m.single_trial_correlation()


def test_metrics_hashed_skips_repeat_metrics():
    results, neuron_ids = _repeat_results()
    results["trial_ids"] = np.array([f"hash{i}" for i in range(len(results["image_ids"]))])
    m = metrics.Metrics(results, neuron_ids=neuron_ids, tier="test", hashed=True)
    assert m.correlation_to_average() is None
    assert m.feve() is None
    assert m.normalized_correlation() is None
    assert m.single_trial_correlation() is not None


def test_metrics_validation_tier_has_no_repeats():
    results, neuron_ids = _repeat_results()
    m = metrics.Metrics(results, neuron_ids=neuron_ids, tier="validation")
    assert m.correlation_to_average() is None
    assert m.feve() is None


def test_feve_perfect_prediction_upper_bound():
    """With predictions == per-image means, FEVE ≈ 1."""
    rng = np.random.default_rng(7)
    num_images, num_repeats, n = 10, 8, 20
    signal = rng.gamma(2.0, 1.0, size=(num_images, n))
    image_ids = np.repeat(np.arange(num_images), num_repeats)
    targets = signal[image_ids] + rng.normal(0, 0.3, (len(image_ids), n))
    # prediction = true per-image mean of the targets
    preds = np.vstack(
        [targets[image_ids == i].mean(0, keepdims=True) for i in range(num_images)]
    )[image_ids]
    results = {
        "targets": targets.astype(np.float32),
        "predictions": preds.astype(np.float32),
        "image_ids": image_ids,
        "trial_ids": np.arange(len(image_ids)),
    }
    m = metrics.Metrics(results, neuron_ids=np.arange(n), tier="test")
    assert m.feve() > 0.9
