"""Cross-framework convergence A/B (VERDICT r3 #2): train the ACTUAL
torch reference and this framework end to end on the same on-disk fixture,
from the same initialization, across a plateau rollback, and require the
trajectories and final challenge metrics to agree.

Unlike the leaf-for-leaf step-parity tests this exercises the FULL
training loops of both frameworks — their own data pipelines (shuffling,
standardization), epoch functions, criteria with ds_scale, plateau
schedulers writing/restoring their own checkpoints — so it covers the
composition: 20+ epochs of real training dynamics, not 3 optimizer steps.

The full-size harness (60 epochs, multiple reference seeds) lives in
misc/convergence_ab.py; its committed results are in PARITY.md. This test
runs a shortened version sized for CI.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if os.path.join(_REPO, "misc") not in sys.path:
    sys.path.insert(0, os.path.join(_REPO, "misc"))


@pytest.mark.slow
def test_convergence_ab_short(tmp_path):
    from convergence_ab import ab_config, make_fixture

    from v1t_tpu.utils import reference_bridge as rb
    from v1t_tpu.utils.torch_transplant import convert_state_dict

    fixture = make_fixture(
        str(tmp_path / "data"), num_train=96, num_validation=48,
        num_neurons=64,
    )
    epochs, lr_patience = 40, 2
    cfg = ab_config(seed=11)
    ref = rb.run_reference_training(
        cfg, fixture, str(tmp_path / "ref"), mouse_ids=("A", "B"),
        epochs=epochs, lr_patience=lr_patience, capture_init=True,
    )
    init_sd = ref.pop("init_state_dict")

    cfg = ab_config(seed=11)
    cfg.mouse_ids = ["A", "B"]
    init_params = convert_state_dict(init_sd, cfg)
    jx = rb.run_jax_training(
        cfg, fixture, str(tmp_path / "jax"), mouse_ids=("A", "B"),
        epochs=epochs, lr_patience=lr_patience, init_params=init_params,
    )

    # Both sides learned real structure on the fixture: validation
    # correlation rises well above the untrained level.
    assert max(ref["val_corr"]) > 0.2, ref["val_corr"]
    assert max(jx["val_corr"]) > 0.2, jx["val_corr"]

    # Identical init + identical schedule: the epoch-level trajectories
    # track. Data order and dropout RNG differ by design (each framework's
    # own pipeline), so this is a band, not equality. Round-5 measured
    # values on the full-size fixture (misc/results/convergence_ab_r05.json,
    # n=3 seeds per side): best-val seed spread ~0.011 per side, matched-init
    # cross-framework gap 0.0057, trajectory r 0.9962. The CI fixture is
    # ~3x smaller (noisier), so the bands below are ~3x the measured
    # full-size values rather than equality thresholds.
    assert abs(ref["best_value"] - jx["best_value"]) < 0.04, (
        ref["best_value"], jx["best_value"],
    )
    n = min(len(ref["val_corr"]), len(jx["val_corr"]))
    r = np.corrcoef(ref["val_corr"][:n], jx["val_corr"][:n])[0, 1]
    assert r > 0.85, (r, ref["val_corr"], jx["val_corr"])

    # The run crossed the scheduler path on the reference side (plateau ->
    # rollback + LR decay); the jax side's scheduler is exercised against
    # its own plateau timing.
    assert ref["reduce_epochs"], ref
    assert jx["reduce_epochs"], jx

    # Final challenge metrics (test tier, repeats: corr-to-average + FEVE
    # computed by each framework's own Metrics) agree within the band.
    # Full-size measured test-corr: matched gap 0.010, per-side seed
    # spread ~0.006 (ref) / 0.017 (jax); 0.04 = ~2x the worst spread on
    # the noisier CI fixture.
    t_eval, j_eval = ref["eval"], jx["eval"]
    assert abs(
        t_eval["single_trial_correlation"]
        - j_eval["single_trial_correlation"]
    ) < 0.04, (t_eval, j_eval)
