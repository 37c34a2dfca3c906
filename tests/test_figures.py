"""Result-analysis artifacts (reference `examples/*/results/*.py` parity)."""
import os

import numpy as np

from aux_ssm_tpu.experiments.figures import (
    sv_style_comparison, rare_event_heatmaps)


def test_sv_style_comparison(tmp_path):
    rng = np.random.default_rng(0)
    res = {"kalman-1": dict(ejsd=rng.uniform(0.1, 1, (50, 3)), sampling_time=2.0),
           "csmc": dict(ejsd=rng.uniform(0.1, 1, (50, 3)), sampling_time=5.0)}
    ejsd_df, eff_df = sv_style_comparison(res, 1000, str(tmp_path))
    assert (tmp_path / "sv_ejsd.png").exists()
    assert (tmp_path / "ESJD.csv").exists()
    assert len(ejsd_df) == 50
    # EJSD/time divides by per-iteration time: kalman is 2.5x faster here.
    np.testing.assert_allclose(eff_df["kalman-1"],
                               ejsd_df["kalman-1"] / (2.0 / 1000))


def test_rare_event_heatmaps(tmp_path):
    rng = np.random.default_rng(1)
    rows = [dict(rho=r, r2=s, err_mean_0=abs(rng.standard_normal()),
                 err_mean_T=0.1, err_std_0=0.0, err_std_T=0.0,
                 ess_0=100.0, ess_T=50.0, acc=0.5, time=1.0)
            for r in np.linspace(0, 0.9, 4) for s in np.logspace(-2, 0, 4)]
    df = rare_event_heatmaps(rows, str(tmp_path))
    assert (tmp_path / "rare_event_heatmaps.png").exists()
    assert len(df) == 16


def test_spatial_style_comparison(tmp_path):
    from aux_ssm_tpu.experiments.figures import spatial_style_comparison
    rng = np.random.default_rng(2)
    res = {"kalman-1": dict(ejsd=rng.uniform(0.1, 1, (40, 4)), sampling_time=2.0),
           "csmc-guided": dict(ejsd=rng.uniform(0.1, 1, (40, 4)), sampling_time=4.0)}
    ejsd_df, eff_df = spatial_style_comparison(res, 500, str(tmp_path))
    assert (tmp_path / "spatial_ejsd.png").exists()
    assert (tmp_path / "spatial_ESJD.csv").exists()
    assert not (tmp_path / "ESJD.csv").exists()   # renamed, not duplicated
    assert len(ejsd_df) == 40


def test_lorenz_freq_comparison(tmp_path):
    from aux_ssm_tpu.experiments.figures import lorenz_freq_comparison
    rng = np.random.default_rng(3)
    res = {f: dict(theta_samples=rng.standard_normal((200, 3)) + f,
                   ejsd=rng.uniform(0.1, 1, (32,)),
                   sampling_time=1.0 + f)
           for f in (1, 2)}
    df = lorenz_freq_comparison(res, str(tmp_path))
    assert (tmp_path / "lorenz_theta.png").exists()
    assert (tmp_path / "lorenz_theta.csv").exists()
    assert list(df["freq"]) == [1, 2]
    # Posterior means track the shifted synthetic samples.
    np.testing.assert_allclose(df["theta1_mean"], [1.0, 2.0], atol=0.2)
