"""Rare-event grid driver: one vmapped program over (rho, r2) cells x chains
(reference capability `examples/rare_event/experiment.py:76-77,189-196`,
without its per-cell recompiles)."""
import numpy as np
import pytest

from aux_ssm_tpu.experiments import rare_event as driver
from aux_ssm_tpu.experiments.cli import base_parser


def _args(style, **over):
    p = base_parser("t")
    p.add_argument("--T", type=int, default=2)
    p.add_argument("--y", type=float, default=3.0)
    p.add_argument("--grid-size", type=int, default=2)
    defaults = dict(n_chains=3, style=style, n_samples=1500, burnin=400,
                    verbose=False, n_particles=16)
    defaults.update(over)
    p.set_defaults(**defaults)
    return p.parse_args([])


@pytest.mark.parametrize("style", ["kalman-1", "csmc"])
def test_grid_driver_recovers_closed_form(style):
    rows, res = driver.run_grid(_args(style))
    assert len(rows) == 4
    # Pooled over 3 chains x 1500 samples; closed-form moments are exact.
    for r in rows:
        assert r["ess_T"] > 50
        assert r["err_mean_T"] < 25.0 / r["ess_T"], r
        assert abs(r["err_std_T"]) < 0.2, r
        # 3 chains from a shared converged init: split-R-hat must be healthy
        # (short autocorrelated chains, so allow a loose 1.2 bound).
        assert 0.95 < r["rhat_T"] < 1.2, r
    # The sweep ran as ONE program: a single shared sampling time.
    assert all(r["time"] == rows[0]["time"] for r in rows)


def test_grid_driver_adapts_per_cell():
    rows, res = driver.run_grid(_args("kalman-1"))
    deltas = np.asarray(res.delta)
    # Per-chain deltas must have differentiated across cells.
    assert deltas.shape[0] == 2 * 2 * 3
    assert np.unique(np.round(deltas, 6)).size > 1
    for r in rows:
        assert 0.3 < r["acc"] < 0.7, r


def test_grid_driver_meshed_chains():
    """--mesh-chains places the flat cell-chain batch on the chains mesh
    axis; results must still recover the closed form (8-dev CPU mesh)."""
    args = _args("kalman-1", n_chains=4, n_samples=1200)
    args.mesh_chains = 8
    rows, res = driver.run_grid(args)
    assert len(rows) == 4
    for r in rows:
        assert r["err_mean_T"] < 30.0 / max(r["ess_T"], 1.0), r
