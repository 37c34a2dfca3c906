"""Config system and checkpoint/resume round-trip."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aux_ssm_tpu.config import ExperimentConfig, from_args
from aux_ssm_tpu.utils.checkpoint import save_checkpoint, restore_checkpoint, latest_step


def test_from_args_nested_overrides():
    cfg = from_args(**{
        "run.n_samples": 123,
        "sampler.style": "csmc",
        "sampler.n_particles": 64,
        "backend.precision": "double",
        "seed": 7,
    })
    assert cfg.run.n_samples == 123
    assert cfg.sampler.style == "csmc"
    assert cfg.sampler.n_particles == 64
    assert cfg.backend.precision == "double"
    assert cfg.seed == 7
    # untouched defaults preserved, original default config unchanged
    assert cfg.run.burnin == ExperimentConfig().run.burnin


def test_from_args_casts_types():
    cfg = from_args(**{"run.target_alpha": 1, "run.n_samples": 10.0})
    assert isinstance(cfg.run.target_alpha, float)
    assert isinstance(cfg.run.n_samples, int)


def test_configs_frozen():
    cfg = ExperimentConfig()
    with pytest.raises(dataclasses.FrozenInstanceError):
        cfg.seed = 1


def test_checkpoint_roundtrip(tmp_path):
    from aux_ssm_tpu.kernels.kalman import KalmanSampler
    from aux_ssm_tpu.utils.stats import init_stats

    state = {
        "sampler": KalmanSampler(x=jnp.arange(12.0).reshape(3, 4),
                                 updated=jnp.asarray(True)),
        "delta": jnp.asarray(0.123),
        "stats": init_stats(jnp.zeros((3, 4))),
    }
    d = str(tmp_path / "ckpt")
    save_checkpoint(d, 10, state)
    save_checkpoint(d, 20, state)
    assert latest_step(d) == 20

    step, restored = restore_checkpoint(d, target=jax.tree.map(np.asarray, state))
    assert step == 20
    np.testing.assert_array_equal(restored["sampler"].x, np.arange(12.0).reshape(3, 4))
    np.testing.assert_allclose(restored["delta"], 0.123)


def test_restore_missing_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        restore_checkpoint(str(tmp_path / "nope"))
