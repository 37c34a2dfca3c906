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


def _toy_kernel_and_state():
    """Random-walk MH on N(0, 1) — cheap, accept/reject so adaptation runs."""
    import chex
    from aux_ssm_tpu.kernels.base import SamplerState

    @chex.dataclass
    class S(SamplerState):
        updated: chex.Array

    def kernel(key, state, delta):
        k1, k2 = jax.random.split(key)
        prop = state.x + jnp.sqrt(delta) * jax.random.normal(k1, state.x.shape)
        log_a = 0.5 * jnp.sum(state.x ** 2 - prop ** 2)
        acc = jnp.log(jax.random.uniform(k2)) < log_a
        return S(x=jnp.where(acc, prop, state.x), updated=acc)

    return kernel, S(x=jnp.zeros((4,)), updated=jnp.asarray(False))


def test_run_chain_segmented_matches_monolithic(tmp_path):
    """checkpoint_every segmentation must not change the chain at all."""
    from aux_ssm_tpu.experiments.runner import RunConfig, run_chain

    kernel, state = _toy_kernel_and_state()
    cfg = RunConfig(n_samples=40, burnin=17, delta_init=0.5, verbose=False)
    key = jax.random.key(0)

    mono = run_chain(key, kernel, state, cfg, collect_samples=True)
    seg = run_chain(key, kernel, state, cfg, collect_samples=True,
                    checkpoint_dir=str(tmp_path / "ck"), checkpoint_every=7)

    np.testing.assert_array_equal(np.asarray(mono.samples), np.asarray(seg.samples))
    np.testing.assert_array_equal(np.asarray(mono.state.x), np.asarray(seg.state.x))
    np.testing.assert_allclose(np.asarray(mono.delta), np.asarray(seg.delta))


def test_run_chain_kill_resume_bitwise(tmp_path):
    """A run killed mid-burnin and mid-sampling must resume bitwise."""
    from aux_ssm_tpu.experiments.runner import RunConfig, run_chain
    from aux_ssm_tpu.utils.checkpoint import latest_step

    kernel, state = _toy_kernel_and_state()
    cfg = RunConfig(n_samples=30, burnin=20, delta_init=0.5, verbose=False)
    key = jax.random.key(1)
    full = run_chain(key, kernel, state, cfg, collect_samples=True)

    d = str(tmp_path / "ck2")

    # "Kill" after the first burn-in segment: run with a monkeypatched _save
    # that raises after 1 checkpoint, then resume from what was persisted.
    import aux_ssm_tpu.experiments.runner as runner_mod

    class Killed(RuntimeError):
        pass

    orig_save = runner_mod._save
    calls = {"n": 0}

    def dying_save(directory, payload, step):
        orig_save(directory, payload, step)
        calls["n"] += 1
        if calls["n"] >= 2:
            raise Killed()

    runner_mod._save = dying_save
    try:
        with pytest.raises(Killed):
            run_chain(key, kernel, state, cfg, collect_samples=True,
                      checkpoint_dir=d, checkpoint_every=8)
    finally:
        runner_mod._save = orig_save
    assert latest_step(d) is not None

    resumed = run_chain(key, kernel, state, cfg, collect_samples=True,
                        checkpoint_dir=d, checkpoint_every=8)
    np.testing.assert_array_equal(np.asarray(full.samples),
                                  np.asarray(resumed.samples))
    np.testing.assert_array_equal(np.asarray(full.state.x),
                                  np.asarray(resumed.state.x))
    np.testing.assert_allclose(np.asarray(full.delta), np.asarray(resumed.delta))


def _toy_chain_states(n_chains):
    kernel, s = _toy_kernel_and_state()
    states = jax.tree.map(
        lambda z: jnp.broadcast_to(z, (n_chains,) + jnp.shape(z)), s)
    return kernel, states


def test_run_sharded_chains_segmented_matches_monolithic(tmp_path):
    """Segmentation must not change the sharded chains at all (bitwise)."""
    from aux_ssm_tpu.experiments.runner import RunConfig
    from aux_ssm_tpu.parallel.chains import run_sharded_chains
    from aux_ssm_tpu.parallel.mesh import make_mesh, CHAINS

    kernel, states = _toy_chain_states(4)
    cfg = RunConfig(n_samples=30, burnin=13, delta_init=0.5, verbose=False)
    key = jax.random.key(3)
    mesh = make_mesh(devices=jax.devices()[:4], axis_names=(CHAINS,))

    res_m = run_sharded_chains(
        key, kernel, states, cfg, mesh=mesh, collect_samples=True)
    res_s = run_sharded_chains(
        key, kernel, states, cfg, mesh=mesh, collect_samples=True,
        checkpoint_dir=str(tmp_path / "ckA"), checkpoint_every=7)
    st_m, stats_m, d_m, smp_m = res_m.state, res_m.stats, res_m.delta, res_m.samples
    st_s, stats_s, d_s, smp_s = res_s.state, res_s.stats, res_s.delta, res_s.samples

    assert smp_m.shape == (4, cfg.n_samples, 4)
    np.testing.assert_array_equal(np.asarray(smp_m), np.asarray(smp_s))
    np.testing.assert_array_equal(np.asarray(st_m.x), np.asarray(st_s.x))
    np.testing.assert_allclose(np.asarray(d_m), np.asarray(d_s))
    np.testing.assert_allclose(np.asarray(stats_m.ejsd), np.asarray(stats_s.ejsd))


def test_run_sharded_chains_kill_resume_bitwise(tmp_path):
    """Sharded runner killed mid-sampling must resume bitwise-identically."""
    from aux_ssm_tpu.experiments.runner import RunConfig
    from aux_ssm_tpu.parallel.chains import run_sharded_chains
    from aux_ssm_tpu.parallel.mesh import make_mesh, CHAINS
    import aux_ssm_tpu.parallel.chains as chains_mod

    kernel, states = _toy_chain_states(4)
    cfg = RunConfig(n_samples=24, burnin=10, delta_init=0.5, verbose=False)
    key = jax.random.key(4)
    mesh = make_mesh(devices=jax.devices()[:4], axis_names=(CHAINS,))

    full = run_sharded_chains(key, kernel, states, cfg, mesh=mesh,
                              collect_samples=True)

    d = str(tmp_path / "ckB")

    class Killed(RuntimeError):
        pass

    orig_save = chains_mod._save
    calls = {"n": 0}

    def dying_save(directory, payload, step):
        orig_save(directory, payload, step)
        calls["n"] += 1
        if calls["n"] >= 3:  # 2 burn-in segments + 1 sampling segment
            raise Killed()

    chains_mod._save = dying_save
    try:
        with pytest.raises(Killed):
            run_sharded_chains(key, kernel, states, cfg, mesh=mesh,
                               collect_samples=True, checkpoint_dir=d,
                               checkpoint_every=8)
    finally:
        chains_mod._save = orig_save

    resumed = run_sharded_chains(key, kernel, states, cfg, mesh=mesh,
                                 collect_samples=True, checkpoint_dir=d,
                                 checkpoint_every=8)
    np.testing.assert_array_equal(np.asarray(full.samples),
                                  np.asarray(resumed.samples))
    np.testing.assert_array_equal(np.asarray(full.state.x),
                                  np.asarray(resumed.state.x))
    np.testing.assert_allclose(np.asarray(full.delta),
                               np.asarray(resumed.delta))


def test_run_chain_kill_resume_mid_sampling(tmp_path):
    """Kill during the sampling phase; collected samples must be complete."""
    from aux_ssm_tpu.experiments.runner import RunConfig, run_chain

    kernel, state = _toy_kernel_and_state()
    cfg = RunConfig(n_samples=24, burnin=5, delta_init=0.5, verbose=False)
    key = jax.random.key(2)
    full = run_chain(key, kernel, state, cfg, collect_samples=True)

    d = str(tmp_path / "ck3")
    import aux_ssm_tpu.experiments.runner as runner_mod

    class Killed(RuntimeError):
        pass

    orig_save = runner_mod._save
    calls = {"n": 0}

    def dying_save(directory, payload, step):
        orig_save(directory, payload, step)
        calls["n"] += 1
        if calls["n"] >= 3:  # burnin ckpt + 2 sampling segments
            raise Killed()

    runner_mod._save = dying_save
    try:
        with pytest.raises(Killed):
            run_chain(key, kernel, state, cfg, collect_samples=True,
                      checkpoint_dir=d, checkpoint_every=8)
    finally:
        runner_mod._save = orig_save

    resumed = run_chain(key, kernel, state, cfg, collect_samples=True,
                        checkpoint_dir=d, checkpoint_every=8)
    assert resumed.samples.shape[0] == cfg.n_samples
    np.testing.assert_array_equal(np.asarray(full.samples),
                                  np.asarray(resumed.samples))
