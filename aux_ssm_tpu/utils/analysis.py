"""Post-run analysis: the reference's results_analysis computations as
library functions (EJSD/time efficiency, normalized moment errors, ESS
summaries — `examples/*/results/*.py` capability, SURVEY §2.3/§6).
"""
import numpy as np

from .ess import effective_sample_size, potential_scale_reduction


def ejsd_per_time(ejsd, sampling_time, n_samples):
    """The paper's headline efficiency statistic: EJSD divided by the
    wall-clock time per iteration (reference
    sv/results/results_analysis_cpu.py:62-100)."""
    time_per_iter = sampling_time / n_samples
    return np.asarray(ejsd) / time_per_iter


def moment_errors(sample_mean, sample_std, true_mean, true_std):
    """Normalized moment errors (reference rare_event/results/
    result_analysis.py:103-105): squared mean error in units of the true
    variance, and relative std error."""
    true_var = np.asarray(true_std) ** 2
    err_mean = (np.asarray(sample_mean) - np.asarray(true_mean)) ** 2 / true_var
    err_std = (np.asarray(sample_std) - np.asarray(true_std)) / np.asarray(true_std)
    return err_mean, err_std


def ess_summary(samples, coords=None, known_variance=None):
    """ESS at selected trajectory coordinates of a (n_samples, T, d) chain.

    `coords`: list of (t, dim) pairs; defaults to the quartile midpoints of
    the first dimension. Returns {coord: ess}.
    """
    s = np.asarray(samples)
    n, T = s.shape[0], s.shape[1]
    if coords is None:
        coords = [(T // 4, 0), (T // 2, 0), (3 * T // 4, 0)]
    return {
        (t, d): float(effective_sample_size(s[:, t, d], known_variance))
        for t, d in coords
    }


def rhat_summary(samples, coords=None, rank_normalized=True):
    """Split-R-hat at selected trajectory coordinates of a multi-chain
    (n_chains, n_samples, T, d) sample stack (the layout produced by
    `parallel.run_sharded_chains(..., collect_samples=True)`).

    `coords`: list of (t, dim) pairs; defaults to the quartile midpoints of
    the first dimension. Returns {coord: rhat}; healthy mixed chains give
    values < 1.01 (Vehtari et al. 2021).
    """
    s = np.asarray(samples)
    if s.ndim != 4:
        raise ValueError("rhat_summary expects (n_chains, n_samples, T, d); "
                         f"got shape {s.shape}. Single-chain runs cannot "
                         "compute a between-chain diagnostic.")
    T = s.shape[2]
    if coords is None:
        coords = [(T // 4, 0), (T // 2, 0), (3 * T // 4, 0)]
    return {
        (t, d): float(potential_scale_reduction(s[:, :, t, d],
                                                rank_normalized=rank_normalized))
        for t, d in coords
    }
