"""Effective sample size via FFT autocovariance and Geyer's initial monotone
sequence criterion.

Capability parity with the reference's BlackJAX-derived estimator
(`examples/rare_event/ess.py:28-160`), including the known-variance mode used
by the rare-event study — independent implementation following Geyer (1992)
and the Stan reference manual.
"""
import jax
import jax.numpy as jnp


def _autocovariance_fft(x):
    """Biased autocovariance of a 1-D chain via FFT, all lags."""
    n = x.shape[0]
    x = x - jnp.mean(x)
    size = 2 * n  # zero padding to avoid circular wrap-around
    f = jnp.fft.rfft(x, size)
    acov = jnp.fft.irfft(f * jnp.conj(f), size)[:n].real
    return acov / n


def effective_sample_size(chains, known_variance=None):
    """ESS of MCMC chains.

    Parameters
    ----------
    chains : Array (n_samples,) or (n_chains, n_samples)
        Scalar chain(s). Multi-chain input pools autocovariances Stan-style.
    known_variance : float, optional
        If given, autocorrelations are normalised by this true variance
        instead of the empirical one (reference `ess.py` known-variance mode)
        — useful when the target variance is available in closed form.

    Returns
    -------
    ess : scalar
    """
    chains = jnp.atleast_2d(jnp.asarray(chains))
    m, n = chains.shape

    acov = jax.vmap(_autocovariance_fft)(chains)  # (m, n)
    mean_acov = jnp.mean(acov, axis=0)

    if known_variance is None:
        chain_means = jnp.mean(chains, axis=1)
        within = jnp.mean(acov[:, 0]) * n / (n - 1.0)
        if m > 1:
            between = n * jnp.var(chain_means, ddof=1)
            var_plus = within * (n - 1.0) / n + between / n
        else:
            var_plus = within * (n - 1.0) / n + jnp.mean(acov[:, 0]) / n
    else:
        var_plus = jnp.asarray(known_variance, dtype=chains.dtype)

    rho = 1.0 - (jnp.mean(acov[:, 0]) - mean_acov) / var_plus
    rho = rho.at[0].set(1.0)

    # Geyer pairs: P_k = rho_{2k} + rho_{2k+1}; truncate at first negative
    # pair, then enforce monotone non-increase.
    n_pairs = n // 2
    pairs = rho[0:2 * n_pairs:2] + rho[1:2 * n_pairs:2]

    positive = pairs > 0
    first_neg = jnp.argmin(positive)  # index of first False (0 if none False)
    all_pos = jnp.all(positive)
    cutoff = jnp.where(all_pos, n_pairs, first_neg)

    masked = jnp.where(jnp.arange(n_pairs) < cutoff, pairs, 0.0)
    monotone = jax.lax.associative_scan(jnp.minimum, masked)
    tau = -1.0 + 2.0 * jnp.sum(monotone)
    tau = jnp.maximum(tau, 1.0 / jnp.log10(jnp.asarray(float(m * n))))

    return m * n / tau
