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


def _split_halves(chains):
    """(m, n) -> (2m, n//2): split each chain into its first and last halves
    (the middle sample is dropped when n is odd)."""
    m, n = chains.shape
    h = n // 2
    return jnp.concatenate([chains[:, :h], chains[:, n - h:]], axis=0)


def _rhat_of(chains):
    """Basic potential scale reduction of (m, n) chains, m >= 2.

    All-constant chains (within-chain variance 0, e.g. a stuck
    zero-acceptance run) deliberately report +inf rather than NaN or a
    tie-order artifact."""
    m, n = chains.shape
    chain_means = jnp.mean(chains, axis=1)
    between = n * jnp.var(chain_means, ddof=1)
    within = jnp.mean(jnp.var(chains, axis=1, ddof=1))
    var_plus = within * (n - 1.0) / n + between / n
    return jnp.where(within > 0.0, jnp.sqrt(var_plus / jnp.where(within > 0.0, within, 1.0)),
                     jnp.inf)


def _rank_normalize(chains):
    """Map pooled values to normal quantiles of their fractional ranks
    (Vehtari et al. 2021 eq. 14: z = ndtri((r - 3/8) / (S + 1/4))).

    Ties get the *average* rank of their group (scipy.stats.rankdata
    'average' semantics) — MH chains are full of exact ties from rejections,
    and ordinal tie-breaking would order ranks systematically across the
    split halves, biasing R-hat. Ranks are accumulated in int32/float64-when-
    available so pooled draw counts beyond the f32 integer range (~2^24) stay
    distinct."""
    from jax.scipy.special import ndtri

    shape = chains.shape
    flat = chains.ravel()
    S = flat.shape[0]
    rank_dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32

    order = jnp.argsort(flat)
    sorted_vals = flat[order]
    # Tie groups over the sorted values: each group's average 1-based rank is
    # (first_pos + last_pos)/2 + 1 of its positions in sort order.
    new_group = jnp.concatenate([jnp.ones((1,), bool),
                                 sorted_vals[1:] != sorted_vals[:-1]])
    group_id = jnp.cumsum(new_group.astype(jnp.int32)) - 1
    pos = jnp.arange(S, dtype=jnp.int32)
    # first/last position of each group via min/max scatter.
    first = jnp.full((S,), S, jnp.int32).at[group_id].min(pos)
    last = jnp.zeros((S,), jnp.int32).at[group_id].max(pos)
    avg_rank = (first[group_id] + last[group_id]).astype(rank_dtype) / 2.0 + 1.0
    ranks = jnp.zeros((S,), rank_dtype).at[order].set(avg_rank)
    z = ndtri((ranks - 0.375) / (S + 0.25)).astype(chains.dtype)
    return z.reshape(shape)


def potential_scale_reduction(chains, rank_normalized=True):
    """Split-R-hat convergence diagnostic for multi-chain runs.

    The companion diagnostic to `effective_sample_size` for the chain-sharded
    drivers (`parallel/chains.run_sharded_chains` produces (n_chains,
    n_samples) sample stacks per coordinate): values near 1 indicate the
    chains have mixed into the same distribution; Vehtari et al. (2021)
    recommend requiring R-hat < 1.01. No reference counterpart (the
    reference computes ESS only, `examples/rare_event/ess.py`) — built
    because multi-chip chain parallelism makes between-chain agreement the
    first-line health check.

    Parameters
    ----------
    chains : Array (n_chains, n_samples)
        Scalar chains; each chain is split in half, so the statistic detects
        both between-chain disagreement and within-chain non-stationarity.
    rank_normalized : bool
        Apply the rank-normalized + folded variant (robust to heavy tails
        and infinite variance): report the max of split-R-hat on the
        rank-normalized values and on the rank-normalized folded values
        |x - median(x)|. False gives the classical split-R-hat.

    Returns
    -------
    rhat : scalar
    """
    chains = jnp.atleast_2d(jnp.asarray(chains))
    split = _split_halves(chains)
    if not rank_normalized:
        return _rhat_of(split)
    bulk = _rhat_of(_rank_normalize(split))
    folded = jnp.abs(split - jnp.median(split))
    tail = _rhat_of(_rank_normalize(folded))
    return jnp.maximum(bulk, tail)


def rhat_from_moments(chain_means, chain_vars, n):
    """Classical (non-split) R-hat per coordinate from per-chain online
    moments — for runs whose sample histories are too large to keep
    (e.g. a 100k-sample Lorenz Gibbs reproduction where only the in-scan
    `OnlineStats` moments survive).

    Parameters
    ----------
    chain_means, chain_vars : Array (n_chains, ...)
        Per-chain posterior mean and variance estimates per coordinate
        (`stats.mean_x`, `utils.stats.variance(stats)`).
    n : int
        Samples per chain.

    Returns
    -------
    rhat : Array (...) — per-coordinate potential scale reduction; +inf for
    coordinates with zero within-chain variance (stuck chains).
    """
    chain_means = jnp.asarray(chain_means)
    W = jnp.mean(jnp.asarray(chain_vars), axis=0)
    B = n * jnp.var(chain_means, axis=0, ddof=1)
    var_plus = W * (n - 1.0) / n + B / n
    return jnp.where(W > 0.0,
                     jnp.sqrt(var_plus / jnp.where(W > 0.0, W, 1.0)),
                     jnp.inf)
