"""Compute primitives (L1/L2): math utilities, LGSSM inference, resampling,
linearisation. Everything here is a pure function, safe under jit/vmap/scan
and shardable with pjit/shard_map."""

from . import mvn
from .logspace import normalize, logsubexp, log1mexp
from .chol import safe_cholesky
from .lgssm import LGSSM, posterior_logpdf, prior_logpdf, log_likelihood
from .filtering import filtering
from .sampling import sampling

__all__ = [
    "mvn",
    "normalize",
    "logsubexp",
    "log1mexp",
    "safe_cholesky",
    "LGSSM",
    "posterior_logpdf",
    "prior_logpdf",
    "log_likelihood",
    "filtering",
    "sampling",
]
