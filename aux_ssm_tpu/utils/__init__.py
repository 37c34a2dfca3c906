"""Observability & analysis utilities: ESS, online chain statistics,
checkpointing, timing."""

from .ess import effective_sample_size, potential_scale_reduction
from .stats import OnlineStats, init_stats, update_stats

__all__ = ["effective_sample_size", "potential_scale_reduction", "OnlineStats", "init_stats", "update_stats"]
