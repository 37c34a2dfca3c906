"""Experiment drivers: a single generic MCMC loop with step-size adaptation,
online statistics, timing, and checkpoint hooks (replaces the reference's
per-script argparse loops, `examples/*/experiment.py`)."""

from .runner import run_chain, RunConfig, RunResult

__all__ = ["run_chain", "RunConfig", "RunResult"]
