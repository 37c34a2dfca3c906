"""Native (C++) components with pure-NumPy fallbacks."""

from .precision import make_precision_coo, make_precision_dense, have_native

__all__ = ["make_precision_coo", "make_precision_dense", "have_native"]
