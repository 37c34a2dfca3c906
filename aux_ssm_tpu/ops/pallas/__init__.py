"""Pallas TPU kernels for the hot recursions (SURVEY §2.1: the "native
equivalents" this framework needs are fused TPU kernels, not C++ ports)."""
