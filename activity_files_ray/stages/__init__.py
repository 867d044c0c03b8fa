"""Normalize / edit / validate stages (reference transform semantics
re-expressed as Ray Data batch + group kernels)."""
