"""Clause kernels: resample, concat, merge-update, aggregation helpers."""
