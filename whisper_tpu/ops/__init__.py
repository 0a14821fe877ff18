"""Accelerated ops: attention, DTW, median filter, mel front-end.

Every op has an XLA reference implementation and (where profitable) a Pallas
TPU kernel; kernel selection is automatic with explicit overrides for tests.
"""
