"""Fused Pallas TPU kernels for the RAISR hot path."""
