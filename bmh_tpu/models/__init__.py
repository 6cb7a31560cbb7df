"""Codec pipelines: the NumPy oracle and the batched JAX/TPU block codec."""
