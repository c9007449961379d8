"""Cross-cutting utilities: optimizers, running stats, logging."""

from dhts.utils import checkpoint, cma_es, profiling, rms, validate

__all__ = ["checkpoint", "cma_es", "profiling", "rms", "validate"]
