"""Cross-cutting utilities: optimizers, running stats, logging."""

from dhts.utils import cma_es, rms

__all__ = ["cma_es", "rms"]
