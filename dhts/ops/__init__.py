"""Physics and math ops: the stateless compute kernels of dhts.

Everything in this package is a pure function on jnp arrays, written
branch-free (``jnp.where`` cascades instead of Python ``if``) so that the
whole simulation step can be traced once by XLA and mapped onto the TPU
vector unit for arbitrarily many lanes / cells / vehicles at once.
"""

from dhts.ops import arz, dmath, idm

__all__ = ["arz", "dmath", "idm"]
