from dhts.apps.inverse.problem import InverseProblem

__all__ = ["InverseProblem"]
