"""Runtime health validation for rollouts.

The reference aborts on bad states with Python asserts — CFL per Riemann
solve (``_macro_lane.py:139-146``), collisions (``_micro_lane.py:162``),
NaN gradients (``dmacro_lane.py:308``). Asserts cannot fire inside ``jit``,
so dhts returns the same signals as :class:`dhts.models.network.
StepDiagnostics` and this module turns them into host-side errors (or
warnings) after the fact — the checkify pattern.
"""

from __future__ import annotations

import numpy as np


class SimulationHealthError(RuntimeError):
    pass


def check_rollout(spec, diagnostics, delta_time, *, strict=True,
                  allow_collisions=False):
    """Validate accumulated StepDiagnostics from a scan (leading time axis).

    Raises :class:`SimulationHealthError` (strict) or returns a list of
    findings. Checks: CFL (``max_wave_speed * dt < cell_length`` per lane),
    collision count, NaN wave speeds.
    """
    findings = []
    ms = np.asarray(diagnostics.max_wave_speed)  # [T, L]
    if not np.all(np.isfinite(ms)):
        findings.append("non-finite wave speeds (NaN/Inf state)")
    cell_len = np.asarray(spec.cell_length)
    is_macro = np.asarray(spec.is_macro)
    viol = (ms * delta_time >= cell_len[None, :]) & is_macro[None, :]
    if viol.any():
        t, l = np.argwhere(viol)[0]
        findings.append(
            f"CFL violated at step {t} lane {l}: wave speed {ms[t, l]:.2f} "
            f"* dt {delta_time} >= cell {cell_len[l]:.2f} "
            f"(reference would assert, _macro_lane.py:145)")
    n_coll = int(np.sum(np.asarray(diagnostics.num_collisions)))
    if n_coll and not allow_collisions:
        findings.append(f"{n_coll} vehicle collision recoveries "
                        f"(reference warns and zeroes deltas)")
    if findings and strict:
        raise SimulationHealthError("; ".join(findings))
    return findings


def check_gradients(grads, *, strict=True):
    """NaN-gradient check (the reference's ``dmacro_lane.py:308`` assert)."""
    import jax

    findings = []
    for path, leaf in jax.tree_util.tree_leaves_with_path(grads):
        if not np.all(np.isfinite(np.asarray(leaf))):
            findings.append(f"non-finite gradient at {jax.tree_util.keystr(path)}")
    if findings and strict:
        raise SimulationHealthError("; ".join(findings))
    return findings
