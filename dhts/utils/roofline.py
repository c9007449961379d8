"""Roofline / MFU accounting for the fused episode kernels.

The reference publishes no throughput numbers at all (SURVEY §6), so
"fast" needs an absolute yardstick: this module converts a measured
steps/sec into silicon-utilization figures against the chip's peak
FLOP rate and HBM bandwidth, and classifies which resource binds.

FLOP counts come from XLA's cost analysis of the kernel's per-step jnp
graph (``fn.step_cost()`` on the fused episode builder) — the same ops the
Mosaic kernel executes per grid iteration. HBM traffic is the residual
stream: every per-step carry block is written once by the forward pass and
read once by the backward (``fn.residual_bytes_per_step``).

Peaks (per chip):

* TPU v5e: 197 TFLOP/s bf16; f32 ``Precision.HIGHEST`` dot_generals run as
  6 bf16 MXU passes -> ~32.8 TFLOP/s effective f32 peak; 819 GB/s HBM.
  (Public v5e spec sheet numbers.)
"""

from __future__ import annotations

PEAKS = {
    # device_kind substring -> (bf16 FLOP/s, f32-HIGHEST FLOP/s, HBM B/s)
    "v5 lite": (1.97e14, 1.97e14 / 6, 8.19e11),
    "v5e": (1.97e14, 1.97e14 / 6, 8.19e11),
    "v5p": (4.59e14, 4.59e14 / 6, 2.765e12),
    "v4": (2.75e14, 2.75e14 / 6, 1.2e12),
    "v6e": (9.18e14, 9.18e14 / 6, 1.64e12),
    "trillium": (9.18e14, 9.18e14 / 6, 1.64e12),
}
_DEFAULT = PEAKS["v5e"]


def peaks_for(device_kind: str, with_source: bool = False):
    """Peak numbers for a device kind string. Longest-substring match so
    'v5p'/'v5e'/'v5 lite' disambiguate; unknown kinds fall back to v5e
    peaks (with ``peak_source='default(v5e)'`` when ``with_source``) rather
    than silently picking a wrong sibling."""
    dk = (device_kind or "").lower()
    for key in sorted(PEAKS, key=len, reverse=True):
        if key in dk:
            return (PEAKS[key], key) if with_source else PEAKS[key]
    return (_DEFAULT, "default(v5e)") if with_source else _DEFAULT


def report(step_cost: dict, residual_bytes_per_step: int,
           steps_per_sec: float, device_kind: str = "v5e",
           batch: int = 1) -> dict:
    """Roofline summary for a measured fwd+bwd episode throughput.

    ``steps_per_sec`` is aggregate simulation steps/sec (batch included);
    utilization is computed for the whole chip.
    """
    (peak_bf16, peak_f32, hbm_bw), peak_source = peaks_for(
        device_kind, with_source=True)
    flops_step = step_cost["flops_fwd"] + step_cost["flops_bwd"]
    # residuals: forward writes each block once, backward reads it once
    hbm_step = 2.0 * residual_bytes_per_step
    t_meas = 1.0 / steps_per_sec  # seconds per aggregate sim step
    achieved_flops = flops_step / t_meas
    achieved_hbm = hbm_step / t_meas
    t_compute = flops_step / peak_f32
    t_hbm = hbm_step / hbm_bw
    bound_t = max(t_compute, t_hbm)
    if t_meas > 3.0 * bound_t:
        binding = "latency/serialization"
    elif t_compute >= t_hbm:
        binding = "compute"
    else:
        binding = "hbm"
    return dict(
        flops_per_step=flops_step,
        hbm_bytes_per_step=hbm_step,
        mfu=achieved_flops / peak_bf16,
        mfu_f32=achieved_flops / peak_f32,
        hbm_util=achieved_hbm / hbm_bw,
        compute_time_frac=t_compute / t_meas,
        hbm_time_frac=t_hbm / t_meas,
        binding=binding,
        peak_source=peak_source,
    )
