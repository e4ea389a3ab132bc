"""Roofline accounting for the deferred rasterizer kernels.

The reference has no performance tooling at all (SURVEY.md §5 — wall
clock fps prints only). Here every Pallas stage gets an analytic
work/traffic model so a bench run can report achieved fraction of the
bounding resource, making regressions diagnosable ("pass A at 71% of
VPU" vs "DMA-bound") without a profiler attach.

Peaks are per-chip numbers; v5e defaults below (measured VPU vector-op
throughput on this kernel family is ~1 32-bit vreg-op/cycle/VPU lane
group, i.e. 8x128 f32 lanes at the clock).
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class ChipPeaks:
    name: str = "v5e"
    clock_ghz: float = 0.94
    vpu_f32_ops_s: float = 0.94e9 * 8 * 128     # 1 vreg-op/cycle
    mxu_bf16_flops: float = 197e12
    mxu_f32_flops: float = 197e12 / 6           # HIGHEST = 6 bf16 passes
    hbm_gbs: float = 819.0


# Per-(tile,chunk)-pair vector-op counts of the current kernels
# (fmhr_tpu/raster/deferred.py); update when the kernel body changes.
PASS_A_OPS_PER_PAIR = 19      # 3 affine evals + l2-from-d + cov + track
PASS_B_VPU_OPS_PER_PAIR = 4   # onehot compare/cast + accumulate


def _record_rows(C: int) -> int:
    """Record-row count for C attribute channels, straight from the
    kernel plan (fmhr_tpu.raster.deferred._plan) so the layout can never
    drift from the kernels again (ADVICE r2 #3)."""
    from ..raster.deferred import _plan

    # only F/V/C shape the record layout; the rest are placeholders
    return _plan(1, 1, C, 8, 8, 1, 1, quiet=True)["rec"]


def deferred_roofline(*, B, H, W, F, C, pairs_a, pairs_b, fwd_ms=None,
                      bwd_ms=None, peaks: ChipPeaks = ChipPeaks()):
    """Analytic cost model for one fwd(+bwd) of the deferred renderer.

    pairs_a: total (tile, chunk) pairs visited by pass A across views
    (from `audit_deferred_rows`); pairs_b: winning pairs (<= pairs_a).
    Returns {stage: {time_bound_ms, bound, achieved_pct?}}.
    """
    from ..raster.deferred import TILE_H, TILE_W, _CHUNK

    _PIX = TILE_H * TILE_W
    _K = _CHUNK
    rec = _record_rows(C)

    # pass A: VPU ops + coefficient-table DMA
    a_ops = pairs_a * PASS_A_OPS_PER_PAIR * _PIX * _K
    a_dma = pairs_a * 16 * _K * 4
    a_vpu_ms = a_ops / peaks.vpu_f32_ops_s * 1e3
    a_dma_ms = a_dma / (peaks.hbm_gbs * 1e9) * 1e3

    # pass B: one-hot extraction matmul (f32 HIGHEST) + record DMA
    b_flops = pairs_b * 2 * _PIX * _K * rec
    b_mxu_ms = b_flops / peaks.mxu_f32_flops * 1e3
    b_dma = pairs_b * rec * _K * 4 + B * (H * W) * rec * 4  # + outf write
    b_dma_ms = b_dma / (peaks.hbm_gbs * 1e9) * 1e3

    # bwd: same matmul shape + RMW gradient-table traffic
    w_flops = pairs_b * 2 * _PIX * _K * rec
    w_mxu_ms = w_flops / peaks.mxu_f32_flops * 1e3
    w_dma = pairs_b * rec * _K * 4 * 2 + B * (H * W) * rec * 4
    w_dma_ms = w_dma / (peaks.hbm_gbs * 1e9) * 1e3

    out = {
        "pass_a": {
            "bound": "vpu" if a_vpu_ms >= a_dma_ms else "hbm",
            "vpu_ms": round(a_vpu_ms, 3), "hbm_ms": round(a_dma_ms, 3),
        },
        "pass_b": {
            "bound": "mxu" if b_mxu_ms >= b_dma_ms else "hbm",
            "mxu_ms": round(b_mxu_ms, 3), "hbm_ms": round(b_dma_ms, 3),
        },
        "bwd": {
            "bound": "mxu" if w_mxu_ms >= w_dma_ms else "hbm",
            "mxu_ms": round(w_mxu_ms, 3), "hbm_ms": round(w_dma_ms, 3),
        },
        "chip": peaks.name,
    }
    bound_fwd = (max(a_vpu_ms, a_dma_ms) + max(b_mxu_ms, b_dma_ms))
    out["fwd_bound_ms"] = round(bound_fwd, 3)
    out["bwd_bound_ms"] = round(max(w_mxu_ms, w_dma_ms), 3)
    if fwd_ms is not None:
        out["fwd_ms"] = round(fwd_ms, 3)
        out["fwd_roofline_pct"] = round(100 * bound_fwd / max(fwd_ms, 1e-9), 1)
    if bwd_ms is not None:
        out["bwd_ms"] = round(bwd_ms, 3)
        out["bwd_roofline_pct"] = round(
            100 * out["bwd_bound_ms"] / max(bwd_ms, 1e-9), 1)
    return out
