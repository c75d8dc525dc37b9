"""Analytic communication model for the distributed Schur BA solvers.

The ≥80 % multi-host scaling target (BASELINE.md) cannot be measured in
this environment (one TPU chip; the 8-device CPU mesh oversubscribes 2
cores), so this module makes the claim *inspectable* instead (VERDICT r4
item 6):

1. closed-form per-LM-iteration collective traffic of
   :func:`davo_tpu.parallel.distributed_schur_ba` (1-D point mesh) and
   :func:`~davo_tpu.parallel.distributed_schur_ba_2d` (keyframe x point
   mesh) as a function of ``(M, N, mesh shape)``;
2. an HLO auditor that extracts every ``all-reduce`` from a compiled
   module and checks the model's (group size, payload bytes) inventory
   against what XLA actually emitted — regression-tested on the 8-device
   virtual mesh (``tests/parallel/test_comm_model.py``);
3. a ring-all-reduce time model combining the audited byte counts with
   measured single-chip compute time to predict N-chip efficiency.

The reference has no distributed layer at all (SURVEY §2.8: no
torch.distributed / NCCL / MPI anywhere); the model covers framework-new
capability.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Iterable, List, Sequence, Tuple

__all__ = [
    "Collective",
    "schur_1d_traffic",
    "schur_2d_traffic",
    "wire_bytes_per_device",
    "extract_hlo_all_reduces",
    "predict_efficiency",
]


@dataclasses.dataclass(frozen=True)
class Collective:
    """One all-reduce: ``payload_bytes`` reduced over ``group_size``
    devices, ``count`` times per LM iteration."""

    name: str
    group_size: int
    payload_bytes: int
    count: int = 1

    def wire_bytes(self) -> float:
        """Bytes each device moves over the interconnect for this
        collective, under the standard ring algorithm
        (reduce-scatter + all-gather): ``2 * S * (g - 1) / g``."""
        g = self.group_size
        return self.count * 2.0 * self.payload_bytes * (g - 1) / g


def _camera_dim(num_views: int) -> int:
    return 3 + 6 * num_views


def schur_1d_traffic(
    num_views: int, num_points: int, devices: int, dtype_bytes: int = 4
) -> List[Collective]:
    """Per-LM-iteration collectives of :func:`distributed_schur_ba` on a
    ``devices``-way point mesh.

    Only the reduced camera system ``(C, C)`` + rhs ``(C,)`` (one fused
    all-reduce) and the scalar step-acceptance cost ever cross the
    interconnect; all point-block work stays shard-local.  Independent of
    ``N`` — the defining property of the Schur split.
    """
    del num_points  # traffic is N-independent; kept for signature parity
    c = _camera_dim(num_views)
    return [
        Collective(
            "reduced_camera_system", devices, (c * c + c) * dtype_bytes
        ),
        Collective("step_cost", devices, dtype_bytes),
    ]


def schur_2d_traffic(
    num_views: int,
    num_points: int,
    kf_devices: int,
    pt_devices: int,
    dtype_bytes: int = 4,
) -> List[Collective]:
    """Per-LM-iteration collectives of :func:`distributed_schur_ba_2d` on
    an ``(a, b) = (kf_devices, pt_devices)`` mesh.

    The keyframe-axis separator traffic dominates: each device completes
    its ``N / b`` local points' factors ``(C_blk 3x3, H_cp Cx3, g_p 3)``
    across the ``a`` keyframe shards that observe them — one fused
    all-reduce of ``(N/b) * (3C + 12)`` elements.  XLA stages the scalar
    cost psum over the 2-D mesh as one all-reduce per axis.
    """
    a, b = kf_devices, pt_devices
    c = _camera_dim(num_views)
    n_loc = num_points // b
    traffic = [
        Collective(
            "separator_point_factors",  # c_blk (9) + h_cp (3C) + g_p (3)
            a,
            n_loc * (3 * c + 12) * dtype_bytes,
        ),
        Collective("reduced_camera_system", a * b, (c * c + c) * dtype_bytes),
        Collective("dp_regather", a, n_loc * 3 * dtype_bytes),
        Collective("pose_mask_regather", a, 6 * num_views * 4),  # s32
        Collective("step_cost_kf_stage", a, dtype_bytes),
        Collective("step_cost_pt_stage", b, dtype_bytes),
    ]
    return [t for t in traffic if t.group_size > 1]


def wire_bytes_per_device(traffic: Iterable[Collective]) -> float:
    return sum(t.wire_bytes() for t in traffic)


_ALL_REDUCE_RE = re.compile(
    r"=\s*(\([^)]*\)|\S+)\s+all-reduce\(.*?replica_groups="
    r"(\{\{[^}]*(?:\},\{[^}]*)*\}\}|\[[0-9,]+\]<=\S+)"
)
_SHAPE_RE = re.compile(r"([a-z][a-z0-9]*)\[([0-9,]*)\]")
_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2,
    "s64": 8, "s32": 4, "u32": 4, "s16": 2, "u16": 2,
    "s8": 1, "u8": 1, "pred": 1,
}


def extract_hlo_all_reduces(hlo_text: str) -> List[Tuple[int, int]]:
    """Every ``all-reduce`` in a compiled HLO module as
    ``(group_size, payload_bytes)`` pairs (sorted).

    Handles tuple-shaped (fused) all-reduces, explicit
    ``replica_groups={{0,1},{2,3}}`` lists and iota
    ``replica_groups=[groups,size]<=...`` notation.
    """
    results = []
    for m in _ALL_REDUCE_RE.finditer(hlo_text):
        shape_txt, groups_txt = m.group(1), m.group(2)
        payload = 0
        for dtype, dims in _SHAPE_RE.findall(shape_txt):
            if dtype not in _DTYPE_BYTES:
                continue
            elems = 1
            for d in dims.split(","):
                if d:
                    elems *= int(d)
            payload += elems * _DTYPE_BYTES[dtype]
        if groups_txt.startswith("{{"):
            first = groups_txt[2:].split("}")[0]
            group_size = len([x for x in first.split(",") if x.strip()])
        else:
            dims = [int(x) for x in groups_txt[1:].split("]")[0].split(",")]
            group_size = dims[1]  # [num_groups, group_size]<=...
        results.append((group_size, payload))
    return sorted(results)


def predict_efficiency(
    compute_seconds_per_iteration: float,
    traffic: Sequence[Collective],
    *,
    serial_fraction: float = 0.0,
    devices: int,
    link_bytes_per_second: float = 9.0e10,
    latency_per_collective: float = 2e-6,
) -> dict:
    """Strong-scaling prediction for one LM iteration.

    ``compute_seconds_per_iteration`` is the measured SINGLE-chip time;
    the sharded portion divides by ``devices`` while ``serial_fraction``
    of it (the replicated reduced-system solve) does not.  Communication
    adds ring-all-reduce wire time on ``link_bytes_per_second``
    (default: one TPU v5e ICI ring direction pair, 2 x 45 GB/s) plus a
    fixed per-collective latency.

    :return: dict with ``t_compute``, ``t_comm``, ``t_total``,
        ``efficiency`` (= t_1 / (devices * t_D), the frames/s-per-chip
        retention vs one chip).
    """
    t1 = compute_seconds_per_iteration
    t_serial = serial_fraction * t1
    t_compute = (t1 - t_serial) / devices + t_serial
    wire = wire_bytes_per_device(traffic)
    n_collectives = sum(t.count for t in traffic)
    t_comm = wire / link_bytes_per_second + n_collectives * latency_per_collective
    t_total = t_compute + t_comm
    return {
        "devices": devices,
        "t_compute": t_compute,
        "t_comm": t_comm,
        "t_total": t_total,
        "wire_bytes": wire,
        "efficiency": t1 / (devices * t_total),
    }
