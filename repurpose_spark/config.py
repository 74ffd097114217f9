"""Engine configuration.

The reference's knobs (cellsize, imgbuffer, n_proc — img2ts.py:117-124,
:207-213, :242-249) map onto: ``n_cells`` (bucket count = analog of 5-deg
cells), ``batch`` boundaries (checkpoint granularity), and Spark's own
parallelism.  ``dt_seconds`` defines the derived per-token timestamp axis
``ts = epoch + pos * dt`` (SURVEY.md §7.0).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime, timezone

EPOCH = datetime(2020, 1, 1, tzinfo=timezone.utc)
EPOCH_NAIVE = datetime(2020, 1, 1)
EPOCH_STR = "2020-01-01 00:00:00"


@dataclass(frozen=True)
class EngineConfig:
    # cell bucketing (analog of repurpose 5-deg CellGrid, img2ts.py:242-249)
    n_cells: int = 64
    # derived time axis: token at position p of a doc gets ts = epoch + p*dt
    dt_seconds: int = 60
    epoch: str = EPOCH_STR
    # retention tiers, coarsest last; trunc unit names match date_trunc()
    tiers: tuple = (("raw", None), ("hourly", "hour"), ("daily", "day"))
    # skew handling: cells whose row share exceeds this fraction get salted
    skew_threshold: float = 0.05
    salt_buckets: int = 8
    # collocation window override; None = max tick gap (stack.py:282-283)
    tolerance_seconds: int | None = None
    # storage
    warehouse: str = "/tmp/repurpose_spark_warehouse"
    compression: str = "zstd"

    def tier_units(self) -> list:
        return [u for _, u in self.tiers if u is not None]


DEFAULT = EngineConfig()
