from repurpose_spark.streaming.incremental import (
    incremental_hourly_rollup,
    run_available_now,
)

__all__ = ["incremental_hourly_rollup", "run_available_now"]
