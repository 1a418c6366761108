from delta_lake_pyspark_scd2_spark.pipeline.metrics import (
    append_run_metrics,
    read_run_metrics,
)
from delta_lake_pyspark_scd2_spark.pipeline.scd2_pipeline import (
    SCD2Spec,
    run_scd2_batch,
)

__all__ = [
    "SCD2Spec",
    "append_run_metrics",
    "read_run_metrics",
    "run_scd2_batch",
]
