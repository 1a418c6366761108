from delta_lake_pyspark_scd2_spark.pipeline.scd2_pipeline import (
    SCD2Spec,
    run_scd2_batch,
)

__all__ = ["SCD2Spec", "run_scd2_batch"]
