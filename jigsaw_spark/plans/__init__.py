from jigsaw_spark.plans.pipeline import PipelineSpec, run_pipeline

__all__ = ["PipelineSpec", "run_pipeline"]
