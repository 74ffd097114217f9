from repurpose_spark.plans.pipeline import TierPipeline
from repurpose_spark.plans.retention import expire_tier

__all__ = ["TierPipeline", "expire_tier"]
