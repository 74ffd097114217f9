from repurpose_spark.operators.reorient import (
    sequences_to_points,
    points_to_sequences,
)
from repurpose_spark.operators.collocate import collocate
from repurpose_spark.operators.rollup import rollup, rollup_from_partials
from repurpose_spark.operators.gapfill import gap_fill
from repurpose_spark.operators.skew import (
    detect_hot_keys,
    rollup_points_salted,
)
from repurpose_spark.operators.resample import (
    build_neighbor_pairs,
    resample_nn,
    resample_weighted,
)
from repurpose_spark.operators.curation import (
    curate_documents,
    curation_report,
)
from repurpose_spark.operators.graph import connected_components
from repurpose_spark.operators.packing import (
    chunk_documents,
    materialize_packs,
    pack_sequences,
    sample_mixture,
    split_assign,
)
from repurpose_spark.operators.contamination import flag_contaminated
from repurpose_spark.operators.perplexity import (
    trigram_logprob_scores,
    trigram_model,
)

__all__ = [
    "curate_documents",
    "curation_report",
    "connected_components",
    "pack_sequences",
    "materialize_packs",
    "sample_mixture",
    "chunk_documents",
    "flag_contaminated",
    "trigram_logprob_scores",
    "trigram_model",
    "split_assign",
    "detect_hot_keys",
    "rollup_points_salted",
    "build_neighbor_pairs",
    "resample_nn",
    "resample_weighted",
    "sequences_to_points",
    "points_to_sequences",
    "collocate",
    "rollup",
    "rollup_from_partials",
    "gap_fill",
]
