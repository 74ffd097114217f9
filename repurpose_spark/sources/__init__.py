from repurpose_spark.sources.synthetic import synth_sequences, synth_sequences_pandas
from repurpose_spark.sources.tables import Warehouse
from repurpose_spark.sources.testdata import load_table, load_all

__all__ = [
    "synth_sequences",
    "synth_sequences_pandas",
    "Warehouse",
    "load_table",
    "load_all",
]
