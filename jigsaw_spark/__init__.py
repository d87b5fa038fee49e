"""jigsaw_spark — a PySpark-native dataset-engineering / analytics engine.

Re-expresses the query and data-processing capabilities of the reference
dataset-preparation tool (autognc/jigsaw, surveyed in SURVEY.md) as idiomatic
Spark DataFrame / SQL operators, extended with large-scale training-data
pipeline operators (dedup, similarity search, multimodal columns, text
analysis).

Layout:
    session      SparkSession factory + table catalog
    operators    relational + pipeline operators (filters, samples, splits,
                 joins, aggregates, transforms, dedup, similarity, text)
    functions    reusable column expression builders (deterministic hashing,
                 vector math, text normalization)
    sources      readers (parquet catalog, jigsaw-style metadata trees,
                 binary/multimodal files)
    plans        declarative PipelineSpec -> DataFrame compiler + lineage
    streaming    incremental ingest & windowed aggregation
    multimodal   binary-column plumbing with stubbed codecs
"""

from jigsaw_spark.session import get_spark, load_table, load_tables

__version__ = "0.1.0"

__all__ = ["get_spark", "load_table", "load_tables", "__version__"]
