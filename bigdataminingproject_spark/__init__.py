"""bigdataminingproject_spark — a PySpark-native analytics engine.

A brand-new, Spark-first implementation of the query and data-processing
capabilities of the reference streaming text-mining pipeline
(EderChri/BigDataMiningProject): ETL over conversation corpora, one-pass
streaming analytics (duplicate / frequency / burst detection), plus the
large-scale training-data-pipeline operators (dedup families, similarity
search, text analysis, multimodal plumbing) the reference's design implies.

Design stance (SURVEY.md §7): exact-first. Every capability is expressed as
declarative DataFrame / SQL plans so Catalyst + Tungsten choose the physical
strategy (pushdown, pruning, broadcast, whole-stage codegen, AQE). Sketches
(Bloom / CMS / DGIM) are an optional parity layer, not the substrate.
"""

from bigdataminingproject_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
