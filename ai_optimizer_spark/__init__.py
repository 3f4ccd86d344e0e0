"""ai_optimizer_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of oracle/ai-optimizer (reference snapshot
2026-08-07), re-expressed Spark-first.

The reference is a RAG + NL2SQL toolkit whose compute engine is the Oracle
database; this package re-expresses every data operation it performs as
declarative Spark DataFrame/SQL plans (see SURVEY.md for the operator
inventory with file:line citations into the reference), plus the
LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal plumbing) a 100 TB training-data pipeline needs.

Design rules (enforced throughout):
  * DataFrame/SQL only — no RDDs; Catalyst owns optimization.
  * Built-in `pyspark.sql.functions` in the hot path; Pandas UDFs only where
    built-ins genuinely cannot express the semantics (model inference).
  * Every operator is a `df -> df` function usable at any scale factor; the
    driver contract (`__spark_entry__.py`) wires them to DuckDB oracles.
"""

__version__ = "0.1.0"

# Session-level cache lifecycle (see cache.py): operators persist shared
# subtrees for intra-query reuse; long-lived sessions call
# `release_shared_caches()` after consuming results (or blanket
# `spark.catalog.clearCache()`, as bench.py does between queries).
from .cache import release_shared_caches  # noqa: E402,F401
