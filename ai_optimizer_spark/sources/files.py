"""File/object sources & sinks — SURVEY.md §2.1 S6, S9, S12 / §2.2 P3.

The reference lists OCI bucket objects with metadata (oci/bucket.py:125-149),
filters supported extensions (:134-136), round-trips chunks as JSON
(embed/document.py:323-353), and spools query results to CSV
(embed/utils.py:109-124). Spark-first equivalents:

  * object listing  → `binaryFile` scan (path/length/modificationTime come
    from the file index — no bytes are read when content is pruned away);
  * extension filter → a plain column predicate on the path;
  * chunk JSON      → df.write.json / spark.read.json with the explicit
    chunk schema (no inference — SURVEY.md §1.3);
  * CSV sink        → df.write.csv(header=True).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    MapType,
    StringType,
    StructField,
    StructType,
)

SUPPORTED_EXTENSIONS = ("pdf", "docx", "pptx", "xlsx", "txt", "md", "csv", "json")

CHUNK_JSON_SCHEMA = StructType(
    [
        StructField("id", StringType()),
        StructField("page_content", StringType()),
        StructField("metadata", MapType(StringType(), StringType())),
    ]
)


def list_objects(spark: SparkSession, path: str, glob: str | None = None) -> DataFrame:
    """S9: object listing with metadata — name, size, mtime, extension.
    Reads the file index only (content column pruned), so listing a
    petabyte prefix costs a metadata scan."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    files = reader.load(path)
    name = F.element_at(F.split(F.col("path"), "/"), -1)
    ext = F.lower(F.element_at(F.split(name, r"\."), -1))
    return files.select(
        name.alias("name"),
        F.col("length").alias("size"),
        F.col("modificationTime").alias("time_modified"),
        ext.alias("extension"),
        F.col("path"),
    )


def filter_supported(listing: DataFrame) -> DataFrame:
    """P3: keep supported extensions only (oci/bucket.py:134-136)."""
    return listing.filter(F.col("extension").isin(*SUPPORTED_EXTENSIONS))


def write_chunks_json(chunks: DataFrame, path: str) -> None:
    """S6 write half: chunks serialized as JSON lines (the LangChain-Document
    JSON round-trip, embed/document.py:323-339)."""
    chunks.select("id", "page_content", "metadata").write.mode("overwrite").json(path)


def read_chunks_json(spark: SparkSession, path: str) -> DataFrame:
    """S6 read half: explicit schema, no inference."""
    return spark.read.schema(CHUNK_JSON_SCHEMA).json(path)


def write_csv(df: DataFrame, path: str) -> None:
    """S12: CSV sink with header (embed/utils.py:109-124)."""
    df.write.mode("overwrite").option("header", True).csv(path)


def read_csv(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """CSV source with explicit schema (inference is an ingest convenience
    only — SURVEY.md §1.3)."""
    return spark.read.schema(schema).option("header", True).csv(path)
