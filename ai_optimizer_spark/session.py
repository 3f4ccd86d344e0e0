"""SparkSession bootstrap tuned for the engine.

The reference keeps per-database connection pools (`src/server/app/database/
config.py`); in Spark the session *is* the pool. Config choices here are the
scale levers: AQE for runtime re-planning (skew joins, partition coalescing),
Arrow for the few Pandas-UDF operators, UTC session time so timestamp
semantics match the columnar oracle exactly.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults sized for the test harness (local[32], 128 GiB). On a real
# cluster only `master` changes; shuffle partitions should scale with
# executor cores (AQE coalesces the excess at runtime).
DEFAULT_SHUFFLE_PARTITIONS = 32


def ensure_package_shipped(spark: SparkSession) -> None:
    """Make ``ai_optimizer_spark`` importable on Spark python workers.

    The driver harness may create the SparkSession from any cwd, so workers
    deserializing a pandas UDF that references this package by module path
    would hit ModuleNotFoundError. Shipping a zip via ``addPyFile`` pins the
    package onto every worker's sys.path — the same mechanism a real cluster
    deploy would use (``spark-submit --py-files``).
    """
    sc = spark.sparkContext
    if sc.applicationId in _SHIPPED_APPS:
        return
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zip_path = os.path.join(
        os.environ.get("TMPDIR", "/tmp"), f"ai_optimizer_spark-{os.getpid()}.zip"
    )
    with zipfile.ZipFile(zip_path, "w") as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            for fname in files:
                if fname.endswith(".py"):
                    full = os.path.join(root, fname)
                    rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                    zf.write(full, rel)
    sc.addPyFile(zip_path)
    _SHIPPED_APPS.add(sc.applicationId)


_SHIPPED_APPS: set[str] = set()


def get_spark(app_name: str = "ai_optimizer_spark") -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    Every knob here exists for scale, not convenience:
      * AQE on: runtime partition coalescing + skew-join splitting means the
        same plan survives a 100x scale-up without re-tuning.
      * autoBroadcastJoinThreshold stays at default (10 MB) — dimension
        tables (region/nation/part at TPC-H shape) broadcast automatically;
        we also broadcast explicitly where we *know* the side is small.
      * Arrow enabled: the embed/judge Pandas UDFs move batches, not rows.
      * UTC session timezone: deterministic timestamp arithmetic that
        matches the DuckDB correctness oracle bit-for-bit.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(DEFAULT_SHUFFLE_PARTITIONS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # Big working set of generated classes: ~50 headline queries compile
        # hundreds of whole-stage-codegen classes. Headroom over the JVM
        # default (240 MB) plus flushing keeps JIT compilation available for
        # late-session queries; protective, not a measured bottleneck.
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=1g -XX:+UseCodeCacheFlushing",
        )
        .config("spark.ui.enabled", "false")
    )
    # Deploy-tuning surface: SPARK_GRAFT_EXTRA_CONF="k=v;k2=v2" lets a
    # deployment (or an A/B measurement) layer site-specific settings over
    # the engine defaults without editing code. Unset => exactly the
    # defaults above.
    extra = os.environ.get("SPARK_GRAFT_EXTRA_CONF", "")
    for kv in filter(None, (s.strip() for s in extra.split(";"))):
        k, _, v = kv.partition("=")
        builder = builder.config(k.strip(), v.strip())
    return builder.getOrCreate()
