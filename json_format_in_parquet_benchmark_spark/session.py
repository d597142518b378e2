"""SparkSession factory tuned for this engine.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default 32) but every
config choice is made for a real multi-executor cluster at ~100 TB:

- AQE on (runtime shuffle-partition coalescing + skew-join splitting), so the
  static ``spark.sql.shuffle.partitions`` only needs to be an upper bound.
- Parquet ZSTD everywhere (the reference writes ZSTD for all four formats,
  /root/reference/src/format/plain_json.rs:38 and equivalents).
- Session timezone pinned to UTC so date/time results are reproducible across
  engines (the DuckDB oracle is timezone-naive).
- Broadcast threshold left at default 10 MB; dimension tables (region, nation,
  part, supplier at any SF that matters) broadcast automatically, and the
  query code additionally hints ``broadcast()`` where the stats may be absent.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32

_SHIPPED_SESSIONS: set[int] = set()


def ship_package(spark: SparkSession) -> None:
    """Make this package importable on executor Python workers.

    Local pytest runs inherit the repo cwd on sys.path, but an external
    driver (or a real cluster) launches workers whose PYTHONPATH does not
    include the repo -- any Pandas-UDF stage would then fail to unpickle.
    Zipping the package and ``addPyFile``-ing it is the standard Spark
    deployment path and is exactly what a 1000-executor cluster needs too.
    Idempotent per SparkContext.
    """
    sc = spark.sparkContext
    key = id(sc)
    if key in _SHIPPED_SESSIONS:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    base = os.path.join(
        tempfile.gettempdir(), "jfipb_pyfiles", "json_format_in_parquet_benchmark_spark"
    )
    zip_path = shutil.make_archive(base, "zip", os.path.dirname(pkg_dir),
                                   os.path.basename(pkg_dir))
    sc.addPyFile(zip_path)
    _SHIPPED_SESSIONS.add(key)


def default_cpus() -> int:
    env = os.environ.get("SPARK_GRAFT_CPUS")
    if env:
        return int(env)
    return os.cpu_count() or 8


def get_spark(
    app_name: str = "json-format-in-parquet-benchmark-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's standard config."""
    cpus = cpus or default_cpus()
    shuffle_partitions = shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "zstd")
        # testdata events.parquet carries TIMESTAMP(NANOS) which Spark rejects
        # by default; read as long and convert in tables.load_table
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
