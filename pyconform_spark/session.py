"""SparkSession factory with scale-appropriate defaults.

Defaults are chosen for a multi-executor cluster reading ~100 TB:

* AQE on (runtime coalesce + skew-join splitting) — the dynamic
  counterpart of the reference's static ``WeightBalanced`` file
  partitioning (``dataflow.py:363-369``).
* Arrow execution enabled so every pandas UDF moves data in columnar
  batches, never per-row Python (BASELINE input_hint).
* UTC session timezone so bucket boundaries are unambiguous (the
  reference pins calendars per-variable, ``physarray.py:214-255``; we
  pin one calendar globally).
* zstd parquet output — the general-purpose layer under the
  Gorilla/delta-of-delta series codecs.

In the sandbox this builds ``local[N]``; on a real cluster the same
conf rides through ``spark-submit --py-files`` unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CONF: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Bigger Arrow batches amortize the Python round-trip for the
    # codec / interpolation UDFs (each batch is one vectorized call).
    "spark.sql.execution.arrow.maxRecordsPerBatch": "65536",
    "spark.sql.parquet.compression.codec": "zstd",
    # ~128 MB scan splits: the sweet spot for wide parquet scans; at
    # 100 TB this yields ~800k tasks, well within scheduler limits.
    "spark.sql.files.maxPartitionBytes": "134217728",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.shuffle.partitions": "auto",  # overridden below
    "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
}


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8)))


def get_spark(
    master: str | None = None,
    app_name: str = "pyconform_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``shuffle_partitions`` defaults to 2x cores locally — enough
    granularity for AQE to coalesce, not so many that tiny tasks
    dominate.  On a real cluster set it near 2-3x total cores and let
    AQE coalesce down.
    """
    cores = default_parallelism()
    if master is None:
        master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cores}]")
    if shuffle_partitions is None:
        shuffle_partitions = max(2 * cores, 8)

    # Python workers must be able to import this package even when the
    # driver script runs from elsewhere (local mode inherits PYTHONPATH;
    # on a cluster the same wheel rides --py-files).
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pp = os.environ.get("PYTHONPATH", "")
    if pkg_root not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = f"{pkg_root}{os.pathsep}{pp}" if pp else pkg_root

    builder = SparkSession.builder.master(master).appName(app_name)
    conf = dict(DEFAULT_CONF)
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    conf.setdefault("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
