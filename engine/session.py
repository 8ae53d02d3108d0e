"""SparkSession factory tuned for this engine.

local[N] here; on a real cluster the same builder settings apply and the
master/submit flags come from spark-submit (BASELINE.json: spark-submit
--py-files, N vs 4N executors).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


from contextlib import contextmanager


@contextmanager
def conf_override(spark: SparkSession, **confs: str):
    """Temporarily set session confs; restore previous values on exit.

    Used to turn AQE OFF inside the micro-ingest / merge bodies: with AQE
    on, every action that contains a shuffle executes as 2-5 separate Spark
    jobs (one per materialized query stage), and on the micro-batch path the
    ~0.3-0.5s driver-side fixed cost PER JOB (planning, scheduling, Py4J)
    dominates wall time — the eventlog for the 3-batch store entry showed
    28.5s in jobs vs 26.6s in between-job gaps across 77 jobs. The build
    plans size their own partitions (plan_fanout) and the posting builder is
    shuffle-free, so AQE's runtime re-planning buys nothing there. Large
    analytic queries keep AQE (session default stays on)."""
    conf = spark.conf
    saved: dict[str, str | None] = {}
    for k, v in confs.items():
        try:
            saved[k] = conf.get(k)
        except Exception:
            saved[k] = None
        conf.set(k, v)
    try:
        yield
    finally:
        for k, old in saved.items():
            if old is None:
                conf.unset(k)
            else:
                conf.set(k, old)


@contextmanager
def build_confs(spark: SparkSession):
    """The conf profile for index-build bodies (ingest batch / merge)."""
    with conf_override(spark, **{"spark.sql.adaptive.enabled": "false"}):
        yield


def get_spark(
    app_name: str = "inverted-index-engine",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession.

    - UTC session timezone so timestamps round-trip identically with the
      DuckDB oracle (DuckDB timestamps are UTC-naive).
    - Arrow enabled: every custom kernel is a pandas/Arrow UDF.
    - AQE on: runtime coalescing + skew-join handling at scale.
    """
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = cores

    # Executor Python workers must import the `engine` package regardless
    # of the caller's cwd (jobs/ CLIs run from anywhere; on a real cluster
    # spark-submit --py-files ships the package instead). Workers inherit
    # the driver process env, so prepending the repo root to PYTHONPATH
    # BEFORE the JVM starts makes cloudpickled UDF closures importable.
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    py_path = os.environ.get("PYTHONPATH", "")
    if repo_root not in py_path.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            repo_root + (os.pathsep + py_path if py_path else "")
        )

    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cores}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # hive partition values stay strings ("007" must not become 7 —
        # routing partitions round-trip exactly)
        .config("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
