"""SparkSession factory with scale-oriented defaults.

Defaults chosen for the 100 TB design point (AQE on, skew-join on,
Arrow-batched pandas UDFs) while remaining correct on local[N].
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession


def _package_zip() -> str:
    """Zip the sopspark package for shipment to executors — the programmatic
    twin of ``spark-submit --py-files sopspark.zip`` (north_rule deploy mode).
    Cached per process."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    out = os.path.join(tempfile.gettempdir(), "sopspark_pyfiles.zip")
    with zipfile.ZipFile(out, "w") as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    rel = os.path.join("sopspark", os.path.relpath(full, pkg_dir))
                    zf.write(full, rel)
    return out


def local_df(spark: SparkSession, rows: list[tuple], schema: str):
    """Driver-literal DataFrame as a SQL VALUES inline table.

    Unlike ``createDataFrame`` (which parallelizes the rows into an RDD, so
    every collect/broadcast over it schedules a cluster job), an inline
    table optimizes to a ``LocalRelation``: collects are driver-side array
    copies and broadcast-hash-join builds skip the job entirely. Use for
    small dimension/dictionary literals on the hot path; NOT for data that
    should live on executors.

    ``schema`` is a DDL string like ``"alias string, prior double"``; every
    column is explicitly cast so literal typing (e.g. SQL ``1.0`` parsing
    as decimal) can't drift from the declared type.
    """
    cols = []
    for field in schema.split(","):
        name, typ = field.strip().split(None, 1)
        cols.append((name, typ))
    if not rows:
        casts = ", ".join(f"CAST(NULL AS {t}) AS {n}" for n, t in cols)
        return spark.sql(f"SELECT {casts} WHERE 1=0")

    def lit(v):
        if v is None:
            return "NULL"
        if isinstance(v, bool):
            return "TRUE" if v else "FALSE"
        if isinstance(v, (int, float)):
            return repr(v)
        s = str(v).replace("\\", "\\\\").replace("'", "\\'")
        return f"'{s}'"

    values = ", ".join("(" + ", ".join(lit(v) for v in row) + ")" for row in rows)
    names = ", ".join(n for n, _t in cols)
    casts = ", ".join(f"CAST({n} AS {t}) AS {n}" for n, t in cols)
    return spark.sql(f"SELECT {casts} FROM VALUES {values} AS t({names})")


def get_spark(
    master: str | None = None,
    app_name: str = "sopspark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with AQE + Arrow enabled.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32).
    On a real cluster you would omit ``master`` and let spark-submit set it;
    every other conf here is cluster-appropriate as-is.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # one shuffle partition per core locally; on a cluster AQE coalesces
        # from a deliberately high initial number instead.
        shuffle_partitions = max(cpus, 8)
    builder = SparkSession.builder
    if master != "cluster":
        # master="cluster": leave the master to spark-submit / cluster
        # manager config (the deploy mode the north_rule ships under)
        builder = builder.master(master)
    builder = (
        builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # 64k-row Arrow batches amortize per-batch serialization overhead in
        # the pandas-UDF extraction path (~+10-25% KG throughput at local[4],
        # measured interleaved vs the 10k default; won every trial). Text
        # rows are small, so a batch stays ~tens of MB; binary-heavy
        # pipelines (multimodal decode) should LOWER this per session.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # make the package importable on executors regardless of driver cwd
    spark.sparkContext.addPyFile(_package_zip())
    return spark
