"""SparkSession factory.

Session-level invariants required for parity with the reference
(/root/reference, see SURVEY.md §1.2, §7 step 0):

- ``spark.sql.session.timeZone=UTC``: the reference normalizes every
  timestamp to UTC (standardizer.py:125-138) and stores TIMESTAMPTZ; pinning
  the session tz makes Spark timestamps compare as UTC instants.
- ``spark.sql.ansi.enabled=false``: the reference casts with
  ``pd.to_numeric(errors="coerce")`` (standardizer.py:188-221) — bad values
  become NULL, not errors. Non-ANSI Spark casts have the same
  coerce-to-null semantics.
- ``spark.sql.legacy.parquet.nanosAsLong=true``: the driver's test parquet
  stores TIMESTAMP(NANOS) which Spark has no native type for; read as long
  and convert in the source layer (sources/tables.py).

Scale posture (tested on local[N], designed for a 1000-executor cluster):

- AQE on (runtime coalescing of shuffle partitions, skew-join splitting,
  dynamic broadcast conversion) so plans re-optimize at real data sizes.
- Arrow execution on, so any Pandas-UDF fallback path is batch-vectorized.
- ``shuffle.partitions`` defaults to a small local value but is an env knob
  (SPARK_GRAFT_SHUFFLE_PARTITIONS); on a real cluster set ≈ 2-3× total cores
  or rely on AQE coalescing from a high initial value.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# Engine-contract confs that are runtime-settable: applied defensively by
# the source layer so declared queries behave identically under an
# externally-provided SparkSession (e.g. the correctness driver's) that was
# built without them. All three are part of the engine's documented
# semantics, not tuning knobs.
_RUNTIME_INVARIANTS = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.ansi.enabled": "false",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}

# InferFiltersFromGenerate synthesizes a `size(<generate input>) > 0` filter
# above every explode and lets it push down through the projections — for
# this engine's gram/shingle pipelines the filter re-evaluates the ENTIRE
# tokenize→shingle expression per row inside the scan task, below the
# parallelizing repartition (measured 12× on the decontamination probe at
# sf0.1: 12.3 s → 1.0 s excluded; the Jaccard/MinHash paths are also
# slightly faster). The rows it would prune (docs yielding zero grams) cost
# ~nothing to explode, so exclusion is strictly a win here.
_EXCLUDED_RULES = (
    "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
)


def ensure_session_invariants(spark: SparkSession) -> None:
    """Apply the engine's runtime-settable invariant confs to ``spark``.

    Idempotent and safe mid-session (verified: a session created without
    ``nanosAsLong`` reads TIMESTAMP(NANOS) parquet fine after a runtime
    ``conf.set``). Called from the source layer so every declared query is
    self-sufficient regardless of who built the session.
    """
    for k, v in _RUNTIME_INVARIANTS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # immutable in some deployments — keep going, reads may still work
    try:
        current = spark.conf.get("spark.sql.optimizer.excludedRules", None) or ""
        rules = [r for r in current.split(",") if r]
        merged = rules + [r for r in _EXCLUDED_RULES if r not in rules]
        spark.conf.set("spark.sql.optimizer.excludedRules", ",".join(merged))
    except Exception:
        pass


def get_spark(
    app_name: str = "gmie-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession with the invariant config."""
    master = master or f"local[{DEFAULT_CPUS}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")
        )
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # correctness invariants
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # scale posture
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.sql.optimizer.excludedRules", ",".join(_EXCLUDED_RULES))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark
