"""Test-table catalog: loaders for the driver's parquet star schema.

Tables (FIXTURES.md §2): region nation customer supplier part orders
lineitem events documents embeddings — one parquet file per table under
``{sf_dir}/{name}.parquet``.

Scale note: ``spark.read.parquet`` gives us predicate pushdown, column
pruning and partition-size-driven task splitting for free; at 100 TB the
same call reads a partitioned directory tree and Catalyst prunes
partitions. Nothing here materializes data on the driver.
"""

from __future__ import annotations

import atexit
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import ensure_tuned

# Scratch dirs handed out by session_tmp_path, removed at interpreter
# exit so repeated driver/bench/pytest sessions don't accrete in /tmp.
_SESSION_TMP: set[str] = set()


def session_tmp_path(spark: SparkSession, name: str) -> str:
    """Session-unique scratch dir for sink/roundtrip queries.

    The appId suffix keeps two CONCURRENT Spark sessions on one box
    (e.g. a driver sim next to a pytest run) from clobbering each
    other's ``_temporary`` dirs mid-write — round-8: a fixed
    ``/tmp/plc_etl_cdc_replica`` cost a whole driver-sim pass to a
    vanished task attempt. Within one session the path is stable, so
    re-running a query overwrites its own previous output (each caller
    still rmtrees first); at exit every handed-out dir is removed."""
    path = os.path.join(
        tempfile.gettempdir(),
        f"plc_etl_{name}_{spark.sparkContext.applicationId}",
    )
    _SESSION_TMP.add(path)
    return path


def _cleanup_session_tmp() -> None:  # pragma: no cover - exit hook
    import shutil

    for path in _SESSION_TMP:
        shutil.rmtree(path, ignore_errors=True)
    _SESSION_TMP.clear()


atexit.register(_cleanup_session_tmp)

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Small dimension tables that should always hash-broadcast in joins.
BROADCAST_TABLES = frozenset({"region", "nation", "supplier"})

def shuffle_partitions(spark: SparkSession) -> int:
    """The session's configured shuffle parallelism — single source of
    truth for operators that pre-partition big relations (graph loops,
    connected components, fuzzy joins, fan_out)."""
    return int(spark.conf.get("spark.sql.shuffle.partitions", "200"))


def fan_out(df: DataFrame) -> DataFrame:
    """Spread a narrow input across the session's shuffle partitions
    before a stage that multiplies work per row (n-gram explodes,
    Arrow-heavy mapInPandas bodies). A small local fixture is one
    parquet split, so the whole explode+partial-agg otherwise runs in
    ONE task (sf5 audit: 35-59 s single-core walls while 31 idled).
    Conditional: an input already at or above the configured
    parallelism passes through untouched, so at real scale (thousands
    of splits) this never introduces an extra full shuffle."""
    n_shuffle = shuffle_partitions(df.sparkSession)
    if df.rdd.getNumPartitions() < n_shuffle:
        return df.repartition(n_shuffle)
    return df


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one test table as a DataFrame (schema from parquet footer)."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    ensure_tuned(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    # events.ts is parquet TIMESTAMP(NANOS): read as long nanos (see
    # session._RUNTIME_CONF) and truncate to micros — identical to what
    # DuckDB's ns->us coercion yields, so oracles agree.
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


class Tables:
    """Lazy attribute-style access: ``t = Tables(spark, sf_dir); t.lineitem``."""

    def __init__(self, spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR):
        self._spark = spark
        self._sf_dir = sf_dir

    def __getattr__(self, name: str) -> DataFrame:
        if name.startswith("_"):
            raise AttributeError(name)
        return load(self._spark, self._sf_dir, name)


def release_local_checkpoint(ckpt: DataFrame) -> int:
    """Unpersist ONE localCheckpoint-ed frame's block state (1 if
    released, 0 if the py4j surface did not cooperate). The LogicalRDD
    behind the checkpoint holds the block-persisted RDD; the Python-side
    ``.rdd`` accessor would wrap a NEW deserialization RDD whose
    unpersist is a no-op, hence the queryExecution reach-through.

    Lives here (neutral session/table utility layer) because both the
    iterative graph operators AND the transactional log's CDC-feed pin
    release depend on it — neither should import the other's internals
    (round-6 review)."""
    try:
        ckpt._jdf.queryExecution().analyzed().rdd().unpersist(False)
        return 1
    except Exception:  # py4j surface varies across versions
        return 0
