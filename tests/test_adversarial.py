"""Adversarial-fixture sweep: every oracled query vs DuckDB on data
built to break latent assumptions the driver fixtures never test —
massive timestamp ties (minute-quantized events), a bot user holding
~40% of the log, a constant-valued sensor stream (zero variance), exact
duplicate documents, single-word documents, a zero-norm embedding —
and NULLs everywhere the driver fixtures have none (value, props,
text, lang, whole embeddings — and, since round 8, event TIMESTAMPS:
the v3 fixture's NULL coverage skipped ts, which is exactly where 13
engine/oracle divergences hid until the round-8 NULL-ts sweep;
fixture bumped to v4 so the full multi-table sweep covers the class
the events-only sweep in test_null_ts_sweep.py pins).

The star-schema tables are copied from the sf0.001 fixtures (the
relational queries keep their referential structure); only the three
"free-form" tables are adversarial. Any query whose Spark/DuckDB twins
disagree ONLY on this data has a tiebreak or degenerate-input bug the
normal oracle sweep can't see.
"""

from __future__ import annotations

import datetime
import json
import os
import random
import shutil

import duckdb
import pytest

from plc_data_etl_pipeline_spark.catalog import TABLES
from plc_data_etl_pipeline_spark.registry import all_queries
from .conftest import flatten_parquet_dir as _flatten

from .conftest import SF_DIR
from .oracle_compare import compare

ADV_DIR = "/tmp/plc_etl_adversarial_sf_v4"

_STAR = (
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem"
)


def _build(spark) -> str:
    if os.path.exists(os.path.join(ADV_DIR, "_READY")):
        return ADV_DIR
    shutil.rmtree(ADV_DIR, ignore_errors=True)
    os.makedirs(ADV_DIR)
    for t in _STAR:
        shutil.copy(f"{SF_DIR}/{t}.parquet", f"{ADV_DIR}/{t}.parquet")

    rng = random.Random(1234)
    base = datetime.datetime(2024, 1, 1)
    ev_rows = []
    types = ["view", "click", "purchase", "signup", "error"]
    for i in range(5000):
        # bot user 7 owns ~40% of events; 30 users total
        user = 7 if rng.random() < 0.4 else rng.randrange(30)
        # minute quantization => heavy equal-timestamp collisions;
        # ~3% NULL event times (round-8: the class 13 oracles missed)
        ts = (None if rng.random() < 0.03 else
              base + datetime.timedelta(minutes=rng.randrange(0, 43200, 30)))
        etype = types[rng.randrange(5)]
        # 'error' stream is CONSTANT (zero variance); rest 2-decimal
        value = 100.0 if etype == "error" else round(rng.uniform(0, 500), 2)
        if etype != "error" and rng.random() < 0.03:
            value = None  # fixtures are null-free; reality is not
        props = (None if rng.random() < 0.02
                 else json.dumps({"k": rng.randrange(99)}))
        ev_rows.append((i, ts, user, etype, value, props))
    spark.createDataFrame(
        ev_rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{ADV_DIR}/events.parquet")
    _flatten(f"{ADV_DIR}/events.parquet")

    words = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
             "lambda mu the and of to is in").split()
    doc_rows = []
    for i in range(400):
        if i % 3 == 1:
            text = doc_rows[i - 1][1]  # exact duplicate of previous doc
        elif i % 17 == 0:
            text = words[i % len(words)]  # single-word document
        else:
            n = 5 + (i * 7) % 40
            text = " ".join(
                words[(i * 13 + j * 5) % len(words)] for j in range(n)
            )
        if i in (50, 151, 252):
            text = None  # NULL documents
        lang = None if i % 41 == 0 else ("en", "de", "es")[i % 3]
        doc_rows.append(
            (i, text, lang, ("web", "wiki")[i % 2],
             len(text) if text is not None else 0)
        )
    spark.createDataFrame(
        doc_rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{ADV_DIR}/documents.parquet"
    )
    _flatten(f"{ADV_DIR}/documents.parquet")

    emb_rows = []
    for i in range(200):
        if i in (7, 33, 149):
            vec = None  # NULL embedding rows — id 7 sits INSIDE the
            # ANN query ranges (vec_id < 20), so query-side NULL guards
            # are exercised too (round-3 review: the old fixture's
            # NULLs were all above query_max_id and missed a crash)
        elif i in (11, 77):
            vec = [0.0] * 64  # zero-norm vectors (11 = in query range)
        elif i % 10 == 3:
            vec = [round((j % 7) * 0.25 - 0.75, 2) for j in range(64)]
            # repeated identical vectors (exact-dup cluster)
        else:
            r = random.Random(i)
            vec = [round(r.uniform(-1, 1), 3) for _ in range(64)]
        # NULL labels (13 inside the query range): label-aware ops
        # (hard-negative mining) must EXCLUDE these on both sides —
        # "different label" is three-valued against NULL.
        label = None if i in (13, 99) else i % 10
        emb_rows.append((i, vec, label))
    spark.createDataFrame(
        emb_rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{ADV_DIR}/embeddings.parquet"
    )
    _flatten(f"{ADV_DIR}/embeddings.parquet")
    open(os.path.join(ADV_DIR, "_READY"), "w").write("ok")
    return ADV_DIR


_QUERIES = all_queries()
_ORACLED = sorted(n for n, d in _QUERIES.items() if d.oracle is not None)
_ROWS_ONLY = sorted(n for n, d in _QUERIES.items() if d.oracle is None)


@pytest.mark.parametrize("name", _ORACLED)
def test_adversarial_oracle(name, spark):
    sf_dir = _build(spark)
    qd = _QUERIES[name]
    df = qd.fn(spark, sf_dir)
    spark_rows = [tuple(r) for r in df.collect()]
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')"
            )
        rel = con.sql(qd.oracle)
        problems = compare(
            list(df.columns),
            spark_rows,
            [d[0] for d in rel.description],
            rel.fetchall(),
        )
    finally:
        con.close()
    assert not problems, (
        f"query {name!r} diverges on ADVERSARIAL data:\n" + "\n".join(problems)
    )


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_adversarial_rows_only(name, spark):
    """Rows-only (oracle=None) queries must still EXECUTE on the
    adversarial fixture (NULL embeddings, NULL text, ties, zero
    vectors) — this is the sweep that would have caught the
    NULL-vector crash in gram_pcs before the advisor did."""
    sf_dir = _build(spark)
    df = _QUERIES[name].fn(spark, sf_dir)
    rows = df.collect()
    assert rows is not None  # executed without raising; row count may be 0
