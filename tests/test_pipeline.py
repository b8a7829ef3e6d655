"""Pipeline-parity behavioral tests (SURVEY.md §5.2.3).

Covers the reference's dataflow semantics re-expressed on Spark:
Avro roundtrip (R4/R9), poison-pill tolerance (R10), micro-batch
streaming sink with at-least-once vs idempotent modes (R12-R16),
epoch→timestamp (R13), surrogate keys (R17), observe counters (R18).
"""

from __future__ import annotations

import os
import tempfile
import time

import pytest
from pyspark.sql import functions as F

from plc_data_etl_pipeline_spark.pipeline import avro_codec as A
from plc_data_etl_pipeline_spark.pipeline import generator as G
from plc_data_etl_pipeline_spark.pipeline import sink as K


def test_generator_domains_and_determinism(spark):
    df = G.generate_batch(spark, n_rows=80, partitions=4)
    rows = df.collect()
    assert len(rows) == 80
    machines = {r.machine_id for r in rows}
    sensors = {r.sensor for r in rows}
    assert machines <= set(G.MACHINES) and len(machines) > 1
    assert sensors <= set(G.SENSORS) and len(sensors) > 1
    assert all(0.0 <= r.reading < 100.0 for r in rows)
    # determinism: same seed -> identical data
    rows2 = G.generate_batch(spark, n_rows=80, partitions=4).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, rows2))


def test_avro_roundtrip_exact(spark):
    plc = G.generate_batch(spark, n_rows=40, partitions=2)
    encoded = plc.select(
        "machine_id", "sensor", "reading", "t_stamp",
        A.avro_encode(
            F.col("machine_id"), F.col("sensor"), F.col("reading"), F.col("t_stamp")
        ).alias("value"),
    )
    decoded = encoded.select(
        "machine_id", "sensor", "reading", "t_stamp",
        A.avro_decode(F.col("value")).alias("rec"),
    )
    for r in decoded.collect():
        assert r.rec.machine_id == r.machine_id
        assert r.rec.sensor == r.sensor
        assert r.rec.reading == r.reading  # doubles roundtrip bit-exactly
        assert r.rec.t_stamp == r.t_stamp


def test_avro_wire_format_is_spec_compliant():
    """The payload must be the Confluent frame + Avro binary per the
    public spec — check byte layout by hand for a known record."""
    payload = A.encode_record("M1", "temperature", 1.5, 2.0)
    assert payload[0] == 0  # magic
    assert payload[1:5] == (1).to_bytes(4, "big")  # schema id
    body = payload[5:]
    assert body[0] == 4  # zigzag(2) = 4 — len("M1")
    assert body[1:3] == b"M1"
    assert body[3] == 22  # zigzag(11) — len("temperature")
    assert body[4:15] == b"temperature"
    import struct
    assert struct.unpack("<d", body[15:23])[0] == 1.5
    assert struct.unpack("<d", body[23:31])[0] == 2.0


def test_poison_pill_tolerance(spark):
    """R10: corrupt payloads decode to NULL and are filterable; good rows
    survive untouched."""
    plc = G.generate_batch(spark, n_rows=10, partitions=1)
    good = plc.select(
        A.avro_encode(
            F.col("machine_id"), F.col("sensor"), F.col("reading"), F.col("t_stamp")
        ).alias("value")
    )
    poison = spark.createDataFrame(
        [(b"\x00\x00\x00\x00\x01garbage",), (b"",), (b"\xff\xfe",)], ["value"]
    )
    mixed = good.union(poison)
    decoded = mixed.select(A.avro_decode(F.col("value")).alias("rec")).select("rec.*")
    ok = decoded.filter(F.col("machine_id").isNotNull())
    bad = decoded.filter(F.col("machine_id").isNull())
    assert ok.count() == 10
    assert bad.count() == 3


def test_finalize_rows_epoch_to_timestamp(spark):
    plc = G.generate_batch(spark, n_rows=10, partitions=1)
    out = K.finalize_plc_rows(plc)
    rows = out.collect()
    assert set(out.columns) == {"machine_id", "sensor", "reading", "t_stamp", "id"}
    # t_stamp became a timestamp anchored at BASE_EPOCH (2024-01-01 UTC)
    assert all(r.t_stamp.year == 2024 for r in rows)
    # surrogate ids unique (monotonically_increasing_id)
    ids = [r.id for r in rows]
    assert len(set(ids)) == len(ids)


def test_observe_counters(spark):
    """R18: observable metrics report row counts without a second scan."""
    from pyspark.sql import Observation

    plc = G.generate_batch(spark, n_rows=30, partitions=2)
    obs = Observation("plc_metrics")
    observed = plc.observe(obs, F.count(F.lit(1)).alias("rows"))
    observed.write.mode("overwrite").parquet(
        os.path.join(tempfile.gettempdir(), "plc_obs_sink")
    )
    assert obs.get["rows"] == 30


@pytest.mark.parametrize("mode,expect_dups", [("append", True), ("idempotent", False)])
def test_micro_batch_sink_replay_semantics(spark, tmp_path, mode, expect_dups):
    """R15/R16: replaying a micro-batch duplicates rows in append mode
    (reference at-least-once parity) but not in idempotent mode. We
    simulate the replay by invoking the sink function twice with the same
    batch id — exactly what a post-crash re-execution does."""
    import plc_data_etl_pipeline_spark.pipeline.sink as sink_mod

    plc = K.finalize_plc_rows(G.generate_batch(spark, n_rows=20, partitions=1),
                              with_id=False)
    path = str(tmp_path / mode)

    def run_sink(batch_df, batch_id):
        if mode == "idempotent":
            batch_df.write.mode("overwrite").parquet(
                os.path.join(path, f"batch_id={batch_id}")
            )
        else:
            batch_df.write.mode("append").parquet(path)

    run_sink(plc, 0)
    run_sink(plc, 0)  # replay
    got = spark.read.parquet(path).count()
    assert got == (40 if expect_dups else 20)


def test_streaming_micro_batch_sink_end_to_end(spark, tmp_path):
    """R12: rate-source stream → foreachBatch parquet sink; rows arrive
    and are intact after a couple of triggers."""
    stream = G.generate_stream(spark, rows_per_second=50, partitions=2)
    out, ckpt = str(tmp_path / "data"), str(tmp_path / "ckpt")
    q = K.start_micro_batch_sink(stream, out, ckpt, trigger_seconds=1.0)
    try:
        deadline = time.time() + 30
        n = 0
        while time.time() < deadline:
            time.sleep(1.5)
            try:
                n = spark.read.parquet(out).count()
            except Exception:
                n = 0
            if n >= 50:
                break
        assert n >= 50, f"only {n} rows arrived"
        got = spark.read.parquet(out)
        assert set(got.columns) == {"machine_id", "sensor", "reading", "t_stamp"}
        assert got.filter(~F.col("machine_id").isin(*G.MACHINES)).count() == 0
    finally:
        q.stop()


def test_connector_option_shapes(spark):
    """Connector wrappers pin the reference's delivery configs (R5/R8/R14)
    even though no broker/DB exists in this container."""
    from plc_data_etl_pipeline_spark.pipeline import connectors as C

    sink = C.kafka_sink_options("b:9092", "plc_data")
    assert sink["kafka.enable.idempotence"] == "true"
    assert sink["kafka.acks"] == "all"
    assert sink["kafka.batch.size"] == "16384"
    src = C.kafka_source_options("b:9092", "plc_data")
    assert src["startingOffsets"] == "earliest"
    with pytest.raises(RuntimeError, match="spark-sql-kafka"):
        C.require_kafka_support(spark)


def test_upsert_parquet_merge_semantics(spark, tmp_path):
    """Upsert replaces matched keys, keeps others, and is idempotent —
    the exactly-once sink upgrade over the reference's blind append."""
    path = str(tmp_path / "upsert_target")
    v1 = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)], "id int, name string, v double"
    )
    K.upsert_parquet(v1, path, ["id"])
    assert spark.read.parquet(path).count() == 3

    v2 = spark.createDataFrame(
        [(2, "b2", 20.0), (4, "d", 4.0)], "id int, name string, v double"
    )
    K.upsert_parquet(v2, path, ["id"])
    got = {r.id: (r.name, r.v) for r in spark.read.parquet(path).collect()}
    assert got == {1: ("a", 1.0), 2: ("b2", 20.0), 3: ("c", 3.0), 4: ("d", 4.0)}

    # replay the same upsert -> unchanged (idempotent, unlike append)
    K.upsert_parquet(v2, path, ["id"])
    got2 = {r.id: (r.name, r.v) for r in spark.read.parquet(path).collect()}
    assert got2 == got


def test_run_batch_pipeline_end_to_end(spark, tmp_path):
    """One-call reference pipeline (batch): generator -> Avro wire ->
    decode -> finalize -> parquet; all rows survive the wire intact."""
    from plc_data_etl_pipeline_spark.pipeline import runner as R

    out = str(tmp_path / "plc_out")
    R.run_batch(spark, out, n_rows=60, partitions=3)
    got = spark.read.parquet(out)
    assert got.count() == 60
    assert set(got.columns) == {"machine_id", "sensor", "reading", "t_stamp", "id"}
    assert got.filter(~F.col("sensor").isin(*G.SENSORS)).count() == 0
    # appending a second run doubles rows (at-least-once append parity)
    R.run_batch(spark, out, n_rows=60, partitions=3)
    assert spark.read.parquet(out).count() == 120


def test_streaming_checkpoint_restart_no_reprocess(spark, tmp_path):
    """The checkpoint plays the reference's offset-commit role (R15):
    restarting a stopped file-source stream with the same checkpoint
    must NOT re-deliver already-committed batches."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    cols = "machine_id string, sensor string, reading double, t_stamp double"
    rows1 = [("M1", "temperature", float(i), float(i)) for i in range(30)]
    spark.createDataFrame(rows1, cols).coalesce(1).write.mode("overwrite").parquet(src)

    schema = spark.read.parquet(src).schema

    def start():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        return K.start_micro_batch_sink(stream, out, ckpt, trigger_seconds=0.5)

    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert spark.read.parquet(out).count() == 30

    # add a second file while stopped, then restart from the checkpoint
    rows2 = [("M2", "pressure", float(i), float(i)) for i in range(20)]
    spark.createDataFrame(rows2, cols).coalesce(1).write.mode("append").parquet(src)
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.read.parquet(out)
    assert got.count() == 50, "restart must process ONLY the new file"
    assert got.filter(F.col("machine_id") == "M1").count() == 30


# ---------------------------------------------------------------------------
# Schema-Registry stub (R4/R9 registry semantics)
# ---------------------------------------------------------------------------


def test_schema_registry_idempotent_registration():
    from plc_data_etl_pipeline_spark.pipeline.schema_registry import (
        SchemaRegistryStub,
    )

    reg = SchemaRegistryStub()
    sid1 = reg.register("plc_data-value", A.PLC_SCHEMA_JSON)
    sid2 = reg.register("plc_data-value", A.PLC_SCHEMA_JSON)
    assert sid1 == sid2 == 1
    assert reg.latest("plc_data-value").version == 1
    assert reg.schema_by_id(sid1).schema_json == A.PLC_SCHEMA_JSON

    evolved = A.PLC_SCHEMA_JSON.replace("PLCData", "PLCDataV2")
    sid3 = reg.register("plc_data-value", evolved)
    assert sid3 == 2
    assert reg.latest("plc_data-value").version == 2
    assert reg.schema_by_id(99) is None


def test_avro_decode_rejects_wrong_schema_id(spark):
    """A payload framed with a different registry id must NOT decode with
    this schema — it lands on the poison-pill/dead-letter path."""
    from plc_data_etl_pipeline_spark.pipeline.schema_registry import (
        SchemaRegistryStub,
    )

    reg = SchemaRegistryStub()
    good_id = reg.register("plc_data-value", A.PLC_SCHEMA_JSON)
    other_id = reg.register("other-value", A.PLC_SCHEMA_JSON.replace("PLCData", "Other"))
    assert good_id != other_id

    good = A.encode_record("m1", "temp", 21.5, 1.7e9, schema_id=good_id)
    wrong = A.encode_record("m2", "rpm", 900.0, 1.7e9, schema_id=other_id)
    df = spark.createDataFrame([(good,), (wrong,)], "value binary")
    out = df.select(
        A.avro_decode(F.col("value"), expected_schema_id=good_id).alias("rec")
    ).select("rec.*")
    rows = sorted(out.collect(), key=lambda r: (r.machine_id is None, r))
    assert rows[0].machine_id == "m1" and rows[0].reading == 21.5
    assert rows[1].machine_id is None  # wrong id -> NULL (dead-letter path)
    # id check off -> both decode (byte-compatible schemas)
    n_ok = (
        df.select(A.avro_decode(F.col("value"), expected_schema_id=None).alias("rec"))
        .filter(F.col("rec.machine_id").isNotNull())
        .count()
    )
    assert n_ok == 2


# ---------------------------------------------------------------------------
# JDBC executed coverage via embedded Derby (R14 — the reference's
# Postgres sink, consumer/sensor_data_consumer.py:124-138)
# ---------------------------------------------------------------------------


def test_jdbc_batched_append_roundtrip(spark, tmp_path):
    """R14: batched JDBC append + read-back through a real SQL database
    (Derby ships inside Spark — no server needed)."""
    from plc_data_etl_pipeline_spark.pipeline import connectors as C

    url = C.embedded_derby_url(str(tmp_path / "plcdb"))
    df = spark.createDataFrame(
        [("m1", "temp", 21.5, 1.7e9), ("m2", "rpm", 900.0, 1.7e9 + 1)],
        "machine_id string, sensor string, reading double, t_stamp double",
    )
    C.write_jdbc(df, url, "plc_data", batchsize=500, driver=C.DERBY_DRIVER)
    C.write_jdbc(df, url, "plc_data", batchsize=500, driver=C.DERBY_DRIVER)

    back = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", "plc_data")
        .option("driver", C.DERBY_DRIVER)
        .load()
    )
    assert back.count() == 4  # append mode accumulates (at-least-once sink)
    assert sorted(map(tuple, back.distinct().collect())) == [
        ("m1", "temp", 21.5, 1.7e9),
        ("m2", "rpm", 900.0, 1.7e9 + 1),
    ]
    # filter pushdown reaches the database (WHERE pushed into the scan)
    plan = (
        back.filter(F.col("sensor") == "temp")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PushedFilters" in plan and "sensor" in plan


def test_streaming_jdbc_micro_batch_sink(spark, tmp_path):
    """The reference consumer end-to-end, for real: streamed PLC records →
    Avro decode → batched JDBC insert per micro-batch → at-least-once
    (insert before checkpoint commit)."""
    from plc_data_etl_pipeline_spark.pipeline import connectors as C

    src = str(tmp_path / "src")
    n = 200
    records = G.generate_batch(spark, n_rows=n, partitions=4)
    encoded = records.select(
        A.avro_encode("machine_id", "sensor", "reading", "t_stamp").alias("value")
    )
    encoded.write.mode("overwrite").parquet(src)

    url = C.embedded_derby_url(str(tmp_path / "plcdb"))
    stream = (
        spark.readStream.schema("value binary")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    decoded = stream.select(A.avro_decode(F.col("value")).alias("rec")).select(
        "rec.*"
    )
    q = C.jdbc_micro_batch_sink(
        decoded,
        url,
        "plc_data",
        checkpoint=str(tmp_path / "ckpt"),
        batchsize=500,
        driver=C.DERBY_DRIVER,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    back = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", "plc_data")
        .option("driver", C.DERBY_DRIVER)
        .load()
    )
    assert back.count() == n
    assert back.filter(F.col("machine_id").isNull()).count() == 0


def test_csv_corrupt_record_modes(spark, tmp_path):
    """Malformed-source tolerance (the batch analog of the Avro
    poison-pill path): PERMISSIVE quarantines bad lines into
    _corrupt_record with every typed field null, DROPMALFORMED silently
    skips them, FAILFAST raises — the three documented contracts."""
    p = tmp_path / "mixed.csv"
    p.write_text(
        "machine_id,temperature\n"
        "m1,20.5\n"
        "m2,not_a_number\n"
        "m3,30.25\n"
    )
    schema = "machine_id string, temperature double, _corrupt_record string"
    permissive = (
        spark.read.option("header", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .schema(schema)
        .csv(str(p))
        .cache()
    )
    good = permissive.filter(F.col("_corrupt_record").isNull()).collect()
    bad = permissive.filter(F.col("_corrupt_record").isNotNull()).collect()
    assert {r["machine_id"] for r in good} == {"m1", "m3"}
    assert len(bad) == 1 and bad[0]["temperature"] is None
    assert "not_a_number" in bad[0]["_corrupt_record"]

    dropped = (
        spark.read.option("header", True)
        .option("mode", "DROPMALFORMED")
        .schema("machine_id string, temperature double")
        .csv(str(p))
        .collect()
    )
    assert {r["machine_id"] for r in dropped} == {"m1", "m3"}

    with pytest.raises(Exception):
        (
            spark.read.option("header", True)
            .option("mode", "FAILFAST")
            .schema("machine_id string, temperature double")
            .csv(str(p))
            .collect()
        )


def test_task_retry_recovers_from_transient_failure(tmp_path):
    """Fault tolerance at the task level: a transient failure on the
    first attempt of one partition (worker OOM-kill, flaky NFS, spot
    preemption at cluster scale) must be retried and the job must
    complete with full, non-duplicated results. Needs its own
    SparkContext (master local[2,2] = maxFailures 2), so it runs in a
    subprocess rather than the shared session."""
    import subprocess
    import sys as _sys

    script = r"""
import sys
from pyspark.sql import SparkSession
from pyspark import TaskContext

spark = (SparkSession.builder.master("local[2,2]")
         .config("spark.sql.shuffle.partitions", "2")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

def flaky(batches):
    tc = TaskContext.get()
    if tc.partitionId() == 0 and tc.attemptNumber() == 0:
        raise RuntimeError("transient failure (injected)")
    for b in batches:
        yield b

df = spark.range(0, 1000, 1, 4).mapInPandas(flaky, "id long")
rows = sorted(r["id"] for r in df.collect())
assert rows == list(range(1000)), (len(rows), rows[:5])
print("RETRY_OK", len(rows))
"""
    r = subprocess.run(
        [_sys.executable, "-c", script], capture_output=True, text=True,
        timeout=180,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "RETRY_OK 1000" in r.stdout


def test_plc_end_to_end_conservation(spark):
    """The reference's received==flushed invariant over the composed
    end-to-end query: every generated row survives encode→decode→sink,
    and the group counts partition the total exactly."""
    from plc_data_etl_pipeline_spark.registry import all_queries

    rows = all_queries()["plc_pipeline_end_to_end"].fn(spark, "").collect()
    assert sum(r["n_readings"] for r in rows) == 2000
    machines = {r["machine_id"] for r in rows}
    sensors = {r["sensor"] for r in rows}
    assert machines <= {"M1", "M2", "M3"} and sensors <= {
        "temperature", "pressure", "vibration"
    }
    assert all(0.0 <= r["avg_reading"] <= 100.0 for r in rows)


def test_socket_transport_avro_pipeline_end_to_end(spark, tmp_path):
    """R5/R8's closest EXECUTABLE form in this environment: the broker
    socket itself cannot exist here (0 kafka jars — re-verified every
    round), but the wire path is real TCP via Spark's built-in socket
    source. A producer thread streams base64(Avro-framed record) lines
    — including one corrupt payload and one wrong-schema-id record —
    over a live socket; the streaming query decodes with the production
    codec, dead-letters the undecodables, and appends good rows. Every
    good record must round-trip byte-exactly (double bit patterns
    included) and both poison pills must land in the dead letter, so
    the full produce->transport->decode->sink chain is executed, not
    just its option surface."""
    import base64
    import socket
    import threading

    n_good = 200
    records = [
        (f"m{i % 8}", ("temperature", "pressure")[i % 2], i * 0.5 + 0.25,
         1_700_000_000.0 + i)
        for i in range(n_good)
    ]
    lines = [
        base64.b64encode(A.encode_record(*r)) + b"\n" for r in records
    ]
    # poison pills: corrupt bytes + a valid record under a WRONG schema id
    lines.insert(50, base64.b64encode(b"\x00garbage-not-avro") + b"\n")
    wrong_id = A.encode_record("mX", "temperature", 1.0, 1.0,
                               schema_id=A.SCHEMA_ID + 7)
    lines.insert(100, base64.b64encode(wrong_id) + b"\n")

    server = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    server.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    server.bind(("127.0.0.1", 0))
    server.listen(1)
    port = server.getsockname()[1]
    stop = threading.Event()

    def serve():
        conn, _ = server.accept()
        with conn:
            conn.sendall(b"".join(lines))
            stop.wait(30)  # hold the connection until the query is done

    t = threading.Thread(target=serve, daemon=True)
    t.start()

    raw = (
        spark.readStream.format("socket")
        .option("host", "127.0.0.1")
        .option("port", port)
        .load()
    )
    decoded = raw.select(
        A.avro_decode(F.unbase64(F.col("value"))).alias("d")
    ).select("d.*")
    out = str(tmp_path / "good")
    dead = str(tmp_path / "dead")
    q = K.start_micro_batch_sink(
        decoded,
        out,
        str(tmp_path / "ckpt"),
        mode="append",
        trigger_seconds=0.5,
        dead_letter_path=dead,
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            q.processAllAvailable()
            done = os.path.exists(out) and (
                spark.read.parquet(out).count() >= n_good
            )
            if done:
                break
            time.sleep(0.5)
    finally:
        stop.set()
        q.stop()
        server.close()

    good = spark.read.parquet(out)
    got = sorted(
        (r["machine_id"], r["sensor"], r["reading"], r["t_stamp"])
        for r in good.collect()
    )
    assert got == sorted(records)  # byte-exact round trip over the wire
    dead_rows = spark.read.parquet(dead).count()
    assert dead_rows == 2  # corrupt payload + wrong-schema-id record
