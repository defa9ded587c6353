"""Seeded chaos harness with replayable dumps (chaos_test.rs +
chaos_replay.rs parity — see moonlink_spark/chaos.py).

Each entry runs N seeds of randomized event sequences over the full
table surface; any invariant failure produces a JSONL dump replayable
via scripts/chaos_replay.py. One scenario runs the control plane over
the in-memory object store with periodic fault injection; one validates
every force-snapshot against the persisted Iceberg export via DuckDB."""

import json

import pytest

from moonlink_spark.chaos import ChaosFailure, replay, run_chaos


@pytest.mark.parametrize("seed", [7, 101])
def test_chaos_seeded_default_table(spark, tmp_path, seed):
    """Key-identity table, streaming + non-streaming txns, maintenance,
    Iceberg force-snapshot validation."""
    s = run_chaos(
        spark,
        str(tmp_path / f"c{seed}"),
        seed=seed,
        n_events=90,
        table_option="none",
    )
    assert s["executed"] >= 90
    assert s["validated_reads"] >= 1
    assert s["final_rows"] > 0


def test_chaos_seeded_upsert_table(spark, tmp_path):
    """Upsert / delete-if-exists variant (no streaming txns)."""
    s = run_chaos(
        spark,
        str(tmp_path / "cu"),
        seed=23,
        n_events=80,
        table_option="upsert",
    )
    assert s["executed"] >= 80


def test_chaos_seeded_append_only_with_alter(spark, tmp_path):
    """Append-only variant, with mid-run schema alters."""
    s = run_chaos(
        spark,
        str(tmp_path / "ca"),
        seed=5,
        n_events=70,
        table_option="append_only",
        with_alter=True,
    )
    assert s["executed"] >= 70
    assert s["final_rows"] > 0


def test_chaos_with_object_store_fault_injection(spark, tmp_path):
    """Control plane over mem:// with a TransientStoreError injected every
    7 accessor calls: the retry layer must absorb every injection with no
    observable difference (accessor chaos-wrapper parity)."""
    s = run_chaos(
        spark,
        str(tmp_path / "cf"),
        seed=31,
        n_events=60,
        table_option="none",
        key_index=True,
        chaos_every=7,
        with_iceberg=False,  # export reads the control plane heavily;
        # covered by the local-fs scenarios above
    )
    assert s["executed"] >= 60
    assert s["chaos_injected"] > 0  # faults actually fired


def test_chaos_dump_replays_clean_run(spark, tmp_path):
    """A dump from a green run replays to the same final state."""
    s = run_chaos(
        spark,
        str(tmp_path / "orig"),
        seed=77,
        n_events=50,
        table_option="none",
        with_iceberg=False,
    )
    r = replay(spark, s["dump_path"], str(tmp_path / "replayed"))
    assert r["executed"] == s["executed"]
    assert r["final_rows"] == s["final_rows"]
    assert r["validated_reads"] == s["validated_reads"]


def test_chaos_replay_reproduces_failure(spark, tmp_path):
    """The replay CLI's contract, proven on an intentionally-broken dump:
    corrupt a recorded event so the replayed sequence violates the model,
    and the replay must fail with the divergence (not silently pass)."""
    s = run_chaos(
        spark,
        str(tmp_path / "orig"),
        seed=13,
        n_events=40,
        table_option="none",
        with_iceberg=False,
    )
    lines = open(s["dump_path"]).read().splitlines()
    # break the dump: drop one committed append so the table diverges
    # from the model the replay rebuilds
    broken = []
    dropped = False
    for ln in lines:
        ev = json.loads(ln)
        if not dropped and ev.get("kind") == "append":
            # keep the model transition but skip the table write by
            # rewriting the append into a delete of a nonexistent row —
            # an invariant violation the replay must surface
            ev = {"kind": "read_snapshot", "lsn": None}
            dropped = True
        broken.append(json.dumps(ev))
    assert dropped
    broken_path = str(tmp_path / "broken.jsonl")
    with open(broken_path, "w") as fh:
        fh.write("\n".join(broken) + "\n")
    # the divergence surfaces either as a model-vs-table assertion at a
    # read point or as a strict-delete targeting error (IdentityError) —
    # either way the replay must FAIL, not silently pass
    with pytest.raises(Exception, match="delete keys matched no row|read@|diverged"):
        replay(spark, broken_path, str(tmp_path / "replayed"))


def test_chaos_failure_writes_replayable_dump(spark, tmp_path, monkeypatch):
    """When an invariant breaks mid-run, run_chaos dumps the sequence and
    raises ChaosFailure pointing at it; the dump carries the failure
    marker."""
    import moonlink_spark.chaos as chaos_mod

    orig = chaos_mod.ChaosRunner._check_read

    def sabotage(self, lsn):
        # inject a wrong expectation at the first read validation
        if lsn is not None:
            self.model.snapshots[lsn] = [-1]
        return orig(self, lsn)

    monkeypatch.setattr(chaos_mod.ChaosRunner, "_check_read", sabotage)
    with pytest.raises(ChaosFailure) as ei:
        run_chaos(
            spark,
            str(tmp_path / "fail"),
            seed=7,
            n_events=90,
            table_option="none",
            with_iceberg=False,
        )
    dump = ei.value.dump_path
    lines = [json.loads(ln) for ln in open(dump)]
    assert lines[0]["meta"]["seed"] == 7
    assert lines[-1]["kind"] == "__failure__"
    assert "read@" in lines[-1]["error"]


@pytest.mark.parametrize("transport", ["s3", "gcs"])
def test_chaos_seeded_over_wire_transports(spark, tmp_path, transport):
    """The seeded harness with the control plane on a WIRE transport —
    S3 REST (SigV4-signed) or GCS JSON API (bearer-authenticated) — with
    server-side throttling (503 SlowDown / 429 rateLimitExceeded) every
    9 calls: the retry layer absorbs every throttle with no observable
    difference, and the dump stays replayable on a local directory."""
    s = run_chaos(
        spark,
        str(tmp_path / f"cw-{transport}"),
        seed=13,
        n_events=50,
        table_option="none",
        transport=transport,
        chaos_every=9,
        with_iceberg=False,
    )
    assert s["executed"] >= 50
    assert s["transport_throttled"] > 0  # throttles actually fired
    # transport-independent replay: the dump re-executes on local fs
    r = replay(spark, s["dump_path"], str(tmp_path / f"rp-{transport}"))
    assert r["final_rows"] == s["final_rows"]


def test_chaos_with_kafka_wire_ingest_leg(spark, tmp_path):
    """Chaos over the s3 transport WHILE a Kafka-wire ingest leg runs in
    the loop: a broker (with connection drops every 11 requests) feeds a
    second table via the ticker-driven group drain as chaos events
    execute; at the end the chaos invariants hold AND the kafka table
    equals exactly the produced set — transport faults on both legs,
    no loss, no dup."""
    import os as _os
    import threading as _t

    from moonlink_spark.sources.avro_binary import encode_datum
    from moonlink_spark.sources.kafka_wire import (
        KafkaWireBroker,
        KafkaWireConsumer,
        KafkaWireProducer,
    )
    from moonlink_spark.sources.queue import AvroQueueIngestor
    from moonlink_spark.table.identity import IdentityProp
    from moonlink_spark.table.table import MoonlinkTable

    schema = {
        "type": "record",
        "name": "ev",
        "fields": [{"name": "id", "type": "long"},
                   {"name": "v", "type": "string"}],
    }
    broker = KafkaWireBroker(
        str(tmp_path / "klogs"), drop_every=11
    ).start()
    kt = MoonlinkTable.create(
        spark, str(tmp_path / "ktable"),
        [{"name": "id", "data_type": "int64", "nullable": False},
         {"name": "v", "data_type": "string"}],
        IdentityProp.single("id"),
    )
    stop = _t.Event()
    produced = []

    def feeder():
        prod = KafkaWireProducer(broker.host, broker.port, at_least_once=True)
        i = 0
        while not stop.is_set() and i < 300:
            batch = [(None, encode_datum(schema, {"id": i + j, "v": f"k{i+j}"}))
                     for j in range(20)]
            prod.send("leg", batch)
            produced.extend(range(i, i + 20))
            i += 20
        prod.close()

    cons = KafkaWireConsumer(broker.host, broker.port, "leg", group="chaosleg")
    ing = AvroQueueIngestor(kt, cons, schema)
    th = _t.Thread(target=feeder)
    th.start()
    drains = {"n": 0}

    def drain_loop():
        while not stop.is_set():
            ing.drain_once()
            drains["n"] += 1

    dr = _t.Thread(target=drain_loop)
    dr.start()
    try:
        s = run_chaos(
            spark,
            str(tmp_path / "ck"),
            seed=41,
            n_events=40,
            table_option="none",
            transport="s3",
            chaos_every=9,
            with_iceberg=False,
        )
        th.join(timeout=30)
    finally:
        stop.set()
        dr.join(timeout=30)
        ing.drain_once()  # final catch-up
        cons.close()
        broker.stop()
    assert s["executed"] >= 40
    assert broker.dropped > 0  # kafka-leg faults actually fired
    got = {r["id"] for r in kt.scan().collect()}
    assert got == set(produced) and len(got) == 300
    assert kt.scan().count() == 300  # no dup rows either
