"""Seeded chaos over the queue/Kafka ingestion loop: random
interleavings of produce, drain, crash-shaped consumer-offset rollback
and broker restart must leave the table EXACTLY equal to the produced
stream (chaos_test.rs's seeded-sequence spirit applied to the transport;
the drain loop's per-message replay floor is what makes rollback +
concurrent produce safe — see AvroQueueIngestor.drain_once).

This suite exists because the batch-level LSN check alone was proven
insufficient: a rollback followed by new produces merged applied and
fresh messages into one batch whose LSN cleared the floor, duplicating
the applied prefix. Seed-driven sequences explore exactly those
interleavings."""

import random

import pytest

from moonlink_spark.sources.avro_binary import encode_datum
from moonlink_spark.sources.kafka_wire import (
    KafkaWireBroker,
    KafkaWireConsumer,
    KafkaWireProducer,
)
from moonlink_spark.sources.queue import (
    AvroQueueIngestor,
    FileQueueConsumer,
    FileQueueProducer,
)
from moonlink_spark.table.identity import IdentityProp
from moonlink_spark.table.table import MoonlinkTable

SCHEMA = {
    "type": "record",
    "name": "e",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "v", "type": "string"},
    ],
}

FIELDS = [
    {"name": "id", "data_type": "int64", "nullable": False},
    {"name": "v", "data_type": "string"},
]


def _drive(spark, tmp_path, seed: int, wire: bool) -> None:
    """One seeded sequence; on failure the pytest parametrization names
    the seed, which replays the sequence deterministically."""
    rng = random.Random(seed)
    produced = 0  # ids 0..produced-1 are on the queue, exactly once
    t = MoonlinkTable.create(
        spark, str(tmp_path / "t"), FIELDS, IdentityProp.single("id")
    )

    broker = None
    if wire:
        logs = str(tmp_path / "logs")
        broker = KafkaWireBroker(logs).start()

        def produce(n):
            prod = KafkaWireProducer(broker.host, broker.port)
            prod.send(
                "ev",
                [
                    (
                        str(i).encode(),
                        encode_datum(SCHEMA, {"id": i, "v": f"v{i}"}),
                    )
                    for i in range(produced, produced + n)
                ],
            )
            prod.close()

        def consumer():
            return KafkaWireConsumer(
                broker.host, broker.port, "ev", group="chaos"
            )

    else:
        qdir = str(tmp_path / "q")

        def produce(n):
            p = FileQueueProducer(qdir)
            for i in range(produced, produced + n):
                p.send(encode_datum(SCHEMA, {"id": i, "v": f"v{i}"}))
            p.close()

        def consumer():
            return FileQueueConsumer(qdir, group="chaos")

    ing = AvroQueueIngestor(t, consumer(), SCHEMA)
    try:
        for _ in range(rng.randrange(12, 25)):
            op = rng.random()
            if op < 0.45:
                n = rng.randrange(1, 15)
                produce(n)
                produced += n
            elif op < 0.75:
                ing.drain_once(max_messages=rng.choice([3, 10, 1_000_000]))
            elif op < 0.9:
                # crash between table commit and offset commit: the
                # consumer group position rolls back to an arbitrary
                # earlier point (possibly 0)
                back = rng.randrange(0, max(1, ing.consumer.committed + 1))
                ing.consumer.commit(back)
            elif wire:
                # broker restart: same logs, fresh listener; the
                # ingestor's consumer reconnects on the next drain
                broker.stop()
                broker = KafkaWireBroker(logs).start()
                ing = AvroQueueIngestor(
                    t,
                    KafkaWireConsumer(
                        broker.host, broker.port, "ev", group="chaos"
                    ),
                    SCHEMA,
                )
        # settle: drain until empty, then the table must hold the
        # produced stream exactly once
        while ing.drain_once(max_messages=1_000_000)["messages"] > 0:
            pass
        got = sorted(r["id"] for r in t.scan().collect())
        assert got == list(range(produced)), (
            f"seed {seed} wire={wire}: table holds {len(got)} rows "
            f"for {produced} produced (dups or losses at "
            f"{[i for i in got if got.count(i) > 1][:5]}...)"
        )
    finally:
        if broker is not None:
            broker.stop()


@pytest.mark.parametrize("seed", [11, 23, 37, 59, 71])
def test_file_queue_ingest_chaos(spark, tmp_path, seed):
    _drive(spark, tmp_path, seed, wire=False)


@pytest.mark.parametrize("seed", [13, 29, 43])
def test_kafka_wire_ingest_chaos(spark, tmp_path, seed):
    _drive(spark, tmp_path, seed, wire=True)
