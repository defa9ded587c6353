"""Scale-derived Spark tuning: one place that turns "how much data"
into the IO/shuffle knobs that decide whether a plan survives 100 TB.

The reference sizes its mem-slice, file-target and compaction thresholds
from config (``mooncake_table_config.rs:152-166``); the Spark-side
equivalents are session configs. These heuristics are deliberately
simple and documented so a deployment can override any of them — the
point is that partition counts scale with DATA, not with whatever the
session default happened to be:

- ``spark.sql.shuffle.partitions``: target ~``SHUFFLE_TARGET_BYTES``
  per post-shuffle partition. At 100 TB with the default 200 MiB target
  that is ~500k mapper-side partitions — far beyond the fixed default
  of 200, which would put 500 GiB in each reducer and spill to death.
  AQE coalesces small partitions back down at runtime, so oversizing is
  cheap and undersizing is fatal: round UP.
- ``spark.sql.files.maxPartitionBytes``: split threshold for scan
  tasks; 128 MiB keeps a scan task's working set inside a typical
  executor-core memory slice. Raised only for small-file-heavy layouts.
- AQE on, with skew-join splitting: runtime re-plan absorbs the skew
  the static heuristics cannot see.
- broadcast threshold: bounded by driver memory, NOT data scale — kept
  at a fixed safe value; per-join ``F.broadcast`` hints in the
  operators stay authoritative for dimension tables.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

SHUFFLE_TARGET_BYTES = 200 * 1024 * 1024   # per post-shuffle partition
SCAN_SPLIT_BYTES = 128 * 1024 * 1024       # per scan task
MIN_SHUFFLE_PARTITIONS = 32
MAX_SHUFFLE_PARTITIONS = 500_000           # ~100 TB / 200 MiB


def shuffle_partitions_for(total_bytes: int) -> int:
    """Post-shuffle partition count for a given input scale."""
    want = -(-int(total_bytes) // SHUFFLE_TARGET_BYTES)  # ceil
    return max(MIN_SHUFFLE_PARTITIONS, min(MAX_SHUFFLE_PARTITIONS, want))


def scale_configs(total_bytes: int) -> dict[str, str]:
    """The config set for one scale point (inspectable, testable)."""
    return {
        "spark.sql.shuffle.partitions": str(shuffle_partitions_for(total_bytes)),
        "spark.sql.files.maxPartitionBytes": str(SCAN_SPLIT_BYTES),
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        # runtime shuffle-partition floor: let AQE coalesce freely
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": str(
            SHUFFLE_TARGET_BYTES // 2
        ),
    }


def configure_for_scale(spark: SparkSession, total_bytes: int) -> dict[str, str]:
    """Apply the scale configs to the session; returns what was set."""
    cfgs = scale_configs(total_bytes)
    for k, v in cfgs.items():
        spark.conf.set(k, v)
    return cfgs


def dataset_bytes(sf_dir: str) -> int:
    """Total parquet bytes under an sf dir (driver-side listing — a real
    deployment passes the catalog's size estimate instead)."""
    import os

    total = 0
    for root, _dirs, files in os.walk(sf_dir):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    return total
