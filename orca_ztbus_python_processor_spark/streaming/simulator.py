"""Streaming window-trigger generation — the reference simulator
re-expressed as a Structured Streaming source (SURVEY.md §3 EP1).

The reference drives a wall-clock scheduler (1 tick/s), advances a
persisted event-time cursor by 60 s per tick, and emits an EveryMinute
window event over gRPC (``simulator/main.py:85-133``). Here:

  - the ``rate`` source provides the tick stream (1 row/s, value = n);
  - a stateless projection turns tick n into the window
    ``[epoch + n*60s, epoch + (n+1)*60s)`` — the 60x replay factor is
    a parameter (``simulator/main.py:87,93``);
  - the checkpoint directory replaces the ``sim_logs`` cursor table
    (``simulator/main.py:23-33,84-101``): on restart the rate source
    resumes from its committed offset, so window emission continues
    where it left off (ST6) with exactly-once semantics.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Bootstrap epoch: earliest time both buses are active
# (reference simulator/main.py:85-87).
DEFAULT_EPOCH = dt.datetime(2021, 3, 9, 14, 15, 0)


def ticks_to_windows(
    ticks: DataFrame,
    epoch: dt.datetime = DEFAULT_EPOCH,
    step_seconds: int = 60,
    name: str = "EveryMinute",
    version: str = "1.0.0",
    origin: str = "simulator",
) -> DataFrame:
    """Pure projection: tick number -> window event row (WINDOW_EVENT
    schema sans metadata). Works on both batch and streaming frames."""
    base = F.lit(epoch)
    return ticks.select(
        (base + F.make_interval(secs=F.col("value") * step_seconds)).alias("time_from"),
        (base + F.make_interval(secs=(F.col("value") + 1) * step_seconds)).alias("time_to"),
        F.lit(name).alias("name"),
        F.lit(version).alias("version"),
        F.lit(origin).alias("origin"),
    )


def window_trigger_stream(
    spark: SparkSession,
    epoch: dt.datetime = DEFAULT_EPOCH,
    ticks_per_second: int = 1,
    step_seconds: int = 60,
) -> DataFrame:
    """The EveryMinute trigger stream: 1 wall-clock tick advances event
    time by ``step_seconds`` (60x replay at the defaults, ST7)."""
    ticks = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", ticks_per_second)
        .load()
        .select("value")
    )
    return ticks_to_windows(ticks, epoch, step_seconds)
