"""interval_join golden semantics: inclusivity at both ends, left join
nulls, bin-boundary straddling, and the no-nested-loop plan guarantee."""

from __future__ import annotations

import datetime as dt
import re

import pandas as pd

from orca_ztbus_python_processor_spark.operators.intervaljoin import interval_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _fixture(spark):
    points = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": [1, 1, 1, 1, 2],
                "t": [
                    _ts("2024-01-01 00:00:30"),  # inside iv A
                    _ts("2024-01-01 00:01:00"),  # == iv A end (inclusive)
                    _ts("2024-01-01 00:05:00"),  # in no interval
                    _ts("2024-01-01 00:09:59"),  # inside iv B (straddles bins)
                    _ts("2024-01-01 00:00:30"),  # right key-2 interval
                ],
                "pid": [1, 2, 3, 4, 5],
            }
        )
    )
    intervals = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": [1, 1, 2],
                "s": [
                    _ts("2024-01-01 00:00:10"),
                    _ts("2024-01-01 00:08:30"),  # iv B: straddles minute bins
                    _ts("2024-01-01 00:00:00"),
                ],
                "e": [
                    _ts("2024-01-01 00:01:00"),
                    _ts("2024-01-01 00:10:30"),
                    _ts("2024-01-01 00:00:45"),
                ],
                "iv": ["A", "B", "C"],
            }
        )
    )
    return points, intervals


def test_interval_join_inner(spark):
    points, intervals = _fixture(spark)
    got = {
        (r["pid"], r["iv"])
        for r in interval_join(points, intervals, "k", "t", "s", "e").collect()
    }
    assert got == {(1, "A"), (2, "A"), (4, "B"), (5, "C")}


def test_interval_join_left(spark):
    points, intervals = _fixture(spark)
    out = interval_join(points, intervals, "k", "t", "s", "e", how="left").collect()
    by_pid = {}
    for r in out:
        by_pid.setdefault(r["pid"], []).append(r["iv"])
    assert by_pid[3] == [None]  # unmatched point kept with NULL interval
    assert by_pid[1] == ["A"]
    assert len(out) == 5


def test_interval_join_plan_is_equi(spark):
    points, intervals = _fixture(spark)
    df = interval_join(points, intervals, "k", "t", "s", "e")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = df._jdf.queryExecution().explainString(mode)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert re.search(r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)", plan), plan
