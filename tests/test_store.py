"""Versioned document store (sources/store.py): snapshot isolation,
time travel, append/upsert commits, atomic manifest, vacuum."""

from __future__ import annotations

import pytest

from bd_spark.sources.store import VersionedStore


@pytest.fixture()
def store(spark, tmp_path):
    return VersionedStore(spark, str(tmp_path / "store"))


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_overwrite_append_upsert_history(spark, store):
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "val"])
    v0 = store.write(df1)
    assert v0 == 0 and store.current_version() == 0
    assert _rows(store.read()) == [(1, "a"), (2, "b")]

    v1 = store.write(spark.createDataFrame([(3, "c")], ["id", "val"]),
                     mode="append")
    assert v1 == 1
    assert _rows(store.read()) == [(1, "a"), (2, "b"), (3, "c")]

    v2 = store.write(
        spark.createDataFrame([(2, "B2"), (4, "d")], ["id", "val"]),
        mode="upsert", key="id",
    )
    assert v2 == 2
    assert _rows(store.read()) == [(1, "a"), (2, "B2"), (3, "c"), (4, "d")]
    assert [e["mode"] for e in store.history()] == [
        "overwrite", "append", "upsert"
    ]


def test_time_travel_snapshot_isolation(spark, store):
    store.write(spark.createDataFrame([(1, "a")], ["id", "val"]))
    # a reader holding the v0 snapshot...
    old = store.read(version=0)
    store.write(spark.createDataFrame([(1, "CHANGED")], ["id", "val"]))
    # ...still sees v0 AFTER the new commit (immutable data dirs)
    assert _rows(old) == [(1, "a")]
    assert _rows(store.read(version=0)) == [(1, "a")]
    assert _rows(store.read()) == [(1, "CHANGED")]
    with pytest.raises(ValueError):
        store.read(version=99)


def test_vacuum_keeps_current_and_window(spark, store):
    for i in range(4):
        store.write(spark.createDataFrame([(i, "x")], ["id", "val"]))
    dropped = store.vacuum(keep=2)
    assert dropped == [0, 1]
    assert store.current_version() == 3
    assert _rows(store.read(version=2)) == [(2, "x")]
    with pytest.raises(ValueError):
        store.read(version=0)


def test_vacuum_keeping_explicit_references(spark, store):
    """vacuum_keeping (ADVICE r10): retention by an EXPLICIT
    referenced-version set — an orphan newer version (e.g. left by a
    crash between a sub-store write and a parent manifest commit)
    must be dropped while an older but still-referenced version
    survives; count-based vacuum would do the opposite."""
    for i in range(4):  # versions 0..3; pretend a parent references 0, 3
        store.write(spark.createDataFrame([(i, "x")], ["id", "val"]))
    dropped = store.vacuum_keeping({0, 3})
    assert sorted(dropped) == [1, 2]
    assert _rows(store.read(version=0)) == [(0, "x")]
    assert _rows(store.read(version=3)) == [(3, "x")]
    with pytest.raises(ValueError):
        store.read(version=1)
    # the current version is always kept even when not referenced
    dropped = store.vacuum_keeping(set())
    assert sorted(dropped) == [0]
    assert _rows(store.read()) == [(3, "x")]


def test_streaming_ingest_commits_versions(spark, store, tmp_path):
    """Streaming -> store integration: a foreachBatch sink commits
    one append version per microbatch, so the store's history IS the
    ingest log and any intermediate snapshot stays time-travelable —
    the shape of a production 'bronze' ingest."""
    import json

    src = tmp_path / "in"
    src.mkdir()
    for b in range(3):
        with open(src / f"b{b}.jsonl", "w") as f:
            for i in range(5):
                f.write(json.dumps({"id": b * 5 + i, "batch": b}) + "\n")

    stream = (
        spark.readStream.schema("id long, batch long")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda df, epoch: store.write(df, mode="append")
        )
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination()
    q.stop()
    assert store.current_version() == 2
    assert store.read().count() == 15
    # each retained snapshot is a consistent prefix of the ingest
    sizes = sorted(store.read(version=v).count() for v in range(3))
    assert sizes == [5, 10, 15]


def test_empty_store_read_raises(spark, store):
    with pytest.raises(FileNotFoundError):
        store.read()


def test_upsert_requires_key(spark, store):
    store.write(spark.createDataFrame([(1, "a")], ["id", "val"]))
    with pytest.raises(ValueError):
        store.write(spark.createDataFrame([(1, "b")], ["id", "val"]),
                    mode="upsert")
