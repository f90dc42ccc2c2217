"""Document-stream sources and sinks (reference §2.1 parity, Spark-first).

The reference's only source is a single-threaded incremental reader of
concatenated JSON documents (`Jsons`, json.rs:123-160) and its only
sink is the canonical `Display` serializer (json.rs:568-609). Here:

  - ``read_jsonl``  — the SCALE path: ``spark.read.text`` (splittable,
    distributed, predicate-pushdown-friendly) + ``try_parse_json``
    into a VARIANT document stream; malformed lines become in-band
    error entries, mirroring the reference's error-as-data model
    (entry.rs:30-32) and Spark's PERMISSIVE mode.
  - ``read_json_concat`` — the PARITY path: whole-file text +
    ``mapInPandas`` over the lenient incremental parser for inputs
    that are *not* line-delimited (docs spanning lines, several per
    line, lenient numbers). Parallel across files, serial within one
    file — exactly the constraint of non-splittable concatenated JSON.
  - ``write_canonical`` / ``canonical_lines`` — canonical text sink:
    key-sorted objects, ``{:e}`` floats, reference escape table.

Document-stream schema everywhere: ``(seq BIGINT, ord ARRAY<BIGINT>,
v VARIANT, err STRING)`` (bd_spark.jsonq.runtime).
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bd_spark.jsonq.canonical import canonicalize
from bd_spark.sources.lenient_json import JsonParseError, parse_value, _skip_ws

_STREAM_SCHEMA = "seq long, ord array<long>, v variant, err string"


def read_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """JSON-Lines → document stream; one doc per line, JVM-side parse.

    ``seq`` is monotonically increasing in file order (text splits
    preserve intra-file line order; ids are increasing per partition),
    so downstream ``orderBy(seq)`` reproduces input order.
    """
    raw = spark.read.text(path)
    df = raw.where(F.trim("value") != "").select(
        F.monotonically_increasing_id().alias("seq"),
        F.col("value").alias("doc_text"),
    )
    v = F.try_parse_json("doc_text")
    err = F.when(v.isNull(), F.concat(F.lit("parse error: "), F.col("doc_text")))
    return df.select(
        "seq",
        F.array().cast("array<long>").alias("ord"),
        F.when(err.isNotNull(), F.parse_json(F.lit("null"))).otherwise(v).alias("v"),
        err.alias("err"),
    )


def read_json_concat(spark: SparkSession, path: str) -> DataFrame:
    """Concatenated / multi-line JSON documents → document stream.

    One whole file per row (non-splittable by construction), lenient
    incremental parse in Arrow-batched Python, re-serialized to strict
    JSON for the VARIANT column. Files parse in parallel; ``seq``
    orders by (file, position-in-file).
    """
    raw = spark.read.text(path, wholetext=True).select(
        F.input_file_name().alias("file"), "value"
    )

    def split_docs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for file, text in zip(pdf["file"], pdf["value"]):
                for idx, (doc_json, err) in enumerate(_parse_concat(text)):
                    rows.append((file, idx, doc_json, err))
            yield pd.DataFrame(
                rows, columns=["file", "idx", "doc_json", "err"]
            )

    docs = raw.mapInPandas(
        split_docs, "file string, idx long, doc_json string, err string"
    )
    return docs.select(
        F.dense_rank().over(Window.orderBy("file")).cast("long").alias("_f"),
        "idx", "doc_json", "err",
    ).select(
        (F.col("_f") * F.lit(1 << 32) + F.col("idx")).alias("seq"),
        F.array().cast("array<long>").alias("ord"),
        F.parse_json(F.coalesce("doc_json", F.lit("null"))).alias("v"),
        "err",
    )


def _parse_concat(text: str) -> list[tuple[str | None, str | None]]:
    """(strict_json, err) per document in a concatenated-doc text."""
    out: list[tuple[str | None, str | None]] = []
    pos = _skip_ws(text, 0)
    while pos < len(text):
        try:
            val, pos = parse_value(text, pos)
            out.append((json.dumps(val, ensure_ascii=False), None))
        except JsonParseError as e:
            out.append((None, f"parse error: {e}"))
            break  # cannot resynchronize mid-stream, like the reference
        except ValueError:  # Incomplete at EOF: bare number/literal tail
            from bd_spark.sources.lenient_json import _finalize_tail

            try:
                val, pos = _finalize_tail(text, pos)
                out.append((json.dumps(val, ensure_ascii=False), None))
            except JsonParseError as e:
                out.append((None, f"parse error: {e}"))
                break
        pos = _skip_ws(text, pos)
    return out


# ---------------------------------------------------------------- sinks

# A row needs the Python canonicalizer when its JVM-serialized form
# contains (a) a float literal — the reference's `{:e}` format differs
# from Jackson's — or (b) a \uXXXX escape — Jackson uppercases the hex
# where the reference lowercases it.  The regex over-matches (a string
# VALUE containing "1.5" also trips it), which only costs that row the
# slow path — conservative, never wrong.
_NEEDS_PY_RE = r"[0-9]\.[0-9]|[0-9][eE][-+0-9]|\\u"


def canonical_text(df: DataFrame) -> DataFrame:
    """Document stream → ``(seq, ord, line STRING)`` canonical text.

    JVM FAST PATH: Spark's VARIANT binary form stores object fields
    key-sorted, so ``to_json(v)`` already emits the reference's
    canonical bytes (sorted keys, compact separators, `/` unescaped,
    non-ASCII literal — verified against the 52-case golden corpus)
    for every document with no float and no control-char escape.
    Those rows pass through untouched; only flagged rows (float
    `{:e}` formatting, lowercase \\uXXXX) pay the Python
    canonicalizer.  One Arrow-batched ``mapInPandas`` pass either
    way — mapInPandas (a standalone plan node) rather than a scalar
    pandas UDF: a UDF projected alongside a very wide compiled-jq
    variant expression can fail Catalyst's Python-UDF extraction,
    while a map node is immune to the surrounding expression shape.
    """
    # persist + EAGER count before the Python boundary, for two
    # reasons:
    # (1) the collapsed jq projection must be evaluated under a
    #     NORMAL action: under a mapInPandas child it fails janino's
    #     64 KB method limit and re-runs interpreted — measured 15 s
    #     for a fill that codegens in ~0.5 s (this also rules out a
    #     lazy persist: the union action would drive the cache fill
    #     from beneath the Python node). After the count, every
    #     consumer reads the InMemoryRelation, whose scan is a small
    #     codegen-friendly plan.
    # (2) the count decides whether ANY row needs Python at all —
    #     the common all-fast case never launches a Python worker.
    # persist (deserialized columnar), NOT localCheckpoint: the
    # checkpoint's row serialization made the same materialization
    # cost 5.4 s of jq_canonical_floats' 7.7 s at sf0.1; the cached
    # fill is ~0.5 s for the identical rows.
    src = df.select("seq", "ord", F.to_json("v").alias("j")).withColumn(
        "needs_py", F.col("j").rlike(_NEEDS_PY_RE) | F.col("j").isNull()
    ).persist()
    n_slow = src.where("needs_py").count()
    fast = src.where(~F.col("needs_py")).select(
        "seq", "ord", F.col("j").alias("line")
    )
    if n_slow == 0:
        return fast

    def batches(it):
        for pdf in it:
            pdf["line"] = pdf["j"].map(
                lambda s: canonicalize(json.loads(s)) if s is not None else "null"
            )
            yield pdf[["seq", "ord", "line"]]

    slow = src.where("needs_py").mapInPandas(
        batches, "seq long, ord array<bigint>, line string"
    )
    return fast.unionByName(slow)


def canonical_lines(df: DataFrame) -> list[str]:
    """Collect the stream in (seq, ord) order as canonical lines —
    the CLI / golden-test sink."""
    return [
        r.line for r in canonical_text(df).orderBy("seq", "ord").collect()
    ]


def write_canonical(df: DataFrame, path: str) -> None:
    """Write the stream as canonical text files. Order is preserved
    *within* each output file (sortWithinPartitions); global order
    across files follows the range partitioning on seq."""
    out = canonical_text(df)
    (
        out.repartitionByRange("seq", "ord")
        .sortWithinPartitions("seq", "ord")
        .select("line")
        .write.mode("overwrite")
        .text(path)
    )
