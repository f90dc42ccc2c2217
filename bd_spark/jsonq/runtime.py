"""Execution entry points for jsonq queries.

The document-stream schema is
``(seq BIGINT, ord ARRAY<BIGINT>, v VARIANT, err STRING)``:
`seq` is the input document index (jq output order is semantic; Spark
rows are unordered, so order is data), `ord` the burst-position path,
`err` the in-band error channel (entry.rs:30-32).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bd_spark.jsonq import compiler, parser
from bd_spark.jsonq.compiler import compile_query


class JsonQ:
    """Compile and run bd/jq queries on a SparkSession.

    >>> jq = JsonQ(spark)
    >>> jq.run_texts(".foo", ['{"foo": 10}'])
    [(10, None)]
    """

    def __init__(self, spark: SparkSession):
        self.spark = spark

    # -- building document streams ------------------------------------
    @staticmethod
    def _widen(df: DataFrame) -> DataFrame:
        """jq evaluation is CPU-dense (wide variant expressions): give
        it at least one partition per core (catalog.rebalance)."""
        from bd_spark.catalog import rebalance

        return rebalance(df)
    def stream_from_texts(self, texts: list[str]) -> DataFrame:
        df = self.spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "seq long, doc_text string"
        )
        return self.stream_from_text_column(df, "doc_text")

    def stream_from_text_column(
        self, df: DataFrame, col: str, seq_col: str | None = "seq"
    ) -> DataFrame:
        """Document stream from a JSON-text column. Unparseable text
        becomes an error entry (in-band, like the reference's parse
        errors)."""
        seq = (
            F.col(seq_col)
            if seq_col and seq_col in df.columns
            else F.monotonically_increasing_id()
        )
        v = F.try_parse_json(F.col(col))
        err = F.when(
            v.isNull() & F.col(col).isNotNull(), F.concat(F.lit("parse error: "), F.col(col))
        )
        return self._widen(
            df.select(
                seq.cast("long").alias("seq"),
                F.array().cast("array<long>").alias("ord"),
                F.when(err.isNotNull(), F.parse_json(F.lit("null"))).otherwise(v).alias("v"),
                err.alias("err"),
            )
        )

    # Column types whose to_variant_object encoding matches the JSON
    # text round trip (strings and integers; doubles are EXCLUDED:
    # parse_json normalizes "6.0" into the int tower while a variant
    # DOUBLE keeps its float tag — the text path's documented
    # behavior must not silently change).
    _NATIVE_DOC_TYPES = frozenset(
        ("string", "bigint", "int", "smallint", "tinyint", "boolean")
    )

    def stream_from_table(self, df: DataFrame) -> DataFrame:
        """Any relational DataFrame as a document stream: each row is
        one JSON object doc (FIXTURES.md §5 star-schema bridge).

        r7: when every column is a string/integer/boolean, the doc
        variant is assembled NATIVELY (to_variant_object over the row
        struct — keys sorted by the variant encoder) instead of the
        to_json + parse_json text round trip, which was the shared
        ~1.3 s floor of every table-backed jq query at sf0.1. Frames
        carrying doubles/timestamps/arrays keep the text path so the
        parse_json normalization semantics stay bit-identical."""
        native_ok = all(
            f.dataType.simpleString() in self._NATIVE_DOC_TYPES
            for f in df.schema.fields
        )
        struct_ = F.struct(*df.columns)
        text_doc = F.parse_json(F.to_json(struct_))
        if native_ok:
            # to_variant_object keeps NULL struct fields as json-null
            # entries where to_json OMITS them (verified) — rows with
            # any NULL take the text path so keys/length/has agree
            any_null = None
            for c in df.columns:
                n = F.col(c).isNull()
                any_null = n if any_null is None else (any_null | n)
            doc = F.when(any_null, text_doc).otherwise(
                F.to_variant_object(struct_)
            )
        else:
            doc = text_doc
        # seq is assigned BEFORE the (possible) rebalance shuffle, so
        # ids stay stable relative to the narrow source layout
        return self._widen(
            df.select(
                F.monotonically_increasing_id().alias("seq"),
                F.array().cast("array<long>").alias("ord"),
                doc.alias("v"),
                F.lit(None).cast("string").alias("err"),
            )
        )

    # -- running -------------------------------------------------------

    # Compiled-plan cache (the jq engine's "prepared statement" cache).
    # Building a compiled jq plan costs thousands of Py4J round-trips
    # (~0.3 ms each — measured 4.9 s of a 5.4 s jq_builtins run, with
    # execution itself at 0.5 s), so re-running the same query text on
    # a semantically identical input stream should not pay it twice.
    # Keyed by (session, query, ordered, input schema, input plan
    # semanticHash) — semanticHash is Catalyst's own canonical plan
    # hash, one Py4J call to compute.  Bounded FIFO, 64 entries.
    # The session component is catalog.session_token (weakref-keyed),
    # not id(): a reused CPython id could resurrect a dead session's
    # cached DataFrame (ADVICE r4).
    _PLAN_CACHE: dict[tuple, DataFrame] = {}
    _PLAN_CACHE_MAX = 64

    def run(self, query: str, stream: DataFrame, ordered: bool = True) -> DataFrame:
        """Run a query on a document stream.

        ``ordered=True`` (CLI / conformance sinks) appends the jq
        output order ``orderBy(seq, ord)`` — jq output order is
        semantic there. Gate/analytics callers that re-aggregate or
        hash order-insensitively pass ``ordered=False``: at scale the
        global sort is a pure waste (a full range-shuffle of every
        result row) and Catalyst cannot always prove it removable.

        Results are DataFrames (immutable, lazily executed), so a
        cache hit returns the previously compiled plan verbatim.
        """
        try:
            from bd_spark.catalog import session_token

            plan_key = (
                session_token(stream.sparkSession),
                query,
                ordered,
                compiler.TIER_OVERRIDE,  # tier-pinning tests
                stream.schema.simpleString(),
                stream._jdf.queryExecution().logical().semanticHash(),
            )
        except Exception:  # noqa: BLE001 — cache is best-effort only
            plan_key = None
        if plan_key is not None and plan_key in self._PLAN_CACHE:
            return self._PLAN_CACHE[plan_key]
        fn = compile_query(parser.parse(query))
        out = fn(stream)
        out = out.orderBy("seq", "ord") if ordered else out
        if plan_key is not None:
            if len(self._PLAN_CACHE) >= self._PLAN_CACHE_MAX:
                self._PLAN_CACHE.pop(next(iter(self._PLAN_CACHE)))
            self._PLAN_CACHE[plan_key] = out
        return out

    def run_texts(self, query: str, texts: list[str]) -> list[tuple[object, str | None]]:
        """Convenience for tests: returns [(python_value, err), ...]
        in output order."""
        import json

        out = self.run(query, self.stream_from_texts(texts))
        rows = out.select(F.to_json("v").alias("j"), "err").collect()
        return [
            (json.loads(r.j) if r.j is not None else None, r.err) for r in rows
        ]

    def run_values(self, query: str, texts: list[str]) -> list[object]:
        """Non-error output values only (error entries excluded)."""
        return [val for val, err in self.run_texts(query, texts) if err is None]
