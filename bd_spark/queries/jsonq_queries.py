"""Driver-facing queries that exercise the jsonq engine end-to-end
over the star schema (FIXTURES.md §5 bridge: rows <-> JSON docs).

Each query runs a real bd/jq expression through parse -> compile ->
Catalyst and then projects typed columns out of the variant results so
the DuckDB oracle can compare values exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bd_spark.catalog import table
from bd_spark.jsonq.runtime import JsonQ


def jq_props_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """jq `.k` over the events.props JSON column (Index op,
    ops.rs:251-317)."""
    ev = table(spark, "events", sf_dir).select("event_id", "props")
    jq = JsonQ(spark)
    stream = jq.stream_from_text_column(ev, "props", seq_col="event_id")
    out = jq.run(".k", stream)
    return out.select(
        F.col("seq").alias("event_id"),
        F.try_variant_get("v", "$", "long").alias("k"),
    )


JQ_PROPS_K_SQL = """
SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
FROM events
"""


def jq_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """jq string division + length: `.text / " " | length`
    (json.rs:934-937 split, ops.rs:1418-1467 length)."""
    docs = table(spark, "documents", sf_dir)
    jq = JsonQ(spark)
    stream = jq.stream_from_table(docs)
    out = jq.run('{id: .doc_id, n_tokens: (.text / " " | length)}', stream)
    return out.select(
        F.try_variant_get("v", "$.id", "long").alias("id"),
        F.try_variant_get("v", "$.n_tokens", "long").alias("n_tokens"),
    )


JQ_TOKEN_COUNT_SQL = """
SELECT doc_id AS id, len(str_split(text, ' ')) AS n_tokens
FROM documents
"""


def jq_event_nav(spark: SparkSession, sf_dir: str) -> DataFrame:
    """jq dict construction + pipe + byte-length builtin over full-row
    docs (ops.rs:600-739, json.rs:632)."""
    ev = table(spark, "events", sf_dir)
    jq = JsonQ(spark)
    stream = jq.stream_from_table(ev.select("event_id", "event_type"))
    out = jq.run("{id: .event_id, type: .event_type, len: (.event_type | length)}", stream)
    return out.select(
        F.try_variant_get("v", "$.id", "long").alias("id"),
        F.try_variant_get("v", "$.type", "string").alias("type"),
        F.try_variant_get("v", "$.len", "long").alias("len"),
    )


JQ_EVENT_NAV_SQL = """
SELECT event_id AS id, event_type AS type, strlen(event_type) AS len
FROM events
"""


def jq_doc_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """jq comparison + logical ops (ops.rs:1146-1415) as a predicate
    column over documents."""
    docs = table(spark, "documents", sf_dir)
    jq = JsonQ(spark)
    stream = jq.stream_from_table(docs.select("doc_id", "n_chars", "lang"))
    out = jq.run('{id: .doc_id, ok: (.n_chars > 100 && .lang == "en")}', stream)
    return out.select(
        F.try_variant_get("v", "$.id", "long").alias("id"),
        F.try_variant_get("v", "$.ok", "boolean").alias("ok"),
    )


JQ_DOC_FILTER_SQL = """
SELECT doc_id AS id, (n_chars > 100 AND lang = 'en') AS ok
FROM documents
"""


def jq_value_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """jq arithmetic (int/float promotion, json.rs:900-905): scale and
    shift the events.value measure."""
    ev = table(spark, "events", sf_dir)
    jq = JsonQ(spark)
    stream = jq.stream_from_table(ev.select("event_id", "value"))
    out = jq.run("{id: .event_id, scaled: (.value * 2 + 1)}", stream)
    return out.select(
        F.try_variant_get("v", "$.id", "long").alias("id"),
        F.round(F.try_variant_get("v", "$.scaled", "double"), 6).alias("scaled"),
    )


JQ_VALUE_ARITH_SQL = """
SELECT event_id AS id, round(value * 2 + 1, 6) AS scaled
FROM events
"""


QUERIES = {
    "jq_props_k": jq_props_k,
    "jq_token_count": jq_token_count,
    "jq_event_nav": jq_event_nav,
    "jq_doc_filter": jq_doc_filter,
    "jq_value_arith": jq_value_arith,
}

ORACLES = {
    "jq_props_k": JQ_PROPS_K_SQL,
    "jq_token_count": JQ_TOKEN_COUNT_SQL,
    "jq_event_nav": JQ_EVENT_NAV_SQL,
    "jq_doc_filter": JQ_DOC_FILTER_SQL,
    "jq_value_arith": JQ_VALUE_ARITH_SQL,
}
