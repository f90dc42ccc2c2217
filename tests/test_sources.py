"""Sources/sinks: lenient parser golden-corpus parity, Spark readers,
canonical sink, and the bdq CLI."""

from __future__ import annotations

import io
import json

import pytest

from bd_spark.jsonq.canonical import canonicalize
from bd_spark.sources.lenient_json import (
    JsonParseError,
    iter_documents,
    parse_many,
    parse_one,
)

REF = "/root/reference/testdata"


def _load_rust_vec(path: str) -> list[str]:
    """The reference corpus files are Rust `vec!` source: one string
    literal per line. Strip the literal syntax, keep the payload."""
    out = []
    for line in open(path, encoding="utf-8"):
        line = line.strip().rstrip(",")
        if line in ("[", "]", ""):
            continue
        if line.startswith('r#"'):
            out.append(line[3 : line.rindex('"#')])
        else:
            out.append(line[1 : line.rindex('"')])
    return out


# ---------------------------------------------------------- golden corpus

CORPUS = list(zip(_load_rust_vec(f"{REF}/test_simple.jsons"),
                  _load_rust_vec(f"{REF}/test_simple.jsons.ref.jsons")))


def test_corpus_loaded():
    assert len(CORPUS) == 52  # 54 lines minus the two bracket lines


@pytest.mark.parametrize("src,expect", CORPUS, ids=[s[:25] for s, _ in CORPUS])
def test_golden_parse_serialize(src: str, expect: str):
    """Parse the lenient input, canonical-serialize, match the golden
    output byte-for-byte (json.rs:1130-1187 test_simple_jsons)."""
    assert canonicalize(parse_one(src)) == expect


# ---------------------------------------------------------- lenient units

def test_lenient_numbers():
    assert parse_one("+1") == 1
    assert parse_one("00") == 0
    assert parse_one(".2") == 0.2
    assert parse_one("-.00") == 0.0
    assert canonicalize(parse_one("-.00")) == "0e0"


def test_optional_commas():
    assert parse_one('[1 2 3]') == [1, 2, 3]
    assert parse_one('{"a":1 "b":2}') == {"a": 1, "b": 2}


def test_dup_keys_last_wins():
    assert parse_one('{"a":1,"a":2}') == {"a": 2}
    assert canonicalize(parse_one('{"z":1,"a":2}')) == '{"a":2,"z":1}'


def test_surrogate_pair():
    assert parse_one('"\\uD834\\uDD1E"') == "\U0001d11e"


def test_parse_many():
    assert parse_many('1 "two" [3] {"f":4} null') == [1, "two", [3], {"f": 4}, None]


def test_parse_error_position():
    with pytest.raises(JsonParseError):
        parse_one("{bad}")


def test_iter_documents_chunk_boundaries():
    text = '12 345 {"a":1}[1,2]"x" true'
    for bs in (1, 2, 3, 7, 1024):
        got = list(iter_documents(io.StringIO(text), block_size=bs))
        assert got == [12, 345, {"a": 1}, [1, 2], "x", True], f"block_size={bs}"


# ---------------------------------------------------------- spark readers

def test_read_jsonl(spark, tmp_path):
    from bd_spark.sources import jsons

    p = tmp_path / "docs.jsonl"
    p.write_text('{"a": 1}\n{"a": 2}\nnot json\n[3, 4]\n')
    df = jsons.read_jsonl(spark, str(p)).orderBy("seq")
    rows = df.selectExpr("to_json(v) AS j", "err").collect()
    assert [json.loads(r.j) for r in rows] == [{"a": 1}, {"a": 2}, None, [3, 4]]
    assert [r.err is not None for r in rows] == [False, False, True, False]


def test_read_json_concat(spark, tmp_path):
    from bd_spark.sources import jsons

    p = tmp_path / "docs.json"
    p.write_text('{"a":\n 1}\n{"b": 2} [1,\n2] 7')
    df = jsons.read_json_concat(spark, str(p)).orderBy("seq")
    rows = df.selectExpr("to_json(v) AS j", "err").collect()
    assert [json.loads(r.j) for r in rows] == [{"a": 1}, {"b": 2}, [1, 2], 7]
    assert all(r.err is None for r in rows)


def test_canonical_sink(spark, tmp_path):
    from bd_spark.jsonq.runtime import JsonQ
    from bd_spark.sources import jsons

    jq = JsonQ(spark)
    stream = jq.stream_from_texts(['{"z":1,"a":10.2}', "[1,2]"])
    assert jsons.canonical_lines(stream) == ['{"a":1.02e1,"z":1}', "[1,2]"]

    out = tmp_path / "out"
    jsons.write_canonical(stream, str(out))
    lines = sorted(
        ln
        for f in out.glob("part-*")
        for ln in f.read_text().splitlines()
    )
    assert lines == sorted(['{"a":1.02e1,"z":1}', "[1,2]"])


# ---------------------------------------------------------- CLI

def test_cli_version(capsys):
    from bd_spark.cli import main

    assert main(["--version"]) == 0
    assert capsys.readouterr().out.startswith("bdq ")


def test_cli_query_file(spark, tmp_path, capsys):
    from bd_spark.cli import main

    p = tmp_path / "in.jsonl"
    p.write_text('{"foo": {"bar": 41}}\n{"foo": {"bar": 1}}\n')
    assert main([".foo.bar + 1", str(p)]) == 0
    assert capsys.readouterr().out == "42\n2\n"


def test_cli_local_mode(tmp_path, capsys):
    from bd_spark.cli import main

    p = tmp_path / "in.jsonl"
    p.write_text('{"foo": {"bar": 41}}\n{"foo": {"bar": 1}}\n')
    assert main(["--local", ".foo.bar + 1", str(p)]) == 0
    assert capsys.readouterr().out == "42\n2\n"


def test_cli_local_stdin_concat(monkeypatch, capsys):
    import io

    from bd_spark.cli import main

    monkeypatch.setattr("sys.stdin", io.StringIO('{"a": 1} {"a": 2}'))
    assert main(["--local", "--concat", ".a"]) == 0
    assert capsys.readouterr().out == "1\n2\n"


def test_cli_binary_output_local(tmp_path):
    """--output-format cbor/msgpack writes a concatenated binary
    document stream (the write-side twin of --format); decoding it
    restores the query results exactly."""
    from bd_spark.cli import main
    from bd_spark.sources import cbor, msgpack

    p = tmp_path / "in.jsonl"
    p.write_text('{"a": [1, 2], "s": "x"}\n{"a": [3], "s": "y"}\n')
    want = [{"a": [1, 2], "s": "x"}, {"a": [3], "s": "y"}]
    for fmt, mod in (("cbor", cbor), ("msgpack", msgpack)):
        out = tmp_path / f"out.{fmt}"
        assert main(["--local", ".", str(p),
                     "--output-format", fmt, "-o", str(out)]) == 0
        assert mod.decode_all(out.read_bytes()) == want


def test_cli_binary_output_spark_full_cycle(spark, tmp_path, capsys):
    """Spark path: jsonl in -> msgpack out -> read the msgpack back in
    with --format msgpack -> canonical text: a full format cycle
    through both the reader and the writer."""
    from bd_spark.cli import main

    p = tmp_path / "in.jsonl"
    p.write_text('{"v": 1.5, "k": 7}\n{"v": 2, "k": 8}\n')
    mp = tmp_path / "docs.msgpack"
    assert main([".", str(p), "--output-format", "msgpack",
                 "-o", str(mp)]) == 0
    capsys.readouterr()
    assert main([".k", str(mp), "--format", "msgpack"]) == 0
    assert capsys.readouterr().out == "7\n8\n"


def test_cli_json_output_to_file(tmp_path):
    from bd_spark.cli import main

    p = tmp_path / "in.jsonl"
    p.write_text('{"foo": 41.5}\n')
    out = tmp_path / "out.txt"
    assert main(["--local", ".foo + 0.5", str(p), "-o", str(out)]) == 0
    assert out.read_text() == "4.2e1\n"


def test_format_agnostic_roundtrip(spark, sf_dir, tmp_path):
    """The reference aspires to format-agnostic sources (CBOR/MsgPack,
    README.md:18-22); on Spark that is the data source API. Round-trip
    the documents table through ORC and JSON and get identical rows."""
    from bd_spark.catalog import table

    docs = table(spark, "documents", sf_dir)
    expect = sorted(tuple(r) for r in docs.collect())

    orc = tmp_path / "docs_orc"
    docs.write.orc(str(orc))
    got_orc = sorted(tuple(r) for r in spark.read.orc(str(orc)).collect())
    assert got_orc == expect

    jsn = tmp_path / "docs_json"
    docs.write.json(str(jsn))
    got_json = sorted(
        tuple(r)
        for r in spark.read.schema(docs.schema).json(str(jsn)).collect()
    )
    assert got_json == expect


def test_cli_cbor_and_msgpack_files(spark, tmp_path, capsys):
    from bd_spark.cli import main
    from bd_spark.sources import cbor, msgpack

    pc = tmp_path / "in.cbor"
    pc.write_bytes(cbor.encode({"foo": {"bar": 41}}) + cbor.encode({"foo": {"bar": 1}}))
    assert main(["--format", "cbor", ".foo.bar + 1", str(pc)]) == 0
    assert capsys.readouterr().out == "42\n2\n"

    pm = tmp_path / "in.msgpack"
    pm.write_bytes(msgpack.encode({"x": [1, 2, 3]}) + msgpack.encode({"x": []}))
    assert main(["--format", "msgpack", ".x | length", str(pm)]) == 0
    assert capsys.readouterr().out == "3\n0\n"


def test_canon_jvm_differential(spark):
    """The all-Catalyst canonicalizer (_canon_jvm) must byte-match the
    Python canonicalizer on every float/escape shape, or emit the
    sentinel (>= 16 significant digits, where shortest-round-trip
    needs repr — includes Java 17's non-shortest Double.toString
    renderings like 1e23 -> 9.999999999999999E22)."""
    import json as _json

    from pyspark.sql import functions as F

    from bd_spark.jsonq.canonical import canonicalize
    from bd_spark.sources.jsons import _CANON_SENTINEL, _canon_jvm

    docs = [
        {"a": 10.2, "z": 1}, {"x": 0.2}, {"x": 100.0}, [1, 2, 3.5],
        {"neg": -0.00345}, {"zero": 0.0}, {"nzero": -0.0},
        {"tiny": 1e-5}, {"exact": 1234.625},
        {"s": "has 1.5 inside and \x1f control"},
        {"nested": {"q": [2.5, {"r": -7.125}]}},
        {"mix": [1, "ab", 3.25, True, None]},
        {"longint": 12345678901234567890},
        {"halves": [0.5, 1.5, 2.5, 122.5]},
        {"e": 2.718281828}, {"many": 0.1},
        "plain string", 42, True, None, 3.14,
        {"ctrl": "tab\there\nnewline \x01 unit"},
    ]
    sentinel_docs = [
        {"big": 1e23},                    # Java 17 non-shortest double
        {"long16": 0.1234567890123456},
        {"long17": 0.12345678901234567},
        # subnormal range: <=15-digit exactness proof fails below
        # ~1e-308 (reduced precision — 3e-324 IS the double whose
        # shortest repr is 5e-324), so |exp| > 290 must sentinel out
        # to the Python repr path (r7 ADVICE fix)
        {"sub": 3e-324},
        {"sub2": 5e-324},
        {"deep": 1.5e-300},
        {"huge": 1.7e308},
    ]
    rows = [(i, _json.dumps(d)) for i, d in enumerate(docs + sentinel_docs)]
    df = spark.createDataFrame(rows, "seq long, txt string").select(
        "seq", F.to_json(F.parse_json(F.col("txt"))).alias("j"))
    out = {r.seq: (r.j, r.line) for r in df.select(
        "seq", "j", _canon_jvm(F.col("j")).alias("line")).collect()}
    for i in range(len(docs)):
        j, line = out[i]
        assert _CANON_SENTINEL not in line, docs[i]
        assert line == canonicalize(_json.loads(j, parse_float=float)), docs[i]
    for i in range(len(docs), len(docs) + len(sentinel_docs)):
        assert _CANON_SENTINEL in out[i][1], sentinel_docs[i - len(docs)]


def test_canon_jvm_fuzz_floats(spark):
    """Randomized float corpus: every <= 15-significant-digit mantissa
    the JVM path rewrites must byte-match format_float; >= 16 must
    sentinel out to Python."""
    import json as _json
    import random

    from pyspark.sql import functions as F

    from bd_spark.jsonq.canonical import canonicalize
    from bd_spark.sources.jsons import _CANON_SENTINEL, _canon_jvm

    rng = random.Random(0xBD06)
    vals = []
    for _ in range(300):
        kind = rng.randrange(4)
        if kind == 0:
            vals.append(round(rng.uniform(-1e6, 1e6), rng.randrange(1, 7)))
        elif kind == 1:
            vals.append(rng.randrange(1, 10**6) / 2 ** rng.randrange(1, 10))
        elif kind == 2:
            vals.append(float(f"{rng.randrange(1, 999)}e{rng.randrange(-20, 20)}"))
        else:
            vals.append(rng.random())  # 17ish digits -> often sentinel
    rows = [(i, _json.dumps({"x": v})) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "seq long, txt string").select(
        "seq", F.to_json(F.parse_json(F.col("txt"))).alias("j"))
    out = {r.seq: (r.j, r.line) for r in df.select(
        "seq", "j", _canon_jvm(F.col("j")).alias("line")).collect()}
    n_sentinel = 0
    for i, v in enumerate(vals):
        j, line = out[i]
        if _CANON_SENTINEL in line:
            n_sentinel += 1
            continue
        assert line == canonicalize(_json.loads(j, parse_float=float)), (v, j)
    # the random corpus must exercise BOTH paths
    assert 0 < n_sentinel < len(vals)
