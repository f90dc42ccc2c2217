"""``bdq`` — command-line query runner.

Supersedes the reference CLI stub (bin/q.rs:44-49, which only prints
``--version``): parses a bd/jq expression, runs it over JSON documents
from files or stdin on a local SparkSession, and prints canonical
output (sorted keys, ``{:e}`` floats) one document per line.

Usage:
    bdq '.foo | length' data.jsonl …
    cat docs.json | bdq --concat '.[] | .name'
    bdq --version
"""

from __future__ import annotations

import argparse
import sys

__version__ = "0.1.0"


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="bdq", description="Run a bd/jq query over JSON documents on Spark."
    )
    p.add_argument("query", nargs="?", help="bd/jq expression (e.g. '.foo | length')")
    p.add_argument("files", nargs="*", help="input files (JSON-Lines; stdin if none)")
    p.add_argument(
        "--concat", action="store_true",
        help="inputs are concatenated/multi-line JSON docs, not one per line",
    )
    p.add_argument(
        "--format", choices=["json", "cbor", "msgpack"], default="json",
        help="input document format (binary formats read whole files / "
             "stdin as concatenated document streams)",
    )
    p.add_argument(
        "--output-format", choices=["json", "cbor", "msgpack"],
        default="json",
        help="output format: canonical JSON text (default) or a "
             "concatenated binary document stream",
    )
    p.add_argument(
        "-o", "--output", default=None,
        help="write output to FILE instead of stdout",
    )
    p.add_argument(
        "--errors", action="store_true",
        help="print in-band error entries to stderr instead of dropping them",
    )
    p.add_argument("--master", default=None, help="Spark master (default local[N])")
    p.add_argument(
        "--local", action="store_true",
        help="evaluate with the in-process interpreter (no Spark; for small inputs)",
    )
    p.add_argument("--version", action="store_true", help="print version and exit")
    return p


def _binary_encoder(fmt: str):
    from bd_spark.sources import cbor, msgpack

    return (cbor if fmt == "cbor" else msgpack).encode


def _emit(values, args) -> None:
    """Write result VALUES in the requested output format: canonical
    JSON lines, or a concatenated CBOR / MsgPack document stream
    (the write-side twin of ``--format``; reference README.md:20)."""
    from bd_spark.jsonq.canonical import canonicalize

    if args.output_format == "json":
        lines = "".join(canonicalize(v) + "\n" for v in values)
        if args.output:
            with open(args.output, "w", encoding="utf-8") as f:
                f.write(lines)
        else:
            sys.stdout.write(lines)
        return
    enc = _binary_encoder(args.output_format)
    blob = b"".join(enc(v) for v in values)
    if args.output:
        with open(args.output, "wb") as f:
            f.write(blob)
    else:
        sys.stdout.buffer.write(blob)


def _run_local(ast, args) -> int:
    """Interpreter path: zero JVM startup; same semantics (the
    interpreter and the Spark compiler share the conformance corpus
    and a differential test)."""
    from bd_spark.jsonq.interp import run as interp_run
    from bd_spark.sources.lenient_json import parse_many

    if args.files:
        text = "".join(open(f, encoding="utf-8").read() for f in args.files)
    else:
        text = sys.stdin.read()
    docs = (
        parse_many(text)
        if args.concat
        else [d for ln in text.splitlines() if ln.strip() for d in parse_many(ln)]
    )
    status = 0
    vals = []
    for doc in docs:
        for val, err in interp_run(ast, doc):
            if err is not None:
                print(f"bdq: {err}", file=sys.stderr)
                status = 5
            else:
                vals.append(val)
    _emit(vals, args)
    return status


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    if args.version:
        print(f"bdq {__version__}")
        return 0
    if not args.query:
        build_parser().print_usage(sys.stderr)
        return 2

    from bd_spark.jsonq import parser as qparser

    try:
        ast = qparser.parse(args.query)
    except Exception as e:  # noqa: BLE001 - surface parse errors cleanly
        print(f"bdq: parse error: {e}", file=sys.stderr)
        return 2

    if args.local:
        return _run_local(ast, args)

    from bd_spark.jsonq.compiler import compile_query
    from bd_spark.jsonq.runtime import JsonQ
    from bd_spark.session import get_spark
    from bd_spark.sources import jsons

    spark = get_spark("bdq", master=args.master)
    spark.sparkContext.setLogLevel("ERROR")
    jq = JsonQ(spark)

    if args.format != "json":
        # binary document stream (reference README.md:20 formats):
        # each file / stdin is a concatenated CBOR (RFC 8742) or
        # msgpack stream, bursting to one row per document
        from bd_spark.sources import cbor, msgpack

        mod = cbor if args.format == "cbor" else msgpack
        if args.files:
            payloads = [open(f, "rb").read() for f in args.files]
        else:
            payloads = [sys.stdin.buffer.read()]
        df = spark.createDataFrame(
            [(i, bytearray(b)) for i, b in enumerate(payloads)],
            "seq long, blob binary",
        )
        stream = mod.stream_from_binary_column(df, "blob", multi=True)
    elif args.files:
        reader = jsons.read_json_concat if args.concat else jsons.read_jsonl
        stream = reader(spark, args.files)
    else:
        text = sys.stdin.read()
        if args.concat:
            from bd_spark.sources.jsons import _parse_concat

            docs = [d for d, err in _parse_concat(text) if err is None]
            stream = jq.stream_from_texts(docs)
        else:
            stream = jq.stream_from_texts(
                [ln for ln in text.splitlines() if ln.strip()]
            )

    out = compile_query(ast)(stream)
    err_rows = out.orderBy("seq", "ord").select("err") if args.errors else None
    if args.output_format == "json" and args.output is None:
        rows = jsons.canonical_text(out).orderBy("seq", "ord")
        for r in rows.select("line").collect():
            print(r.line)
    else:
        import json as _json
        from pyspark.sql import functions as F

        collected = (
            out.orderBy("seq", "ord")
            .select(F.to_json("v").alias("j"), "err")
            .collect()
        )
        # to_json keeps the float tower readable: engine DOUBLEs print
        # with a fraction ('6.0'), so json.loads restores float-ness
        vals = [_json.loads(r.j) for r in collected if r.err is None]
        _emit(vals, args)
    if err_rows is not None:
        for r in err_rows.collect():
            if r.err is not None:
                print(f"bdq: {r.err}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
