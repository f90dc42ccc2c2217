"""Parser unit tests — pure Python, no Spark."""

from __future__ import annotations

import pytest

from bd_spark.jsonq import ast
from bd_spark.jsonq.parser import ParseError, parse


def test_empty_program_is_identity():
    assert parse("") == ast.Identity()
    assert parse(".") == ast.Identity()


def test_recurse():
    assert parse("..") == ast.Recurse()


def test_index_forms():
    assert parse(".foo") == ast.Index("foo")
    assert parse(".foo?") == ast.Index("foo", True)
    assert parse('."foo"') == ast.Index("foo")
    assert parse('.["foo"]') == ast.Index("foo")
    assert parse(".0") == ast.Index(0)
    assert parse(".[0]") == ast.Index(0)
    assert parse(".[-1]") == ast.Index(-1)


def test_slices():
    assert parse(".[2..4]") == ast.Slice(2, 4)
    assert parse(".[2..=3]") == ast.Slice(2, 4)  # inclusive -> +1
    assert parse(".[..4]") == ast.Slice(None, 4)
    assert parse(".[2..]") == ast.Slice(2, None)
    assert parse(".[..]") == ast.Slice(None, None)
    assert parse(".[-3..-1]") == ast.Slice(-3, -1)


def test_itervalues_and_iter():
    assert parse(".[]") == ast.IterValues()
    assert parse(".[]?") == ast.IterValues(True)
    got = parse('.["a", 0]')
    assert got == ast.Iter((ast.Index("a"), ast.Index(0)))


def test_juxtaposition_pipe():
    assert parse(".a.b") == ast.Pipe(ast.Index("a"), ast.Index("b"))
    assert parse(".a | .b") == ast.Pipe(ast.Index("a"), ast.Index("b"))
    assert parse(".[] | foo") == ast.Pipe(ast.IterValues(), ast.Identifier("foo"))


def test_precedence():
    got = parse("1 + 2 * 3")
    assert got == ast.Binary(
        "+", ast.Literal("1"), ast.Binary("*", ast.Literal("2"), ast.Literal("3"))
    )
    got = parse("(2 + .) * 15")
    assert got == ast.Binary(
        "*", ast.Binary("+", ast.Literal("2"), ast.Identity()), ast.Literal("15")
    )


def test_bor_keyword():
    assert parse("a bor b") == ast.Binary(
        "bor", ast.Identifier("a"), ast.Identifier("b")
    )


def test_collections():
    assert parse("[]") == ast.ListCons(None)
    got = parse("[.items.[].name]")
    assert isinstance(got, ast.ListCons)
    got = parse("{user, title: .titles.[]}")
    assert isinstance(got, ast.DictCons)
    assert got.pairs[0].key == ast.Literal('"user"')
    assert got.pairs[0].value == ast.Index("user")


def test_computed_key():
    got = parse('{(."a"+"-"+."b"):59}')
    assert isinstance(got, ast.DictCons)
    assert isinstance(got.pairs[0].key, ast.Binary)


def test_builtins():
    assert parse("length") == ast.Builtin("length", ())
    assert parse('has("foo")') == ast.Builtin("has", (ast.Literal('"foo"'),))
    assert parse("map(.+1)") == ast.Builtin(
        "map", (ast.Binary("+", ast.Identity(), ast.Literal("1")),)
    )


def test_literals():
    assert parse("null") == ast.Literal("null")
    assert parse("true") == ast.Literal("true")
    assert parse("10.2") == ast.Literal("10.2")
    assert parse('"hi"') == ast.Literal('"hi"')


def test_errors():
    with pytest.raises(ParseError):
        parse(".foo[")
    with pytest.raises(ParseError):
        parse("{a:}")
