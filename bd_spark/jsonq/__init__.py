"""bd_spark.jsonq — the jq-like query language of the reference
(bnclabs/bd query.rs / query_nom.rs / ops.rs), re-expressed as a
compiler from query strings to Spark DataFrame programs over the
Spark 4 VariantType.

Pipeline: parse (parser.py) -> AST (ast.py) -> compile (compiler.py)
-> DataFrame transforms on a document stream
(seq BIGINT, ord ARRAY<BIGINT>, v VARIANT, err STRING).
"""

from bd_spark.jsonq.parser import parse  # noqa: F401
from bd_spark.jsonq.runtime import JsonQ  # noqa: F401
