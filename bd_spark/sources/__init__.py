"""Document-stream sources/sinks (reference §2.1: InputMem, Jsons,
canonical Display — rebuilt as Spark readers/writers)."""

from bd_spark.sources.jsons import (  # noqa: F401
    canonical_lines,
    canonical_text,
    read_json_concat,
    read_jsonl,
    write_canonical,
)
from bd_spark.sources.lenient_json import (  # noqa: F401
    iter_documents,
    parse_many,
    parse_one,
)
