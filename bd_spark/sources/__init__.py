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

# Binary document formats (reference README.md:20): imported as
# modules — both expose decode/decode_all/encode/
# stream_from_binary_column with identical shapes.
from bd_spark.sources import cbor, msgpack  # noqa: E402,F401
