"""Text-analysis operators for large-scale training-data pipelines.

All operators are row-local Column builders (whole-stage codegen, no
shuffle, no Python in the data path) so they scale linearly with
input bytes on any cluster size.  Each has an exact DuckDB-SQL twin
in ``bd_spark.queries.pipeline`` for the driver's correctness gate.

Reference parity note: the reference (bnclabs/bd) has no text
functions beyond `length`/`chars` (ops.rs:1418-1519); this module is
the beyond-reference LLM-pipeline surface (SURVEY.md §7.2 step 8).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from bd_spark.operators.hashing import P31, h31, h60

# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic.  Deliberately small and hardcoded: the same literals are
# embedded in the DuckDB oracle so both engines score identically.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it"],
    "es": ["el", "la", "de", "y", "que", "en", "un", "es"],
    "de": ["der", "die", "das", "und", "zu", "den", "ist", "ein"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "est"],
    "zh": ["de5", "le5", "shi4", "zai4", "you3", "he2", "wo3", "ni3"],
}


def let1(col: Column, body) -> Column:
    """Poor-man's let: evaluate ``col`` ONCE and feed the bound lambda
    variable to ``body``. A plain Python reuse of a Column splices the
    EXPRESSION tree at every use site — Catalyst has no CSE across
    interpreted HOF chains, so an array captured by 4 slice operands
    is computed 4 times per row (winnowing's hash array: 4 full
    tokenize+shingle+md5 passes, measured 26.5 s -> 8 s at sf0.1
    after binding). transform evaluates its input array once; lambda
    variable references are cheap reads of the bound value."""
    return F.element_at(F.transform(F.array(col), body), 1)


def tokens(text: Column) -> Column:
    """Whitespace tokenization -> array<string> (lowercased).

    split + filter stays in codegen; empty strings from repeated
    blanks are dropped so Spark's regex split and DuckDB's plain
    split agree.
    """
    toks = F.split(F.lower(F.trim(text)), r"\s+")
    return F.filter(toks, lambda t: t != F.lit(""))


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def word_shingles(toks: Column, n: int) -> Column:
    """Word n-gram shingles: array of space-joined n-token windows.

    Built by zipping n SHIFTED SLICES of the token array instead of a
    positional ``transform`` whose lambda captures ``toks``: a lambda-
    captured expression re-evaluates per element (O(T²) per row —
    measured 10x slowdown on real docs), while zip_with operands
    evaluate once.  ``toks`` appears n times at top level, so callers
    passing an expensive expression pay n linear passes, not T².
    Returns an empty array for docs shorter than n tokens.
    """

    def body(ts: Column) -> Column:
        cnt = F.greatest(F.size(ts) - n + 1, F.lit(0))
        acc = F.slice(ts, 1, cnt)
        for k in range(1, n):
            acc = F.zip_with(
                acc, F.slice(ts, k + 1, cnt),
                lambda a, b: F.concat_ws(" ", a, b),
            )
        return acc

    # let-bind: the n slice operands would otherwise each re-evaluate
    # the caller's token expression (n linear passes)
    return let1(toks, body)


def char_ngrams(text: Column, n: int) -> Column:
    """Character n-grams of the normalized text (distinct not applied).

    One regexp pass: ``(?=(.{n})).`` captures the n chars at every
    position (lookahead) while consuming one — the normalized string
    is evaluated once per row. ``(?s)`` so grams may span newlines,
    matching the substring-window semantics of the DuckDB oracle.
    The positional-transform alternative re-evaluates lower(trim(s))
    per position: O(len²) per row.
    """
    s = F.lower(F.trim(text))
    return F.regexp_extract_all(s, F.lit(f"(?s)(?=(.{{{n}}}))."), 1)


def quality_metrics(text: Column) -> dict[str, Column]:
    """Heuristic quality signals: length, token stats, alpha/space
    ratio, stopword ratio.  Mirrors common pre-training filters
    (Gopher/C4-style) with only engine-portable functions.
    """
    toks = tokens(text)
    n_tok = F.size(toks)
    n_chars = F.length(text)
    # characters that are neither lowercase ascii letters nor spaces
    stripped = F.regexp_replace(F.lower(text), "[a-z ]", "")
    non_alpha_ratio = F.when(n_chars > 0, F.length(stripped) / n_chars).otherwise(F.lit(0.0))
    mean_tok_len = F.when(
        n_tok > 0,
        F.aggregate(toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t))
        / n_tok,
    ).otherwise(F.lit(0.0))
    en_stops = F.array(*[F.lit(w) for w in LANG_STOPWORDS["en"]])
    stop_hits = F.size(F.filter(toks, lambda t: F.array_contains(en_stops, t)))
    stop_ratio = F.when(n_tok > 0, stop_hits / n_tok).otherwise(F.lit(0.0))
    return {
        "n_chars": n_chars.cast("long"),
        "n_tokens": n_tok.cast("long"),
        "mean_token_len": mean_tok_len.cast("double"),
        "non_alpha_ratio": non_alpha_ratio.cast("double"),
        "stopword_ratio": stop_ratio.cast("double"),
    }


def quality_score(text: Column) -> Column:
    """Scalar quality score in [0, 1]: product of clamped signals."""
    m = quality_metrics(text)
    len_ok = F.least(m["n_tokens"] / F.lit(20.0), F.lit(1.0))
    alpha_ok = F.lit(1.0) - F.least(m["non_alpha_ratio"] * 2, F.lit(1.0))
    wordlen_ok = F.when(
        (m["mean_token_len"] >= 2) & (m["mean_token_len"] <= 12), F.lit(1.0)
    ).otherwise(F.lit(0.5))
    return (len_ok * alpha_ok * wordlen_ok).cast("double")


def lang_scores(text: Column) -> dict[str, Column]:
    """Stopword-hit ratio per language (the language-ID heuristic)."""
    toks = tokens(text)
    n_tok = F.size(toks)
    out: dict[str, Column] = {}
    for lang, words in LANG_STOPWORDS.items():
        arr = F.array(*[F.lit(w) for w in words])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
        out[lang] = F.when(n_tok > 0, hits / n_tok).otherwise(F.lit(0.0)).cast("double")
    return out


def lang_id(text: Column) -> Column:
    """argmax language by stopword ratio; 'und' when all scores are 0.

    Ties break by the fixed language order in LANG_STOPWORDS (stable
    across engines because both evaluate the same CASE chain).
    """
    scores = lang_scores(text)
    langs = list(LANG_STOPWORDS)
    best = F.greatest(*[scores[lang] for lang in langs])
    expr = F.lit("und")
    for lang in reversed(langs):
        expr = F.when(scores[lang] == best, F.lit(lang)).otherwise(expr)
    return F.when(best > 0, expr).otherwise(F.lit("und"))


def repetition_metrics(text: Column) -> dict[str, Column]:
    """Gopher-style REPETITION signals (Rae et al. §A1.1) — the
    filters that catch boilerplate/spam the plain quality_metrics
    miss.  All row-local codegen, engine-portable:

      - ``top2_frac``:   occurrences of the most frequent word 2-gram
                         / total 2-gram occurrences,
      - ``dup5_frac``:   fraction of word-5-gram occurrences that are
                         repeats of an earlier one,
      - ``max_tok_run``: longest run of one token repeated
                         consecutively (catches "buy buy buy ...").

    The 2-gram mode count is O(n_2grams²) comparisons per row — fine
    for documents (a 1k-token doc is 1M cheap string equalities in
    codegen); web-page-scale docs would swap in the chunked variant.
    """
    toks = tokens(text)

    # let-bind the shingle arrays: mode2's inner filter previously
    # CAPTURED the sh2 expression — re-evaluating the whole
    # tokenize+shingle chain per (element x filter-element), O(n^2)
    # chain evals per row (24.8 s at sf0.1; ~3 s bound). Bound lambda
    # vars make the comparisons plain string equalities.
    def _top2(sh2: Column) -> Column:
        n2 = F.size(sh2)
        mode2 = F.array_max(
            F.transform(
                sh2, lambda g: F.size(F.filter(sh2, lambda x: x == g))
            )
        )
        return F.when(n2 > 0, mode2 / n2).otherwise(F.lit(0.0))

    def _dup5(sh5: Column) -> Column:
        n5 = F.size(sh5)
        return F.when(
            n5 > 0, (n5 - F.size(F.array_distinct(sh5))) / n5
        ).otherwise(F.lit(0.0))

    top2 = let1(word_shingles(toks, 2), _top2)
    dup5 = let1(word_shingles(toks, 5), _dup5)
    run = F.aggregate(
        toks,
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0).cast("long").alias("best"),
        ),
        lambda a, t: F.struct(
            t.alias("prev"),
            F.when(t == a.getField("prev"), a.getField("run") + 1)
            .otherwise(F.lit(1).cast("long"))
            .alias("run"),
            F.greatest(
                a.getField("best"),
                F.when(t == a.getField("prev"), a.getField("run") + 1)
                .otherwise(F.lit(1).cast("long")),
            ).alias("best"),
        ),
        lambda a: a.getField("best"),
    )
    return {
        "top2_frac": F.round(top2, 6).cast("double"),
        "dup5_frac": F.round(dup5, 6).cast("double"),
        "max_tok_run": run.cast("long"),
    }


# PII redaction patterns — deliberately inside the Java-regex ∩ RE2
# common subset (no lookaround/backrefs) so the DuckDB oracle applies
# the IDENTICAL patterns. Order matters (emails contain dots that the
# IP pattern must not see first): email, ipv4, phone.
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
]


def redact_pii(text: Column) -> Column:
    """Replace emails / IPv4 addresses / NNN-NNN-NNNN phone numbers
    with typed placeholders — the minimum-viable PII scrub every
    training pipeline runs before tokenization. One row-local
    regexp_replace chain in codegen; patterns in PII_PATTERNS."""
    out = text
    for pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def dedup_lines(df, id_col: str, text_col: str, line_tokens: int = 10):
    """C4-style corpus-level LINE dedup: every line keeps exactly its
    FIRST occurrence in the corpus (by (doc_id, line position)); all
    later copies are dropped and documents are reassembled from their
    surviving lines. Catches boilerplate (cookie banners, nav bars)
    that document-level dedup can never see.

    The synthetic corpus has no newlines, so a "line" here is a
    fixed ``line_tokens``-token window — the operator's shape (and
    its oracle) are identical for any splitter.

    Scale shape: explode to (doc, idx, line) -> ONE shuffle on
    md5(line) (uniform key; group size = duplication factor) ->
    rank-1 window keeps the winner -> reassemble with a
    groupBy(doc_id) sorted collect. Docs whose every line lost
    rejoin as empty strings via the final left join, so the output
    is total over input docs. Returns (id, text, n_lines,
    n_lines_kept).
    """
    from pyspark.sql.window import Window

    toks = tokens(F.col(text_col))
    n_lines = F.ceil(F.size(toks) / F.lit(line_tokens)).cast("int")
    lines_arr = F.transform(
        F.sequence(F.lit(0), F.greatest(n_lines - 1, F.lit(0))),
        lambda i: F.concat_ws(
            " ", F.slice(toks, i * line_tokens + 1, line_tokens)
        ),
    )
    lines = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(
            F.when(F.size(toks) > 0, lines_arr).otherwise(
                F.array().cast("array<string>")
            )
        ).alias("idx", "line"),
    )
    w = Window.partitionBy(F.md5("line")).orderBy("_id", "idx")
    kept = (
        lines.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .groupBy("_id")
        .agg(
            F.count("*").alias("n_lines_kept"),
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("idx", "line"))
                    ),
                    lambda s: s.getField("line"),
                ),
            ).alias("_text"),
        )
    )
    base = df.select(
        F.col(id_col).alias("_id"),
        F.ceil(token_count(F.col(text_col)) / F.lit(line_tokens))
        .cast("long")
        .alias("n_lines"),
    )
    return base.join(kept, "_id", "left").select(
        F.col("_id").alias(id_col),
        F.coalesce("_text", F.lit("")).alias(text_col),
        "n_lines",
        F.coalesce("n_lines_kept", F.lit(0)).cast("long").alias("n_lines_kept"),
    )


# BPE unit separator: joins the character units of a word during
# training/encoding. U+001F never appears in whitespace-split tokens
# of any sane corpus; a production tokenizer would use byte-level
# units where no sentinel is needed.
BPE_SEP = "\x1f"


def bpe_train(docs, text_col: str, n_merges: int = 6) -> list[tuple[str, str]]:
    """Deterministic distributed BPE training (Sennrich et al. 2016),
    word-internal, fixed ``n_merges`` iterations — the tokenizer-
    TRAINING step of a data pipeline, not just token counting.

    Representation trick that keeps every engine identical: a word is
    its units joined by BPE_SEP, and applying merge (a, b) is the
    plain left-to-right non-overlapping string replace of
    ``a SEP b -> ab`` — exactly BPE's greedy adjacent-merge order, and
    byte-for-byte reproducible in SQL (the pipe_bpe oracle unrolls
    the same iterations with DuckDB ``replace``).

    Scale shape per iteration: pair counts come from the DISTINCT-
    WORD vocabulary (one corpus shuffle builds it, once), weighted by
    word frequency — explode to (pair, cnt), map-side-combinable sum,
    then ONE row collected (argmax by count desc / pair asc for
    deterministic ties). Merge application is a row-local replace on
    the vocabulary. n_merges iterations = n_merges tiny collects.
    """
    from pyspark.sql import functions as FF

    words = (
        docs.select(FF.explode(tokens(FF.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(FF.count("*").alias("cnt"))
        .select(
            # drop the trailing empty the zero-width split leaves
            # under Java's limit=-1 semantics
            FF.concat_ws(
                BPE_SEP,
                FF.filter(FF.split(FF.col("w"), "(?!^)"), lambda c: c != ""),
            ).alias("units"),
            "cnt",
        )
        .persist()
    )
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        units_col = FF.col("units")
        for a, b in merges:
            units_col = FF.replace(
                units_col, FF.lit(a + BPE_SEP + b), FF.lit(a + b)
            )
        parts = FF.split(units_col, BPE_SEP)
        n = FF.size(parts)
        pairs = FF.zip_with(
            FF.slice(parts, 1, FF.greatest(n - 1, FF.lit(0))),
            FF.slice(parts, 2, FF.greatest(n - 1, FF.lit(0))),
            lambda x, y: FF.concat(x, FF.lit(BPE_SEP), y),
        )
        top = (
            words.select(FF.explode(pairs).alias("p"), "cnt")
            .groupBy("p")
            .agg(FF.sum("cnt").alias("c"))
            .orderBy(FF.desc("c"), FF.asc("p"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b = top[0]["p"].split(BPE_SEP, 1)
        merges.append((a, b))
    return merges


def bpe_apply(text: Column, merges: list[tuple[str, str]]) -> Column:
    """array<string> of BPE pieces per document: each token's units
    run through the merge list in training order. Row-local codegen
    (one literal replace per merge — fine for demo-sized merge lists;
    a production encoder with 30k+ merges runs the classic ranked-
    merge algorithm in an Arrow-batched pandas UDF instead)."""
    def encode_word(w: Column) -> Column:
        units = F.concat_ws(
            BPE_SEP, F.filter(F.split(w, "(?!^)"), lambda c: c != "")
        )
        for a, b in merges:
            units = F.replace(units, F.lit(a + BPE_SEP + b), F.lit(a + b))
        return F.split(units, BPE_SEP)

    return F.flatten(F.transform(tokens(text), encode_word))


def hashed_linear_score(text: Column, salt: str = "qw") -> Column:
    """Linear text-classifier INFERENCE (the fastText-style quality
    filter every modern pretraining pipeline runs): score = sigmoid
    of the mean per-token weight, with the weight of token t drawn
    from a deterministic hashed-feature table (md5-derived, centered
    on [-1, 1)).  The weights are a stand-in — the same deliberate
    pattern as the IVF/PQ seed quantizers: the Spark-side plumbing
    (hashed lookup, mean-pool, sigmoid, all row-local codegen) is the
    real operator; a trained model swaps in a broadcast weight table
    without touching the plan shape.  Engine-portable: DuckDB
    reproduces the weight of every token from the same md5 formula.
    """
    toks = tokens(text)
    n = F.size(toks)

    def w(t: Column) -> Column:
        hb = h60(F.concat(F.lit(salt + ":"), t)) % F.lit(P31)
        return hb.cast("double") / F.lit(float(P31)) * 2 - 1

    s = F.when(
        n > 0,
        F.aggregate(toks, F.lit(0.0), lambda acc, t: acc + w(t)) / n,
    ).otherwise(F.lit(0.0))
    return (F.lit(1.0) / (F.lit(1.0) + F.exp(-s))).cast("double")


def fingerprint_minhash(text: Column) -> Column:
    """Single 31-bit document fingerprint: min over token-5-gram hashes
    (rolling-hash winnowing collapsed to its global minimum).

    Equal fingerprints => near-identical token streams; used as a
    cheap pre-cluster key.  Row-local.
    """
    return let1(
        word_shingles(tokens(text), 5),
        lambda sh: F.when(
            F.size(sh) > 0, F.array_min(F.transform(sh, h31))
        ).otherwise(h60(F.lower(F.trim(text))) % F.lit(P31)),
    )


def winnowing_fingerprints(text: Column, k: int = 5, w: int = 4) -> Column:
    """Winnowing fingerprint set (Schleimer et al., SIGMOD'03): hash
    token k-grams, then keep the min hash of every w-window; distinct
    sorted result.  Row-local; output size ~ n/w per doc.
    """
    def body(hashes: Column) -> Column:
        # rolling min via shifted-slice zips (same reasoning as
        # word_shingles: no lambda-captured array re-evaluation)
        cnt = F.greatest(F.size(hashes) - w + 1, F.lit(0))
        mins = F.slice(hashes, 1, cnt)
        for j in range(1, w):
            mins = F.zip_with(
                mins, F.slice(hashes, j + 1, cnt), lambda a, b: F.least(a, b)
            )
        return F.array_sort(F.array_distinct(mins))

    # let-bind the hash array: the w slice operands each re-evaluated
    # the full tokenize+shingle+md5 chain before
    return let1(F.transform(word_shingles(tokens(text), k), h31), body)


def chunk_documents(df, id_col: str, text_col: str,
                    max_tokens: int = 128, overlap: int = 16):
    """Token-bounded document chunking with overlap — the sequence-prep
    stage of a training-data pipeline (long documents split into
    model-window-sized pieces whose boundaries overlap so no context
    is lost at the seams).

    Deterministic and fully relational: token positions come from one
    ``posexplode``, chunk membership is integer arithmetic on the
    position (stride = max_tokens - overlap), and chunks re-assemble
    with a single groupBy on (id, chunk_id) — one shuffle on a uniform
    key, no Python, no window function. A NON-EMPTY doc shorter than
    ``max_tokens`` yields exactly one chunk; an empty or
    whitespace-only doc tokenizes to zero rows and produces NO chunks
    (it vanishes from the output — downstream joins that must keep
    every doc should left-join back to the source). Output:
    (id, chunk_id, n_tokens, chunk_text).

    At 100 TB this is the shape you want: explode fan-out is bounded
    by 1 + overlap/stride extra copies per token (1.14x at the
    defaults), the shuffle key (id, chunk_id) is uniform, and the
    aggregation is map-side combinable (arrays concat per partition).
    """
    if overlap >= max_tokens:
        raise ValueError("overlap must be < max_tokens")
    stride = max_tokens - overlap
    toks = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(tokens(F.col(text_col))).alias("pos", "tok"),
    )
    # token at pos belongs to chunk c when c*stride <= pos < c*stride +
    # max_tokens: at most ceil(max_tokens/stride) chunks per token,
    # enumerated by integer division — no range join
    first_chunk = F.greatest(
        F.ceil((F.col("pos") - max_tokens + 1) / stride).cast("long"), F.lit(0)
    )
    last_chunk = F.floor(F.col("pos") / stride).cast("long")
    member = toks.select(
        "id",
        "pos",
        "tok",
        F.explode(F.sequence(first_chunk, last_chunk)).alias("chunk_id"),
    )
    return (
        member.groupBy("id", "chunk_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("pos"), F.col("tok")))
                    ),
                    lambda s: s["tok"],
                ),
                " ",
            ).alias("chunk_text"),
        )
        # tail chunks that are pure overlap (fully contained in the
        # previous chunk) only exist when a doc ends inside an overlap
        # region; drop them so every chunk adds >= 1 new token
        .where((F.col("chunk_id") == 0) | (F.col("n_tokens") > overlap))
    )


def pack_chunks(chunks, budget: int, shards: int | None = None,
                id_col: str = "id", chunk_col: str = "chunk_id",
                len_col: str = "n_tokens"):
    """Deterministic sequence packing: assign (doc, chunk) pieces to
    fixed-token-budget bins — the step after chunk_documents that
    turns a chunked corpus into model-ready training sequences.

    Next-fit packing in (id, chunk_id) order WITHIN each shard: walk
    the shard's pieces in key order, open a new bin whenever the
    running total would exceed ``budget``; a piece longer than
    ``budget`` gets a bin of its own (truncation is the tokenizer's
    decision, not the packer's). Bin ids are globally unique
    (shard_index * 2^40 + local bin).

    Scale design: packing is a sequential fold, so it runs
    shard-parallel — each shard is one range of the (id, chunk_id)
    key space, sorted within and folded by an Arrow-batched
    mapInPandas carrying O(1) state. That is exactly the access
    pattern of the sequence writer that consumes the bins, and it
    never collects to the driver. Shard count defaults to the
    cluster's parallelism; ``shards=1`` gives the single global
    next-fit stream (used by the DuckDB differential test — range
    boundaries at higher shard counts come from Spark's sampling, so
    only the 1-shard layout is engine-portable). Output adds
    (bin_id, bin_pos, fill): consumers groupBy bin_id to concatenate
    and read the last piece's ``fill`` for padding waste.
    """
    from pyspark import TaskContext

    if shards is None:
        shards = chunks.sparkSession.sparkContext.defaultParallelism

    def assign(it):
        import pandas as pd  # noqa: F401

        shard = TaskContext.get().partitionId()
        bin_id = -1
        used = budget + 1  # first piece always opens a bin
        pos = 0
        for pdf in it:
            bins, poss, fills = [], [], []
            for ln in pdf[len_col]:
                ln = min(int(ln), budget)
                if used + ln > budget:
                    bin_id += 1
                    used = 0
                    pos = 0
                else:
                    pos += 1
                used += ln
                bins.append(shard * (1 << 40) + bin_id)
                poss.append(pos)
                fills.append(used)
            out = pdf.copy()
            out["bin_id"] = bins
            out["bin_pos"] = poss
            out["fill"] = fills
            yield out

    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in chunks.schema.fields
    ) + ", bin_id long, bin_pos long, fill long"
    return (
        chunks.repartitionByRange(shards, F.col(id_col), F.col(chunk_col))
        .sortWithinPartitions(id_col, chunk_col)
        .mapInPandas(assign, out_schema)
    )


def decontaminate(train, eval_df, id_col: str, text_col: str,
                  eval_id_col: str | None = None,
                  eval_text_col: str | None = None,
                  n: int = 13,
                  broadcast_threshold: int | None = None):
    """Benchmark decontamination: flag training documents that share
    ANY character ``n``-gram with an evaluation/test corpus — the
    standard leakage filter before pre-training (the n-gram-overlap
    rule popularized by GPT-3 appendix C / PaLM; n=13 chars is the
    common conservative window).

    Returns (id, n_hits, contaminated): one row per TRAIN doc,
    ``n_hits`` = number of distinct train-doc grams found in the eval
    gram set. Grams intersect as RAW strings — counts are exactly
    engine-portable without any hashing, and dropping the former
    per-position md5 (h31) cut the train scan 20.6 -> ~4 s at sf0.1
    (hashing every character position dominated; string
    array_intersect is a per-row JVM hash set).

    100 TB shape: the EVAL side is small by definition (benchmarks
    are thousands of docs, the corpus is billions), so its distinct
    gram-hash set builds once and BROADCASTS — the train corpus is
    scanned exactly once, map-side, with one per-row array_intersect
    against the broadcast set; no train-side shuffle at all beyond
    the final per-doc projection.  A size estimate guards the
    broadcast (same policy as ngram_jaccard_pairs): an oversized eval
    set degrades to a shuffled semi-join on the uniform gram-hash key.
    """
    eval_id_col = eval_id_col or id_col
    eval_text_col = eval_text_col or text_col
    if broadcast_threshold is None:
        try:
            broadcast_threshold = int(
                train.sparkSession.conf.get("spark.sql.autoBroadcastJoinThreshold")
            )
        except (TypeError, ValueError):
            broadcast_threshold = 10 << 20
    # r11 (stageprof): three serialization points removed from the
    # eval side — (1) rebalance: locally a filtered single-file scan
    # is ONE task, serializing the CPU-dense 13-gram enumeration;
    # (2) the explicit hash repartition keeps the distinct's merge at
    # full width (AQE coalesced the few-MB gram shuffle to ONE
    # 0.9 s task — partition count by bytes, not CPU); (3) persist +
    # the count below materialize the gram set once, so the main
    # job's broadcast build reads the cache instead of re-running
    # the explode+distinct. Eval corpora are small by definition
    # (docstring), so the cache is broadcast-sized.
    from bd_spark.catalog import rebalance as _rebalance

    spark = train.sparkSession
    width = spark.sparkContext.defaultParallelism
    eval_grams = (
        _rebalance(eval_df.select(F.col(eval_text_col)))
        .select(
            F.explode(
                F.array_distinct(char_ngrams(F.col(eval_text_col), n))
            ).alias("gh")
        )
        .repartition(width, "gh")
        .distinct()
        .persist()
    )
    tr = train.select(
        F.col(id_col).alias("id"),
        F.array_distinct(char_ngrams(F.col(text_col), n)).alias("ghash"),
    )
    # one cheap action on the (tiny) eval side sizes the broadcast;
    # ~(16 + n) bytes/entry for a gram string in the build relation.
    # BOTH branches are the same explode + join + per-id count —
    # Spark builds the join hash relation ONCE (broadcast) or
    # shuffles on the uniform gram key (fallback). The earlier
    # per-row array_intersect against one giant collected gram array
    # rebuilt a ~1M-entry hash set for EVERY train row (65 s at
    # sf0.1 vs ~4 s for the broadcast join).
    n_eval = eval_grams.count()
    ev = (
        F.broadcast(eval_grams)
        if n_eval * (16 + n) < broadcast_threshold
        else eval_grams
    )
    # explode_OUTER, deliberately (r11): a plain explode lets
    # InferFiltersFromGenerate synthesize `size(ghash) > 0 AND
    # isnotnull(ghash)` and predicate pushdown drags that filter —
    # containing the ENTIRE 13-gram regex — below the rebalance
    # exchange into the single-task file scan (stageprof: a 1.0 s
    # 1-task stage evaluating the grams serially, then again above
    # for the projection). The rule only fires on non-outer
    # generates; the extra (id, null) row an empty doc produces is
    # dropped by the inner join below, so results are identical.
    ex = tr.select("id", F.explode_outer("ghash").alias("gh"))
    # ghash is distinct per doc, eval_grams is distinct, so count(*)
    # counts DISTINCT matched grams — same n_hits as a set intersect
    matched = ex.join(ev, "gh").groupBy("id").agg(
        F.count("*").alias("n_hits")
    )
    return (
        tr.select("id")
        .join(matched, "id", "left")
        .select(
            "id",
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def mix_sources(df, id_col: str, source_col: str,
                frac: float = 0.3, n_buckets: int = 64):
    """Mixture-weighted corpus subsampling (the Pile/DoReMi-style
    data-mixing step): draw a deterministic sample of
    ``frac * total`` documents whose per-source quotas follow
    count^0.5 — sqrt-weighting upsamples small sources relative to
    proportional sampling (the standard temperature-mixing move,
    alpha fixed at 0.5 because IEEE sqrt is CORRECTLY ROUNDED and
    therefore bit-identical across engines, unlike pow()).

    Selection within a source is the smallest ``h31('mix:' || id)``
    values — a deterministic uniform "random" sample, stable across
    runs/partitionings/engines.

    100 TB shape — same two-phase rank as pipe_token_budget (a
    Window.partitionBy(source) rank would pull the biggest source
    through ONE sort task): the sample key is uniform, so
    ``key % n_buckets`` buckets are balanced; per-(source, bucket)
    counts (tiny map-side agg) give cumulative offsets; buckets
    wholly past the quota drop without sorting; the within-bucket
    row_number window is keyed by (source, bucket) — one task never
    holds more than ~1/n_buckets of a source. The per-source count
    collect is #sources rows (tiny by definition).

    Output: (id, source, samp_key, quota) for the selected docs.
    """
    import math

    from pyspark.sql import Window

    spark = df.sparkSession
    counts = {
        r[0]: r[1]
        for r in df.groupBy(source_col).count().collect()
    }
    srcs = sorted(counts)
    total = sum(counts.values())
    target = int(math.floor(total * frac))
    # fixed-order sum: left-to-right over source-sorted sqrt values,
    # mirrored exactly by the oracle's ordered list_sum
    s = 0.0
    for name in srcs:
        s += math.sqrt(counts[name])
    quotas = [
        (
            name,
            min(
                counts[name],
                int(math.floor(round(target * math.sqrt(counts[name]) / s, 6))),
            ),
        )
        for name in srcs
    ]
    qdf = spark.createDataFrame(quotas, f"{source_col} string, quota long")

    samp = h31(F.concat(F.lit("mix:"), F.col(id_col).cast("string")))
    # RANGE buckets (div, not modulo): the cumulative-offset rank
    # decomposition needs every key in bucket b to sort before every
    # key in bucket b+1; the key is uniform on [0, P31), so range
    # buckets are also balanced
    width = -(-P31 // n_buckets)  # ceil
    keyed = df.select(
        F.col(id_col).alias("id"),
        F.col(source_col).alias("source"),
        samp.alias("samp_key"),
    ).withColumn(
        "bucket", (F.col("samp_key") / width).cast("long")
    )
    bcounts = keyed.groupBy("source", "bucket").count()
    w_off = (
        Window.partitionBy("source")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        bcounts.select(
            "source", "bucket",
            F.coalesce(F.sum("count").over(w_off), F.lit(0)).alias("off"),
        )
        .join(qdf.withColumnRenamed(source_col, "source"), "source")
        .where(F.col("off") < F.col("quota"))
    )
    w_in = Window.partitionBy("source", "bucket").orderBy(
        "samp_key", "id"
    )
    return (
        keyed.join(F.broadcast(offsets), ["source", "bucket"])
        .withColumn("rk", F.col("off") + F.row_number().over(w_in))
        .where(F.col("rk") <= F.col("quota"))
        .select("id", "source", "samp_key", "quota")
    )


def assign_splits(df, id_col: str,
                  fractions: dict[str, float] | None = None,
                  denom: int = 1_000_000, salt: str = "split"):
    """Deterministic train/val/test assignment: split = the band of
    ``h31(salt:id) % denom`` the row's hash falls in (cumulative
    fraction boundaries, dict order). A pure function of the id —
    reproducible across engines/runs/partitionings, stable under
    corpus growth (existing rows never switch splits), and salt-
    isolated from sample_by_hash so sampling and splitting stay
    independent. Row-local, zero shuffle. Adds a ``split`` column."""
    fractions = fractions or {"train": 0.9, "val": 0.05, "test": 0.05}
    key = h31(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))) % denom
    expr = None
    acc = 0.0
    names = list(fractions)
    for name in names[:-1]:
        acc += fractions[name]
        cond = key < int(acc * denom)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    split = last if expr is None else expr.otherwise(last)
    return df.withColumn("split", split)


def shuffle_deterministic(df, id_col: str, seed: str = "epoch0"):
    """Seeded global reshuffle for training order: order rows by
    ``h60(seed:id)`` (ties by id). A pure function of (seed, id) —
    every engine/run/partitioning produces the identical permutation,
    and a new seed string is a fresh epoch. The total order is
    realized by Spark's DISTRIBUTED range sort (orderBy) — NOT a
    global row_number window, which would pull the whole corpus
    through one task. At 100 TB this is exactly the cost of writing
    the training-order dataset, which is the point. Adds the
    ``shuffle_key`` column (the permutation is `sort by (shuffle_key,
    id)`; a writer keeps it with sortWithinPartitions after
    repartitionByRange)."""
    key = h60(F.concat(F.lit(seed + ":"), F.col(id_col).cast("string")))
    return (
        df.withColumn("shuffle_key", key)
        .orderBy("shuffle_key", F.col(id_col))
    )


def sample_by_hash(df, id_col: str, fraction: float,
                   stratum_cols: list[str] | None = None,
                   fractions: dict | None = None,
                   denom: int = 1_000_000):
    """Deterministic, engine-portable (stratified) sampling: keep a
    row iff ``h31(id) % denom < fraction * denom``.

    Unlike ``DataFrame.sample`` this is (a) exactly reproducible
    across engines, runs, and partitionings — the sample is a pure
    function of the id — and (b) CONSISTENT across tables: sampling
    two tables by the same key keeps joinable rows together (the
    standard trick for sampling a star schema).  With
    ``stratum_cols``/``fractions``, each stratum gets its own rate
    (e.g. downsample web text, keep all books).  Row-local: zero
    shuffle, scales with input bytes.
    """
    key = h31(F.col(id_col).cast("string")) % denom
    if stratum_cols and fractions is not None:
        rate = None
        for val, fr in fractions.items():
            cond = F.col(stratum_cols[0]) == F.lit(val)
            rate = (
                F.when(cond, F.lit(fr)) if rate is None else rate.when(cond, F.lit(fr))
            )
        rate = rate.otherwise(F.lit(fraction))
    else:
        rate = F.lit(fraction)
    return df.where(key < rate * denom)


LM_UNK = "<unk>"


def lm_score(docs, id_col: str = "doc_id", text_col: str = "text",
             min_count: int = 3, alpha: float = 0.5):
    """CCNet-style LM quality signal: train an add-alpha-smoothed
    word-bigram language model ON the corpus itself, then score each
    document by its per-bigram cross-entropy under that model
    (CCNet/Wenzek et al. 2020 filter low-perplexity-outlier text with
    a KenLM model; this is the same signal with a corpus-trained
    bigram model, fully distributed and engine-portable).

    Model: tokens below ``min_count`` occurrences map to ``<unk>``;
    P(w2|w1) = (c(w1,w2) + a) / (c(w1) + a*V) over the MAPPED token
    stream, V = |vocab| + 1.  Returns
    ``[id_col, n_bigrams, xent]`` with ``xent = round(-avg ln P, 6)``
    (the round-6 mean convention keeps the value hash engine-portable;
    docs with < 2 tokens have no bigrams and drop out).

    Scale story (100 TB corpus): training is two map-side-combinable
    explode->groupBy counts; scoring maps each token to its pruned
    form via joins against the vocab on uniform word keys (AQE
    skew-splittable; Catalyst broadcasts the vocab while it fits),
    then joins the count tables, which are |vocab|- not corpus-sized.
    No window, no collect, no per-language serialization.

    r11 cost shape: the model's bigram table is derived FROM the
    per-doc bigram pre-aggregate (``pmc``) rather than from a second
    pass over the mapped-pair stream — the two aggregations share one
    exchange (ReuseExchange), so the tokenize+map subtree runs once
    and the scoring join's left side shrinks to distinct (doc,
    bigram) rows. Persisting base/uni instead was measured NEUTRAL to
    slightly negative at sf0.1 (cache writes serialize work that
    duplicated subtrees run on otherwise-idle cores) and was not
    kept.
    """
    base = docs.select(id_col, tokens(F.col(text_col)).alias("ws"))
    uni = (
        base.select(F.explode("ws").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
    )
    vocab = uni.filter(F.col("cnt") >= min_count)
    tots = uni.agg(
        F.sum("cnt").alias("tot"),
        F.coalesce(
            F.sum(F.when(F.col("cnt") >= min_count, F.col("cnt"))), F.lit(0)
        ).alias("vtot"),
        F.count(F.when(F.col("cnt") >= min_count, True)).alias("vsize"),
    )
    n1 = F.size("ws") - 1
    pairs = (
        base.where(F.size("ws") >= 2)
        .select(
            id_col,
            F.explode(
                F.zip_with(
                    F.slice("ws", F.lit(1), n1),
                    F.slice("ws", F.lit(2), n1),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                )
            ).alias("pr"),
        )
        .select(id_col, "pr.w1", "pr.w2")
    )
    # prune each side to the vocab independently: adjacency is over raw
    # positions, so per-token mapping == mapping the stream then pairing
    v1 = vocab.select(F.col("w").alias("_v1"))
    v2 = vocab.select(F.col("w").alias("_v2"))
    pm = (
        pairs.join(v1, pairs.w1 == v1._v1, "left")
        .join(v2, pairs.w2 == v2._v2, "left")
        .select(
            id_col,
            F.when(F.col("_v1").isNull(), F.lit(LM_UNK))
            .otherwise(F.col("w1")).alias("w1m"),
            F.when(F.col("_v2").isNull(), F.lit(LM_UNK))
            .otherwise(F.col("w2")).alias("w2m"),
        )
    )
    # r11: ONE pass over the bigram stream — pre-aggregate per-doc
    # mapped-bigram counts, then derive the model's bigram table FROM
    # that aggregate (bg = sum of per-doc counts) instead of running
    # the pm subtree once for bg and again for the scoring join. The
    # scoring sum weights each distinct (doc, bigram) row by cnt, so
    # avg-over-instances is sum(cnt*lp)/sum(cnt) — identical modulo
    # double rounding far below the round-6 output convention.
    pmc = pm.groupBy(id_col, "w1m", "w2m").agg(F.count("*").alias("cnt"))
    bg = pmc.groupBy("w1m", "w2m").agg(F.sum("cnt").alias("cb"))
    unim = vocab.select(
        F.col("w").alias("w1m"), F.col("cnt").alias("cu")
    ).unionByName(
        tots.select(
            F.lit(LM_UNK).alias("w1m"),
            (F.col("tot") - F.col("vtot")).alias("cu"),
        )
    )
    sc = (
        pmc.join(bg, ["w1m", "w2m"])
        .join(unim, "w1m")
        .crossJoin(F.broadcast(tots.select("vsize")))
        .select(
            id_col,
            "cnt",
            F.log(
                (F.col("cb") + F.lit(alpha))
                / (F.col("cu") + F.lit(alpha) * (F.col("vsize") + 1))
            ).alias("lp"),
        )
    )
    return sc.groupBy(id_col).agg(
        F.sum("cnt").alias("n_bigrams"),
        F.round(-(F.sum(F.col("cnt") * F.col("lp")) / F.sum("cnt")), 6)
        .alias("xent"),
    )


def bm25(docs, query_terms: list[str], id_col: str = "doc_id",
         text_col: str = "text", k1: float = 1.2, b: float = 0.75):
    """Okapi BM25 relevance of every document to a literal term query
    (Robertson/Sparck Jones; the standard retrieval scorer for
    query-driven corpus curation).  Returns ``[id_col, n_hit, bm25]``
    for documents containing >= 1 query term, bm25 rounded to 6
    digits (the engine-portable mean convention).

    Scale story: one explode feeds three map-side-combinable
    aggregations (per-doc tf over the |Q| query terms only, per-doc
    length, per-term df); corpus stats (N, avgdl) stay in-plan as a
    broadcast 1-row aggregate; the scoring join is |Q|-term-bounded
    per doc.  No window, no collect, no all-pairs anything.
    """
    toks = docs.select(id_col, F.explode(tokens(F.col(text_col))).alias("term"))
    hit = toks.where(F.col("term").isin(list(query_terms)))
    tf = hit.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dlen = toks.groupBy(id_col).agg(F.count("*").alias("dl"))
    stats = dlen.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    dfreq = (
        hit.select(id_col, "term").distinct()
        .groupBy("term").agg(F.count("*").alias("df"))
    )
    contrib = (
        F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1)
        * (F.col("tf") * (k1 + 1))
        / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl")))
    )
    return (
        tf.join(dlen, id_col)
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_hit"),
            F.round(F.sum(contrib), 6).alias("bm25"),
        )
    )


def dsir_select(docs, id_col: str, text_col: str, is_target,
                m: int = 64, k: int = 200):
    """DSIR-style data selection via importance resampling (Xie et
    al. 2023, "Data Selection for Language Models via Importance
    Resampling"): fit two bag-of-hashed-ngrams models — target
    (rows where ``is_target``) and source (all rows) — weight every
    document by its log importance ratio, and resample top-k under
    Gumbel perturbation (Gumbel-top-k == sampling without replacement
    proportional to the importance weights).

    Features are unigrams + word bigrams hashed into ``m`` buckets
    (h31, engine-portable); both models use add-1 smoothing, so
    log w(d) = sum_grams [ln(t_b+1) - ln(s_b+1)] + n_grams*[ln(S+m)
    - ln(T+m)].  The Gumbel key is a pure function of the doc id
    (md5-derived uniform), so selection is deterministic and
    reproducible across engines and partitionings.  Both logw and the
    selection key are round(·, 6) — the established convention that
    absorbs sub-ulp ln() differences between JVM and C libm.

    100 TB shape: the FIT is one explode + an m-group map-side-
    combinable aggregate collected as m rows (m = 64, driver-side
    trivially small; at petabyte scale fit on a hash-sample of the
    corpus instead — the estimator only needs bucket frequencies).
    The per-doc gram->bucket projection is persisted so fit and
    scoring share one tokenization pass.  SCORING is row-local
    against two m-element literal arrays (zero shuffle, zero join),
    and top-k is an orderBy+limit — Spark's TakeOrdered (per-
    partition heap + driver merge of k), never a global sort.

    Returns (id, n_grams, logw, key), the k selected rows.
    """
    from bd_spark.operators.hashing import lit_longs

    toks = tokens(F.col(text_col))
    grams = F.concat(toks, word_shingles(toks, 2))
    bks = F.transform(
        grams, lambda g: (h31(F.concat(F.lit("dsirg:"), g)) % m).cast("int")
    )
    base = docs.select(
        F.col(id_col), is_target.alias("__t"), bks.alias("__bk")
    ).persist()
    fit = (
        base.select(F.explode("__bk").alias("b"), "__t")
        .groupBy("b")
        .agg(
            F.count("*").alias("s"),
            F.sum(F.when(F.col("__t"), 1).otherwise(0)).alias("t"),
        )
    )
    by_b = {r["b"]: (r["s"], r["t"]) for r in fit.collect()}
    s_arr = [by_b.get(b, (0, 0))[0] for b in range(m)]
    t_arr = [by_b.get(b, (0, 0))[1] for b in range(m)]
    s_tot, t_tot = sum(s_arr), sum(t_arr)
    slit, tlit = lit_longs(s_arr), lit_longs(t_arr)
    shift = F.log(F.lit(float(s_tot + m))) - F.log(F.lit(float(t_tot + m)))
    part = F.aggregate(
        F.col("__bk"),
        F.lit(0.0),
        lambda acc, b: acc
        + F.log(F.element_at(tlit, b + 1) + F.lit(1))
        - F.log(F.element_at(slit, b + 1) + F.lit(1)),
    )
    logw = F.round(part + F.size("__bk") * shift, 6)
    u = (
        h31(F.concat(F.lit("dsir:"), F.col(id_col).cast("string"))) + 1
    ).cast("double") / F.lit(float(P31 + 1))
    gumbel = -F.log(-F.log(u))
    out = base.select(
        F.col(id_col),
        F.size("__bk").alias("n_grams"),
        logw.alias("logw"),
        F.round(logw + gumbel, 6).alias("key"),
    )
    return out.orderBy(F.desc("key"), id_col).limit(k)
