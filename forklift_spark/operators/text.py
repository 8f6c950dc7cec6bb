"""Text-analysis operators for document corpora (no reference
counterpart; the per-document scoring passes of a training-data
pipeline). All pure built-in functions — one projection pass per
operator, no shuffle, no UDFs; at 100 TB these run at scan speed.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from forklift_spark.operators.dedup import normalize_text

# BPE-ish tokenizer: letter runs, digit runs, single other-symbols.
TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# tiny per-language marker vocabularies for the n-gram/stopword heuristic
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is"),
    "de": ("der", "die", "und", "nicht", "das"),
    "es": ("el", "la", "que", "de", "los"),
    "fr": ("le", "la", "et", "les", "des"),
    "zh": ("的", "是", "不", "了", "在"),
}

STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")


def words(col: Column | str) -> Column:
    return F.split(normalize_text(col), " ")


def word_count(col: Column | str) -> Column:
    return F.size(words(col))


def token_count(col: Column | str) -> Column:
    """BPE-ish token count via regexp — the cheap len-proxy for LLM
    budgeting (a real tokenizer would be a pandas UDF; this stays JVM)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(TOKEN_RE))


def _count_in(ws: Column, vocab: tuple[str, ...]) -> Column:
    return F.size(F.filter(ws, lambda w: w.isin(*vocab)))


def stopword_ratio(col: Column | str) -> Column:
    ws = words(col)
    return _count_in(ws, STOPWORDS).cast("double") / F.size(ws).cast("double")


def punct_count(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(r"[^\w\s]"))


def quality_score(col: Column | str) -> Column:
    """Heuristic document quality in [0,1]: penalize extreme length,
    high punctuation density, and stopword-free (keyword-stuffed) text.
    Integer counts + double arithmetic -> engine-exact."""
    c = F.col(col) if isinstance(col, str) else col
    n_chars = F.length(c).cast("double")
    wc = word_count(col).cast("double")
    punct_ratio = punct_count(col).cast("double") / n_chars
    sw = stopword_ratio(col)
    len_ok = F.when((wc >= 10) & (wc <= 1000), F.lit(1.0)).otherwise(F.lit(0.5))
    return (
        len_ok * (F.lit(1.0) - punct_ratio) * (F.lit(0.5) + F.lit(0.5) * F.least(sw * 5, F.lit(1.0)))
    )


# PII patterns chosen for cross-engine regex portability (Java regex ==
# RE2 semantics for these constructs: char classes, bounded reps, \b)
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    "phone": (r"\+\d[\d()\- ]{7,}\d", "[PHONE]"),
}


def pii_counts(col: Column | str) -> list[Column]:
    """Match count per PII class, aliased n_<class> — the audit pass a
    corpus runs before redaction (one scan, JVM regex)."""
    c = F.col(col) if isinstance(col, str) else col
    return [
        F.regexp_count(c, F.lit(pat)).alias(f"n_{name}")
        for name, (pat, _) in PII_PATTERNS.items()
    ]


def redact_pii(col: Column | str) -> Column:
    """Replace emails / IPv4s / phone numbers with typed placeholders.
    Chained regexp_replace — single projection pass, scan-speed at
    100 TB; patterns are RE2-compatible so an oracle engine agrees."""
    c = F.col(col) if isinstance(col, str) else col
    for _name, (pat, repl) in PII_PATTERNS.items():
        c = F.regexp_replace(c, pat, repl)
    return c


def lang_scores(col: Column | str) -> list[Column]:
    """Marker-hit count per language, aliased score_<lang>."""
    ws = words(col)
    return [
        _count_in(ws, markers).alias(f"score_{lang}")
        for lang, markers in LANG_MARKERS.items()
    ]


def predicted_lang() -> Column:
    """argmax over the score_<lang> columns (ties -> lexicographic lang
    order), 'unknown' when every score is zero. Use after lang_scores."""
    langs = sorted(LANG_MARKERS)
    best = None
    for lang in langs:
        s = F.col(f"score_{lang}")
        if best is None:
            best = F.struct(s.alias("score"), F.lit(lang).alias("lang"))
        else:
            cand = F.struct(s.alias("score"), F.lit(lang).alias("lang"))
            best = F.when(cand["score"] > best["score"], cand).otherwise(best)
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("unknown"))


def word_bigrams(col: Column | str) -> Column:
    """Adjacent-word bigram array, built array-side (no explode/window):
    zip the word array against itself shifted by one. One projection —
    at corpus scale this is a scan-speed pass like the other scorers."""
    ws = words(col)
    n = F.size(ws)
    return F.zip_with(
        F.slice(ws, 1, n - 1),
        F.slice(ws, 2, n - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )


def repetition_stats(df, id_col: str, text_col: str):
    """Gopher-style repetition quality signals per document:

    - dup_word_ratio    1 - distinct words / total words
    - top_bigram_ratio  occurrences of the most frequent bigram / total
      bigrams (boilerplate and spam text repeat a few phrases)

    Both are array aggregations in one projection — no shuffle at all;
    the repetitious-document filter stays a scan over the corpus.
    (Gopher rule-of-thumb cutoffs: drop docs with top-2-gram ratio
    > 0.18; see Rae et al. 2021, "Scaling Language Models", table A1.)
    """
    ws = words(F.col(text_col))
    bg = word_bigrams(F.col(text_col))
    # most-frequent-element count without a groupBy: sort the array and
    # count the longest run via aggregate over (run, best, prev)
    top_run = F.aggregate(
        F.array_sort(bg),
        F.struct(
            F.lit(0).alias("run"), F.lit(0).alias("best"), F.lit(None).cast("string").alias("prev")
        ),
        lambda acc, x: F.struct(
            F.when(acc["prev"].isNull() | (acc["prev"] != x), F.lit(1))
            .otherwise(acc["run"] + 1)
            .alias("run"),
            F.greatest(
                acc["best"],
                F.when(acc["prev"].isNull() | (acc["prev"] != x), F.lit(1)).otherwise(
                    acc["run"] + 1
                ),
            ).alias("best"),
            x.alias("prev"),
        ),
        lambda acc: acc["best"],
    )
    return df.select(
        F.col(id_col),
        F.size(ws).cast("bigint").alias("n_words"),
        (
            F.lit(1.0)
            - F.size(F.array_distinct(ws)).cast("double") / F.size(ws).cast("double")
        ).alias("dup_word_ratio"),
        (top_run.cast("double") / F.size(bg).cast("double")).alias("top_bigram_ratio"),
    )


def chunk_tokens(
    df,
    id_col: str,
    text_col: str,
    chunk_size: int = 256,
    overlap: int = 0,
):
    """Token-window document chunking — the context-window splitter of
    an LLM pipeline (RAG passage indexing, training-sample assembly):
    whitespace tokens sliced into windows of ``chunk_size`` tokens with
    ``overlap`` tokens shared between consecutive chunks (stride =
    chunk_size - overlap). The final chunk keeps its tail even when
    short, so every token appears in at least one chunk; documents with
    zero tokens produce zero chunks.

    One projection + posexplode — the token array, the window starts
    (``sequence``), and the slices (``slice``/``array_join``) are all
    built-in array functions, so chunking runs at scan speed with no
    shuffle and no Python; output fan-out is ~n_tokens/stride rows per
    document. Catalog twin: ``q_doc_chunking`` (queries/text.py) pins
    the same windowing against a DuckDB oracle with a slightly
    different tail rule (it suppresses final windows the previous chunk
    already covers; this operator keeps every tail so no token is ever
    chunk-less — the better default for training-sample assembly).

    Returns (id_col, chunk_id, n_tokens, chunk_text), chunk_id dense
    from 0 in document order.
    """
    if not 0 <= int(overlap) < int(chunk_size):
        raise ValueError("need 0 <= overlap < chunk_size")
    stride = int(chunk_size) - int(overlap)
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.when(
        F.length(F.trim(F.col(text_col))) == 0, F.lit(0)
    ).otherwise(F.size(toks))
    starts = F.when(
        n > 0, F.sequence(F.lit(0), n - 1, F.lit(stride))
    ).otherwise(F.array().cast("array<int>"))
    return (
        df.select(
            F.col(id_col).alias("_id"),
            toks.alias("_t"),
            n.alias("_n"),
            starts.alias("_st"),
        )
        .select(
            "_id", "_t", "_n",
            F.posexplode("_st").alias("chunk_id", "_start"),
        )
        .select(
            F.col("_id").alias(id_col),
            F.col("chunk_id").cast("int").alias("chunk_id"),
            F.least(F.lit(int(chunk_size)), F.col("_n") - F.col("_start"))
             .cast("int").alias("n_tokens"),
            F.array_join(
                F.slice("_t", F.col("_start") + 1, F.lit(int(chunk_size))),
                " ",
            ).alias("chunk_text"),
        )
    )


def winnow_fingerprints(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    w: int = 4,
):
    """Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
    SIGMOD 2003): hash every k-char gram of the normalized text, slide a
    w-gram window, keep each window's minimum hash. Guarantees that any
    shared substring of length >= k + w - 1 between two documents yields
    at least one shared fingerprint — the local-fingerprint property
    the single-global-min "winnowing-lite" signature lacks.

    Engine-exactness: gram hashes are fixed-width md5 hex slices, so the
    window MIN is a plain lexicographic string min in every engine. The
    output is the SET of selected hashes (the paper's positions are a
    match-localization extra; dedup joins need only the hashes, and
    dropping them halves the per-gram expression work).

    Returns DataFrame(doc_id, fp) of DISTINCT selected fingerprints.
    """
    from forklift_spark.functions.hashing import md5_long

    # Winnowing is per-document, so the whole selection runs as array
    # expressions inside the scan projection — ZERO shuffle, no window
    # exchange, and the parent text is never replicated per gram (an
    # exploded-gram + window formulation measured slower at sf0.1: every
    # exploded row carries the full document string to the window
    # shuffle, and WindowExec re-sorts what is already per-row local).
    # The sliding min is array_min over a w-slice; array_distinct
    # collapses windows that picked the same gram.
    keyarr = (
        f"transform(sequence(1, length(_norm) - {k} + 1), i -> "
        f"substring(md5(concat('w:', substring(_norm, i, {k}))), 1, 15))"
    )
    selected = (
        f"array_distinct(transform(sequence(1, length(_norm) - {k} + 1 - {w} + 1), "
        f"p -> array_min(slice(_keys, p, {w}))))"
    )
    return (
        df.select(F.col(id_col).alias("doc_id"), normalize_text(F.col(text_col)).alias("_norm"))
        .filter(F.length("_norm") >= k + w - 1)  # need >= 1 full window
        # single-element explode = a Generate barrier: CollapseProject would
        # otherwise inline _keys into the w-slice lambda and recompute the
        # whole md5 array once per window position
        .select("doc_id", F.explode(F.array(F.expr(keyarr))).alias("_keys"), F.col("_norm"))
        .select("doc_id", F.explode(F.expr(selected)).alias("fp"))
    )
