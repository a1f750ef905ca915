"""Text analysis for large-scale training-data pipelines.

All operators here are pure built-in Spark SQL (JVM-side, whole-stage
codegen — zero Python in the hot path): token counting, stopword-based
language ID, quality scoring, and polynomial document fingerprinting.

These extend the reference's surface (SpaPy has no text ops) per the
driver's training-data-pipeline mandate; each has a DuckDB-oracle
query in entry_queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "for")

# Rabin-style rolling-hash modulus (fits acc*31+ch in int64)
FP_MOD = 1_000_000_007


def tokens(df: DataFrame, text_col: str = "text", out: str = "tok") -> DataFrame:
    """Whitespace tokenizer → exploded (id rows duplicated per token)."""
    return df.withColumn(out, F.explode(F.split(F.col(text_col), " ")))


def token_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-doc token count / distinct count / stopword count / char sum.

    Integer-only aggregates — no FP nondeterminism anywhere.
    """
    stop_list = ",".join(f"'{w}'" for w in STOPWORDS)
    t = tokens(df.select(id_col, text_col), text_col)
    return t.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("tok").alias("n_distinct"),
        F.sum(
            F.expr(f"CASE WHEN tok IN ({stop_list}) THEN 1 ELSE 0 END")
        ).alias("n_stop"),
        F.sum(F.length("tok")).alias("n_chars_tok"),
    )


def quality_scores(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Quality scoring: stopword ratio, type-token ratio, mean token
    length — the standard web-corpus quality heuristics (double ratios
    of exact integers → bit-identical across engines)."""
    s = token_stats(df, id_col, text_col)
    return s.select(
        id_col,
        (F.col("n_stop") / F.col("n_tokens")).alias("stop_ratio"),
        (F.col("n_distinct") / F.col("n_tokens")).alias("ttr"),
        (F.col("n_chars_tok") / F.col("n_tokens")).alias("avg_tok_len"),
    )


def lang_guess(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    threshold_pct: int = 5,
) -> DataFrame:
    """n-gram-free language ID heuristic: English stopword density.

    ``n_stop * 100 >= n_tokens * threshold_pct`` → 'en' (integer
    comparison — deterministic)."""
    s = token_stats(df, id_col, text_col)
    return s.select(
        id_col,
        F.when(
            F.col("n_stop") * 100 >= F.col("n_tokens") * threshold_pct, "en"
        ).otherwise("other").alias("lang_guess"),
    )


_NGRAM_PROFILES = {
    # distinctive character trigrams per language (public linguistics
    # commonplace: frequency-profile n-gram language ID)
    "de": ("der", "ein", "ich", "sch", "und", "die", "cht", "gen"),
    "en": ("the", "and", "ing", "ion", "ent", "her", "for", "tha"),
    "es": ("que", "ión", "los", "ado", "nte", "era", "com", "par"),
    "fr": ("les", "ent", "une", "our", "ait", "eur", "est", "ans"),
}


def lang_ngram(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Character-trigram language ID: slide a 3-char window over the
    lowercased text, count hits against each language's trigram
    profile, argmax with deterministic (score desc, language asc)
    tie-break.  Pure built-in SQL — trigram explode via sequence +
    substring, integer scores only.
    """
    tri = df.select(
        id_col,
        F.explode(
            F.expr(
                f"transform(sequence(1, greatest(length({text_col}) - 2, 1)),"
                f" i -> substring(lower({text_col}), i, 3))"
            )
        ).alias("tri"),
    )
    aggs = []
    for lang in sorted(_NGRAM_PROFILES):
        lst = ",".join(f"'{t}'" for t in _NGRAM_PROFILES[lang])
        aggs.append(
            F.sum(
                F.expr(f"CASE WHEN tri IN ({lst}) THEN 1 ELSE 0 END")
            ).alias(f"s_{lang}")
        )
    g = tri.groupBy(id_col).agg(*aggs)
    langs = sorted(_NGRAM_PROFILES)
    best = F.greatest(*[F.col(f"s_{l}") for l in langs])
    pick = None
    for lang in reversed(langs):  # earlier language wins ties
        cond = F.col(f"s_{lang}") == best
        pick = F.when(cond, lang) if pick is None else F.when(
            cond, lang
        ).otherwise(pick)
    return g.select(
        id_col, *[f"s_{l}" for l in langs], pick.alias("lang_pred")
    )


def fingerprint(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    out: str = "fp",
) -> DataFrame:
    """Polynomial rolling hash over the raw characters, mod FP_MOD.

    fold(chars, 0, acc*31 + ord(ch) mod p) — a classic Rabin document
    fingerprint, fully JVM-side via ``aggregate`` over ``split``.
    The byte-identity invariant check rides on this: equal fp ⇒ equal
    text bytes (mod collisions); tests pair it with full equality.
    """
    expr = (
        f"aggregate(split({text_col}, ''), 0L,"
        f" (acc, ch) -> (acc * 31 + ascii(ch)) % {FP_MOD})"
    )
    return df.withColumn(out, F.expr(expr))


def text_sha256(
    df: DataFrame, text_col: str = "text", out: str = "text_sha"
) -> DataFrame:
    """Cryptographic per-row fingerprint of the text bytes — the
    stage-over-stage byte-identity guard (input_hint invariant)."""
    return df.withColumn(out, F.sha2(F.col(text_col), 256))


# ---------------------------------------------------------------------------
# Repetition filters (Gopher-style) + n-gram LM surprisal
# ---------------------------------------------------------------------------


def _ngram_array(text_col: str, n: int) -> F.Column:
    """Word n-grams of a space-separated text column as an array of
    space-joined strings; docs shorter than ``n`` tokens yield an empty
    array (no padding tokens are ever invented)."""
    t = f"split({text_col}, ' ')"
    return F.expr(
        f"CASE WHEN size({t}) < {n} THEN array()"
        f" ELSE transform(sequence(1, size({t}) - {n - 1}),"
        f" i -> concat_ws(' ', slice({t}, i, {n}))) END"
    )


def repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-doc repetition signals (the Gopher/MassiveText family of
    filters): most-frequent-bigram fraction and duplicate-trigram
    fraction.  High values flag boilerplate/spam pages for removal
    before LLM training.

    All counts are exact integers; the two fractions are single IEEE
    divides of those integers (bit-identical across engines).  Two
    map-side-combined aggregations keyed by doc_id — scales as a plain
    word-count.  Docs shorter than 3 tokens have no trigrams and drop
    out (inner join; documented, not padded).
    """
    bg = df.select(id_col, F.explode(_ngram_array(text_col, 2)).alias("bg"))
    bgc = bg.groupBy(id_col, "bg").agg(F.count(F.lit(1)).alias("c"))
    bstats = bgc.groupBy(id_col).agg(
        F.sum("c").alias("n_bigrams"),
        F.max("c").alias("top_bigram_n"),
    )
    tri = df.select(id_col, F.explode(_ngram_array(text_col, 3)).alias("tri"))
    tstats = tri.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_trigrams"),
        F.countDistinct("tri").alias("n_distinct_tri"),
    )
    return bstats.join(tstats, id_col).select(
        id_col,
        F.col("n_bigrams").cast("long").alias("n_bigrams"),
        F.col("top_bigram_n").cast("long").alias("top_bigram_n"),
        (F.col("top_bigram_n") / F.col("n_bigrams")).alias("top_bigram_frac"),
        F.col("n_trigrams").cast("long").alias("n_trigrams"),
        (
            (F.col("n_trigrams") - F.col("n_distinct_tri"))
            / F.col("n_trigrams")
        ).alias("dup_trigram_frac"),
    )


def _ilog2(c: F.Column) -> F.Column:
    """floor(log2(x)) for positive integers, computed EXACTLY as
    bit-length - 1 (``length(bin(x)) - 1``) — no float log anywhere, so
    the quantized surprisal below is integer-deterministic on any
    engine and any summation order."""
    return F.length(F.bin(c)) - F.lit(1)


def lm_bigram_bits(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Corpus-trained bigram-LM surprisal per document — the KenLM-style
    quality signal (fluent text scores low, gibberish high), quantized
    to integer bits so the score is bit-exact at any scale.

    Model: add-one-smoothed bigram LM over the corpus itself.  Each
    bigram (w1, w2) contributes ``ilog2(c1(w1) + V) - ilog2(c2(w1,w2)
    + 1)`` bits — the floor-log2 quantization of -log2 P(w2 | w1) —
    where c1/c2 are corpus unigram/bigram counts and V the vocabulary
    size.  Integer everywhere: the per-doc sum is order-independent,
    unlike a float ln() sum (the usual cross-engine perplexity trap).

    Plan shape: token explode → two map-side-combined count aggs (the
    term and bigram dictionaries), one shuffle join of the bigram
    stream on (w1, w2), one broadcast-sized join on w1, final agg on
    doc_id.  Dictionaries ≪ corpus (bounded vocab), so at 100 TB the
    joins broadcast or SMJ as AQE stats dictate — no driver collect.
    """
    toks = df.select(
        id_col, F.explode(F.split(F.col(text_col), " ")).alias("tok")
    )
    c1 = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c1"))
    vocab = toks.select(F.countDistinct("tok").alias("v"))
    t = f"split({text_col}, ' ')"
    pairs = F.expr(
        f"CASE WHEN size({t}) < 2 THEN array()"
        f" ELSE transform(sequence(1, size({t}) - 1),"
        f" i -> named_struct('w1', element_at({t}, i),"
        f" 'w2', element_at({t}, i + 1))) END"
    )
    e = df.select(id_col, F.explode(pairs).alias("p")).select(
        id_col, F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
    )
    c2 = e.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    j = (
        e.join(c2, ["w1", "w2"])
        .join(c1.withColumnRenamed("tok", "w1"), "w1")
        .crossJoin(F.broadcast(vocab))
    )
    bits = _ilog2(F.col("c1") + F.col("v")) - _ilog2(F.col("c2") + F.lit(1))
    agg = j.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum(bits).alias("bits"),
    )
    return agg.select(
        id_col,
        F.col("n_bigrams").cast("long").alias("n_bigrams"),
        F.col("bits").cast("long").alias("bits"),
        (F.col("bits") / F.col("n_bigrams")).alias("bits_per_bigram"),
    )


# ---------------------------------------------------------------------------
# Text normalization + inverted index
# ---------------------------------------------------------------------------


def normalize_text(
    df: DataFrame, text_col: str = "text", out: str = "norm"
) -> DataFrame:
    """Canonical pre-tokenization normalization: lowercase, map every
    non-alphanumeric run to one space, trim.  One regexp_replace
    codegen chain, zero shuffle — the step that makes exact-dedup
    hashes robust to case/punctuation noise (RE2-safe pattern, same
    bytes out of any engine)."""
    c = F.lower(F.col(text_col))
    c = F.regexp_replace(c, r"[^a-z0-9]+", " ")
    return df.withColumn(out, F.trim(c))


def inverted_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k_postings: int = 10,
) -> DataFrame:
    """Search-index build: per term, total occurrences, document
    frequency, and the first ``k_postings`` doc ids (ascending) as a
    comma-joined posting sample.

    Scale shape: the per-term doc list is CAPPED BEFORE collection —
    a row_number window with a pushed WindowGroupLimit keeps at most
    k rows per term ahead of the exchange, so a stop-word's billion
    postings never materialize in one task (the classic index-build
    OOM).  Counts aggregate separately map-side-combined; one join on
    the term key puts stats and postings back together."""
    toks = df.select(
        id_col, F.explode(F.split(F.col(text_col), " ")).alias("tok")
    )
    td = toks.groupBy("tok", id_col).agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("tok").orderBy(id_col)
    postings = (
        td.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k_postings)
        .groupBy("tok")
        .agg(
            # sort NUMERICALLY first, stringify after — string sort
            # would put doc 10 before doc 2
            F.array_join(
                F.expr(
                    f"transform(sort_array(collect_list({id_col})),"
                    " x -> cast(x as string))"
                ),
                ",",
            ).alias("postings")
        )
    )
    stats = td.groupBy("tok").agg(
        F.sum("c").cast("long").alias("n_occurrences"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
    )
    return stats.join(postings, "tok").select(
        "tok", "n_occurrences", "n_docs", "postings"
    )
