"""Repetition filters, bigram-LM surprisal, and deterministic sampling
(operators/text.py repetition_stats / lm_bigram_bits, operators/
sample.py).

Fixtures are hand- or brute-force-computed in Python; cross-engine
bit-exactness of the same operators is covered by the entry_queries4
oracle rows doc_repetition / lm_bigram_bits / corpus_sample
(tools/check_contract.py).
"""

import hashlib
from collections import Counter

import pytest
from pyspark.sql import Row, functions as F

from spapy_spark.operators import sample, text


# ---------------------------------------------------------------------------
# repetition_stats
# ---------------------------------------------------------------------------


def _brute_repetition(s):
    tk = s.split(" ")
    bgs = [" ".join(tk[i : i + 2]) for i in range(len(tk) - 1)]
    tris = [" ".join(tk[i : i + 3]) for i in range(len(tk) - 2)]
    bc = Counter(bgs)
    return {
        "n_bigrams": len(bgs),
        "top_bigram_n": max(bc.values()),
        "top_bigram_frac": max(bc.values()) / len(bgs),
        "n_trigrams": len(tris),
        "dup_trigram_frac": (len(tris) - len(set(tris))) / len(tris),
    }


def test_repetition_stats_brute(spark):
    docs = [
        "a b a b a b c",              # heavy bigram repetition
        "x y z w q r s t u v",        # all distinct
        "m m m m m",                  # one token repeated
        "p q p q p q p q",
    ]
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(docs)]
    )
    rows = {
        r["doc_id"]: r.asDict()
        for r in text.repetition_stats(df).collect()
    }
    assert len(rows) == len(docs)
    for i, t in enumerate(docs):
        exp = _brute_repetition(t)
        got = rows[i]
        for k, v in exp.items():
            assert got[k] == v, (i, k, got[k], v)


def test_repetition_short_docs_drop(spark):
    # <3 tokens -> no trigrams -> no output row (documented semantics)
    df = spark.createDataFrame(
        [Row(doc_id=0, text="a b"), Row(doc_id=1, text="a b c")]
    )
    out = text.repetition_stats(df).collect()
    assert [r["doc_id"] for r in out] == [1]


# ---------------------------------------------------------------------------
# lm_bigram_bits
# ---------------------------------------------------------------------------


def _brute_lm(docs):
    toks = [t for s in docs for t in s.split(" ")]
    c1 = Counter(toks)
    v = len(c1)
    c2 = Counter()
    for s in docs:
        tk = s.split(" ")
        for i in range(len(tk) - 1):
            c2[(tk[i], tk[i + 1])] += 1
    out = {}
    for did, s in enumerate(docs):
        tk = s.split(" ")
        bits = 0
        n = 0
        for i in range(len(tk) - 1):
            w1, w2 = tk[i], tk[i + 1]
            bits += (c1[w1] + v).bit_length() - 1
            bits -= (c2[(w1, w2)] + 1).bit_length() - 1
            n += 1
        if n:
            out[did] = (n, bits, bits / n)
    return out


def test_lm_bigram_bits_brute(spark):
    docs = [
        "the cat sat on the mat",
        "the cat sat on the cat",
        "zz qq vv zz qq vv",
        "the the the the",
    ]
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(docs)]
    )
    got = {
        r["doc_id"]: (r["n_bigrams"], r["bits"], r["bits_per_bigram"])
        for r in text.lm_bigram_bits(df).collect()
    }
    assert got == _brute_lm(docs)


def test_lm_bits_nonnegative_and_fluency_ordering(spark):
    # a doc made of the corpus's most common bigrams must score fewer
    # bits/bigram than a doc of one-off bigrams
    docs = [" ".join(["a b"] * 20), "c d e f g h i j k l"]
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(docs)]
    )
    rows = {r["doc_id"]: r for r in text.lm_bigram_bits(df).collect()}
    assert rows[0]["bits"] >= 0 and rows[1]["bits"] >= 0
    assert rows[0]["bits_per_bigram"] < rows[1]["bits_per_bigram"]


# ---------------------------------------------------------------------------
# sampling
# ---------------------------------------------------------------------------


def _bucket(key, buckets=100, salt=""):
    h = hashlib.md5((salt + str(key)).encode()).hexdigest()
    return int(h[:7], 16) % buckets


def test_hash_sample_matches_reference_hash(spark):
    df = spark.createDataFrame([Row(doc_id=i) for i in range(500)])
    out = sample.hash_sample(df, "doc_id", pct=30).collect()
    exp = {i for i in range(500) if _bucket(i) < 30}
    assert {r["doc_id"] for r in out} == exp
    for r in out:
        assert r["bucket"] == _bucket(r["doc_id"])
    # ~30% of 500 with md5 uniformity
    assert 100 < len(out) < 200


def test_hash_sample_partitioning_invariant(spark):
    df = spark.createDataFrame([Row(doc_id=i) for i in range(300)])
    a = sorted(
        r["doc_id"]
        for r in sample.hash_sample(df.repartition(1), "doc_id", 50).collect()
    )
    b = sorted(
        r["doc_id"]
        for r in sample.hash_sample(df.repartition(13), "doc_id", 50).collect()
    )
    assert a == b


def test_stratified_cap(spark):
    rows = [
        Row(doc_id=i, domain=f"d{i % 3}") for i in range(90)
    ]
    df = spark.createDataFrame(rows)
    out = sample.stratified_cap(df, "domain", k=5, id_col="doc_id").collect()
    by_dom = Counter(r["domain"] for r in out)
    assert by_dom == {"d0": 5, "d1": 5, "d2": 5}
    # winners are the 5 smallest by (hash, id) within each stratum
    for dom in ["d0", "d1", "d2"]:
        ids = [i for i in range(90) if f"d{i % 3}" == dom]
        exp = sorted(ids, key=lambda i: (_bucket(i, 1 << 28), i))[:5]
        got = sorted(
            (r["rk"], r["doc_id"]) for r in out if r["domain"] == dom
        )
        assert [i for _, i in got] == sorted(exp, key=lambda i: (
            _bucket(i, 1 << 28), i))


# ---------------------------------------------------------------------------
# normalize_text + inverted_index
# ---------------------------------------------------------------------------


def test_normalize_text(spark):
    df = spark.createDataFrame(
        [Row(text="  Hello,   WORLD!! it's 42&co --- ")]
    )
    out = text.normalize_text(df).select("norm").first()[0]
    assert out == "hello world it s 42 co"


def test_inverted_index_brute(spark):
    docs = {
        0: "a b a c",
        1: "b c c",
        2: "a d",
        3: "d d d",
    }
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in docs.items()]
    )
    got = {
        r["tok"]: (r["n_occurrences"], r["n_docs"], r["postings"])
        for r in text.inverted_index(df, k_postings=2).collect()
    }
    exp = {}
    occ = Counter()
    by_tok = {}
    for did, t in docs.items():
        for tok in t.split(" "):
            occ[tok] += 1
            by_tok.setdefault(tok, set()).add(did)
    for tok, ids in by_tok.items():
        exp[tok] = (
            occ[tok],
            len(ids),
            ",".join(str(i) for i in sorted(ids)[:2]),
        )
    assert got == exp


def test_inverted_index_postings_numeric_order(spark):
    # doc 10 must sort after doc 2 (numeric, not lexicographic)
    df = spark.createDataFrame(
        [Row(doc_id=i, text="z") for i in (10, 2, 1)]
    )
    r = text.inverted_index(df, k_postings=10).first()
    assert r["postings"] == "1,2,10"


def test_hash_sample_pct_bounds(spark):
    df = spark.createDataFrame([Row(doc_id=1)])
    with pytest.raises(ValueError):
        sample.hash_sample(df, "doc_id", pct=101)
    with pytest.raises(ValueError):
        sample.stratified_cap(df, "doc_id", k=0, id_col="doc_id")


# ---------------------------------------------------------------------------
# dup_spans + contamination
# ---------------------------------------------------------------------------


def _spans(s, n):
    tk = s.split(" ")
    return [" ".join(tk[i : i + n]) for i in range(len(tk) - n + 1)]


def test_dup_spans_brute(spark):
    from spapy_spark.operators import dedup

    docs = {
        0: "a b c d e f",          # shares "a b c" with doc 1
        1: "x a b c y z",
        2: "p q r s t u",          # unique
        3: "m m m m m",            # self-duplicated spans
    }
    n = 3
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in docs.items()]
    )
    got = {
        r["doc_id"]: (r["n_spans"], r["n_dup_spans"], r["dup_span_frac"])
        for r in dedup.dup_spans(df, n=n).collect()
    }
    allsp = Counter(sp for t in docs.values() for sp in _spans(t, n))
    exp = {}
    for did, t in docs.items():
        sp = _spans(t, n)
        dup = sum(1 for s in sp if allsp[s] > 1)
        exp[did] = (len(sp), dup, dup / len(sp))
    assert got == exp


def test_contamination_eval_self_hit(spark):
    from spapy_spark.operators import dedup

    docs = {
        0: "a b c d e f g h i j",
        1: "k l m n o p q r s t",
        2: "a b c d e f g h zz ww",   # shares doc 0's prefix spans
    }
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in docs.items()]
    )
    ev = df.where(F.col("doc_id") == 0)
    got = {
        r["doc_id"]: (r["n_spans"], r["n_eval_spans"])
        for r in dedup.contamination(df, ev, n=8).collect()
    }
    # doc 0: all 3 of its 8-grams are in the eval set (itself)
    # doc 2: its first 8-gram "a b c d e f g h" matches doc 0's first
    assert got[0] == (3, 3)
    assert got[1] == (3, 0)
    assert got[2] == (3, 1)
