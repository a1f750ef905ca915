"""Deduplication operators for web-scale corpora.

Exact, MinHash+LSH, SimHash, and n-gram-Jaccard dedup — the standard
training-data pipeline ladder.  Everything is built-in Spark SQL
(JVM-side): token hashes derive from ``md5`` hex prefixes so the
DuckDB oracles reproduce them bit-for-bit (entry_queries.py), and all
arithmetic stays under 2^63 (both engines run ANSI overflow checks).

Scale notes: signatures are one shuffle (groupBy doc); LSH candidate
generation is a self-equi-join on (band, band_hash) — the classic
banding trick keeps the pair space near-linear; exact Jaccard verify
runs only on band-collision candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .text import tokens

_P = 2_147_483_647  # 2^31 - 1 (Mersenne)

# deterministic universal-hash parameters (a odd, < 2^31)
_A = [
    1664525, 22695477, 69069, 1103515245, 134775813, 214013, 16843009,
    1000000007, 747796405, 278846, 1274126177, 1664525 * 3 % _P,
    987654323, 192837465, 564738291, 13579753,
]
_B = [
    1013904223, 1, 362437, 12345, 1, 2531011, 826366247, 998244353,
    2891336453 % _P, 9576890767 % _P, 1406932606, 654321, 192837,
    1029384756 % _P, 555555555, 77777777,
]


def token_hash_col(tok_col: str = "tok") -> F.Column:
    """32-bit token hash from the md5 hex prefix — reproducible in any
    SQL engine (``('0x' || substr(md5(tok), 1, 8))::BIGINT``)."""
    return F.conv(F.substring(F.md5(F.col(tok_col)), 1, 8), 16, 10).cast("long")


def exact_dedup(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Hash-groupBy exact dedup: one representative (min id) per
    distinct text + duplicate count."""
    return df.groupBy(F.md5(F.col(text_col)).alias("h")).agg(
        F.count(F.lit(1)).alias("n_dups"),
        F.min(id_col).alias("rep_" + id_col),
    )


def minhash_signatures(
    df: DataFrame,
    n_hashes: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """MinHash signature per doc: min over distinct tokens of
    ``(a_i * th + b_i) mod p`` for each of ``n_hashes`` functions.

    One explode + one groupBy (partial-agg min combines map-side).
    Output columns: id, mh0..mh{n-1}.
    """
    if n_hashes > len(_A):
        raise ValueError(f"n_hashes <= {len(_A)}")
    t = tokens(df.select(id_col, text_col), text_col).select(
        id_col, token_hash_col().alias("th")
    )
    aggs = [
        F.min((F.lit(_A[i]) * F.col("th") + F.lit(_B[i])) % F.lit(_P)).alias(
            f"mh{i}"
        )
        for i in range(n_hashes)
    ]
    return t.groupBy(id_col).agg(*aggs)


def minhash_bands(
    sigs: DataFrame,
    bands: int = 4,
    rows_per_band: int = 4,
    id_col: str = "doc_id",
) -> DataFrame:
    """LSH banding: (id, band, band_hash) — docs sharing any band hash
    are near-dup candidates."""
    outs = []
    for b in range(bands):
        h = F.lit(0).cast("long")
        for r in range(rows_per_band):
            h = h * 1_000_003 % F.lit(_P) + F.col(f"mh{b * rows_per_band + r}")
        outs.append(
            sigs.select(
                F.col(id_col), F.lit(b).alias("band"),
                (h % F.lit(_P)).alias("band_hash"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def minhash_candidate_pairs(
    df: DataFrame,
    n_hashes: int = 16,
    bands: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Distinct candidate pairs (a < b) from LSH band collisions."""
    sigs = minhash_signatures(df, n_hashes, id_col, text_col)
    bnd = minhash_bands(sigs, bands, n_hashes // bands, id_col)
    left = bnd.select(
        F.col("band"), F.col("band_hash"), F.col(id_col).alias("id_a")
    )
    right = bnd.select(
        F.col("band"), F.col("band_hash"), F.col(id_col).alias("id_b")
    )
    pairs = left.join(right, ["band", "band_hash"]).where(
        F.col("id_a") < F.col("id_b")
    )
    return pairs.select("id_a", "id_b").distinct()


def jaccard_pairs(
    df: DataFrame,
    shingle_len: int = 3,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: int | None = None,
) -> DataFrame:
    """Exact n-gram (token shingle) Jaccard over all colliding pairs.

    shingles → distinct (id, shingle) → self-join on shingle →
    intersection counts → |A∪B| = |A|+|B|−|A∩B|.  Output (id_a, id_b,
    inter, union_n) with Jaccard ≥ threshold, integer counts only
    (the caller divides; keeps the oracle FP-free).

    ``max_df`` caps shingle document frequency: shingles present in
    more than ``max_df`` documents are dropped from the vocabulary
    (both sizes and intersections — capped-vocabulary Jaccard, the
    standard stop-phrase guard).  Without it one ubiquitous shingle
    makes the self-join reducer quadratic in the corpus; with it the
    candidate pair space stays near-linear at any scale.
    """
    src = df.where(
        F.size(F.split(F.col(text_col), " ")) >= shingle_len
    )
    sh = src.select(
        F.col(id_col),
        F.explode(
            F.expr(
                f"transform(sequence(0, size(split({text_col}, ' ')) -"
                f" {shingle_len}),"
                f" i -> concat_ws(' ', slice(split({text_col}, ' '),"
                f" i + 1, {shingle_len})))"
            )
        ).alias("sh"),
    ).distinct()
    if max_df is not None:
        keep = (
            sh.groupBy("sh")
            .agg(F.count(F.lit(1)).alias("__df"))
            .where(F.col("__df") <= max_df)
            .select("sh")
        )
        sh = sh.join(keep, "sh")
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col(id_col).alias("id_a"), "sh")
    b = sh.select(F.col(id_col).alias("id_b"), "sh")
    inter = (
        a.join(b, "sh")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("nb"))
    j = (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("union_n", F.col("na") + F.col("nb") - F.col("inter"))
    )
    # integer threshold test: inter/union >= t  ⇔  inter*K >= union*(t*K)
    k = 1_000_000
    return j.where(
        F.col("inter") * k >= F.col("union_n") * int(threshold * k)
    ).select("id_a", "id_b", "inter", "union_n")


def embedding_near_dup_pairs(
    vectors,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 1234,
):
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine ≥
    threshold) via hyperplane-LSH bucketing + exact in-bucket re-rank.

    Near-identical vectors share the sign bucket with probability
    (1 − θ/π)^n_planes ≈ 1 for tiny angles θ, so the candidate join is
    a plain equi-join on the bucket key; exact cosine verifies.  Scale
    path of the dedup ladder's embedding rung (brute force = ann.
    cosine_topk at test scale).
    """
    from pyspark.sql import functions as F

    from .ann import _norms, add_lsh_bucket

    b = add_lsh_bucket(vectors, dim, n_planes, id_col, vec_col, seed=seed)
    left = b.select(F.col("bucket"), F.col(id_col).alias("id_a"),
                    F.col(vec_col).alias("__va"))
    right = b.select(F.col("bucket"), F.col(id_col).alias("id_b"),
                     F.col(vec_col).alias("__vb"))
    cand = left.join(right, "bucket").where(F.col("id_a") < F.col("id_b"))
    dots = cand.select(
        "id_a", "id_b",
        F.expr(
            "aggregate(zip_with(__va, __vb,"
            " (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
            " 0D, (acc, v) -> acc + v)"
        ).alias("dot"),
    )
    na = _norms(vectors, id_col, vec_col).select(
        F.col(id_col).alias("id_a"), F.col("norm").alias("na"))
    nb = _norms(vectors, id_col, vec_col).select(
        F.col(id_col).alias("id_b"), F.col("norm").alias("nb"))
    out = (
        dots.join(F.broadcast(na), "id_a").join(F.broadcast(nb), "id_b")
        .withColumn("cosine", F.col("dot") / (F.col("na") * F.col("nb")))
        .where(F.col("cosine") >= threshold)
    )
    return out.select("id_a", "id_b", "cosine")


def embedding_near_dup_exact(
    vectors,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Brute-force embedding-cosine near-dup pairs, decimal-exact.

    The oracle twin of :func:`embedding_near_dup_pairs` (which buckets
    by hyperplane LSH at scale): every (id_a < id_b) pair whose cosine
    ≥ ``threshold``.  Dot products and norms go through DECIMAL(28,12)
    sums so the result is bit-reproducible across engines regardless
    of aggregation order — same contract as ``ann.cosine_topk``.
    Candidate space is all-pairs; callers bound the input (the contract
    row caps at 500 vectors) or use the LSH variant beyond test scale.
    """
    from .ann import _norms

    ea = vectors.select(
        F.col(id_col).alias("id_a"), F.posexplode(vec_col).alias("pos", "va")
    )
    eb = vectors.select(
        F.col(id_col).alias("id_b"), F.posexplode(vec_col).alias("pos", "vb")
    )
    dots = (
        ea.join(eb, "pos")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(
            F.sum(
                (F.col("va").cast("double") * F.col("vb").cast("double"))
                .cast("decimal(28,12)")
            ).cast("double").alias("dot")
        )
    )
    na = _norms(vectors, id_col, vec_col).select(
        F.col(id_col).alias("id_a"), F.col("norm").alias("na"))
    nb = _norms(vectors, id_col, vec_col).select(
        F.col(id_col).alias("id_b"), F.col("norm").alias("nb"))
    return (
        dots.join(F.broadcast(na), "id_a").join(F.broadcast(nb), "id_b")
        .withColumn("cosine", F.col("dot") / (F.col("na") * F.col("nb")))
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def simhash(
    df: DataFrame,
    bits: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """SimHash fingerprint over distinct token hashes.

    bit_j(doc) = 1 iff Σ_tokens (2·bit_j(th) − 1) > 0; fingerprint =
    Σ bit_j << j.  Integer-only; near-dups differ in few bits (pair
    search = group by fingerprint or band the bits).
    """
    t = (
        tokens(df.select(id_col, text_col), text_col)
        .select(id_col, "tok").distinct()
        .select(id_col, token_hash_col().alias("th"))
    )
    aggs = [
        F.sum(
            F.shiftright(F.col("th"), j).bitwiseAND(F.lit(1)) * 2 - 1
        ).alias(f"s{j}")
        for j in range(bits)
    ]
    g = t.groupBy(id_col).agg(*aggs)
    fp = F.lit(0).cast("long")
    for j in range(bits):
        fp = fp + F.when(F.col(f"s{j}") > 0, 1 << j).otherwise(0)
    return g.select(F.col(id_col), fp.alias("simhash"))


def hamming_pairs(
    sims: DataFrame, max_dist: int = 3, id_col: str = "doc_id",
    bits: int = 16,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance ≤ max_dist.

    Scale path: band the fingerprint into (max_dist+1) chunks — by
    pigeonhole two fingerprints within distance d share at least one
    exact chunk — join per chunk, then exact popcount verify.
    """
    chunks = max_dist + 1
    width = bits // chunks
    outs = []
    for c in range(chunks):
        key = F.shiftright(F.col("simhash"), c * width).bitwiseAND(
            F.lit((1 << width) - 1)
        )
        outs.append(
            sims.select(
                F.col(id_col), F.col("simhash"), F.lit(c).alias("chunk"),
                key.alias("ck"),
            )
        )
    b = outs[0]
    for o in outs[1:]:
        b = b.unionByName(o)
    left = b.select("chunk", "ck", F.col(id_col).alias("id_a"),
                    F.col("simhash").alias("sh_a"))
    right = b.select("chunk", "ck", F.col(id_col).alias("id_b"),
                     F.col("simhash").alias("sh_b"))
    pairs = (
        left.join(right, ["chunk", "ck"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .distinct()
    )
    dist = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return pairs.withColumn("dist", dist).where(
        F.col("dist") <= max_dist
    ).select("id_a", "id_b", "dist")


# ---------------------------------------------------------------------------
# Substring-level duplicate spans + benchmark decontamination
# ---------------------------------------------------------------------------


def _shingle_hashes(
    df: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """(id, pos, h) for every n-token window: h = md5 of the
    space-joined window (the engine-portable shingle key).  Docs
    shorter than n tokens emit nothing."""
    t = f"split({text_col}, ' ')"
    spans = F.expr(
        f"CASE WHEN size({t}) < {n} THEN array()"
        f" ELSE transform(sequence(1, size({t}) - {n - 1}),"
        f" i -> named_struct('pos', i,"
        f" 'h', md5(concat_ws(' ', slice({t}, i, {n}))))) END"
    )
    return df.select(id_col, F.explode(spans).alias("s")).select(
        id_col,
        F.col("s.pos").cast("long").alias("pos"),
        F.col("s.h").alias("h"),
    )


def dup_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Substring-level duplication: per doc, how many of its n-token
    windows occur anywhere else in the corpus (including elsewhere in
    the same doc).  The span-granular signal behind suffix-array text
    dedup (duplicated passages hurt LLM training even when whole-doc
    hashes differ), computed with shingle hashes instead of a suffix
    array: same detection set for fixed n, and it distributes as a
    word-count.

    Plan: shingle explode → corpus-wide count per hash (map-side
    combined) → join the shingle stream back on the hash key → per-doc
    agg.  Exact integers end-to-end; the one double is a single
    divide.
    """
    sh = _shingle_hashes(df, id_col, text_col, n)
    counts = sh.groupBy("h").agg(F.count(F.lit(1)).alias("n_occ"))
    j = sh.join(counts, "h")
    return (
        j.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(F.when(F.col("n_occ") > 1, 1).otherwise(0)).alias(
                "n_dup_spans"
            ),
        )
        .select(
            id_col,
            F.col("n_spans").cast("long").alias("n_spans"),
            F.col("n_dup_spans").cast("long").alias("n_dup_spans"),
            (F.col("n_dup_spans") / F.col("n_spans")).alias(
                "dup_span_frac"
            ),
        )
    )


def contamination(
    df: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Benchmark decontamination: per training doc, how many of its
    n-token windows appear in the eval set — the standard n-gram
    overlap check run before training on web text.

    The eval-set shingle dictionary is tiny next to the corpus, so it
    broadcasts (semi-join on the hash, no shuffle of the doc stream);
    at any corpus size the cost is one map-side probe per shingle.
    """
    sh = _shingle_hashes(df, id_col, text_col, n)
    ev = (
        _shingle_hashes(eval_df, id_col, text_col, n)
        .select("h")
        .distinct()
    )
    hit = sh.join(F.broadcast(ev).withColumn("_hit", F.lit(1)), "h", "left")
    return (
        hit.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("n_eval_spans"),
        )
        .select(
            id_col,
            F.col("n_spans").cast("long").alias("n_spans"),
            F.col("n_eval_spans").cast("long").alias("n_eval_spans"),
            (F.col("n_eval_spans") / F.col("n_spans")).alias(
                "contamination_frac"
            ),
        )
    )
