"""Web-text pipeline operators: HTML boilerplate strip, PII redaction,
URL canonicalization + domain rollup, token-window chunking, TF-IDF
term ranking, and geohash tiling.

All pure built-in Spark SQL (JVM-side, whole-stage codegen — zero
Python in the hot path), so every operator scales to the north rule's
10^12-document table: the HTML/PII/URL passes are per-row regex chains
(no shuffle at all), chunking is a generator explode, TF-IDF is two
map-side-combined aggregations plus one broadcast-sized term join, and
geohash is integer bit math.

These extend the reference's surface (SpaPy has no web-text ops,
/root/reference/SpaVectors.py handles only geometry attributes) per
the driver's training-data-pipeline mandate; each has a DuckDB-oracle
query in entry_queries4.py.

Cross-engine regex discipline: every pattern stays inside the
RE2-compatible subset (no backreferences, no lookaround) so Spark's
java.util.regex and DuckDB's RE2 agree byte-for-byte; `(?s)` dot-all
and non-greedy `.*?` are in both dialects.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

# ---------------------------------------------------------------------------
# HTML boilerplate strip
# ---------------------------------------------------------------------------

# Order matters: containers with text payloads that must NOT survive
# (script/style/comments) die first, then remaining tags become spaces.
_HTML_KILL = (
    r"(?s)<script[^>]*>.*?</script>",
    r"(?s)<style[^>]*>.*?</style>",
    r"(?s)<!--.*?-->",
)
_HTML_TAG = r"<[^>]*>"
# Minimal entity table: the HTML4 named core set plus the common
# numeric (decimal + lowercase-hex) forms a crawler actually hits.
# ORDER IS SEMANTICS: every ampersand-producing entity (&amp;, &#38;,
# &#x26;) decodes LAST, so "&amp;lt;" / "&#38;lt;" yield the literal
# text "&lt;" rather than double-decoding to "<".
_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&#60;", "<"),
    ("&#x3c;", "<"),
    ("&#62;", ">"),
    ("&#x3e;", ">"),
    ("&#34;", '"'),
    ("&#x27;", "'"),
    ("&#160;", " "),
    ("&#xa0;", " "),
    ("&amp;", "&"),
    ("&#38;", "&"),
    ("&#x26;", "&"),
)


def html_extract_col(html: Column) -> Column:
    """Boilerplate-stripped visible text of an HTML string column."""
    c = html
    for pat in _HTML_KILL:
        c = F.regexp_replace(c, pat, " ")
    c = F.regexp_replace(c, _HTML_TAG, " ")
    for ent, rep in _ENTITIES:
        # literal replace: escape nothing — entities have no regex
        # metacharacters except '&#39;' which is safe in both dialects
        c = F.regexp_replace(c, ent, rep)
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


def html_extract(
    df: DataFrame, html_col: str = "html_text", out: str = "extracted"
) -> DataFrame:
    """Strip tags/script/style/comments, decode core entities, collapse
    whitespace.  Pure regexp_replace chain — one codegen stage."""
    return df.withColumn(out, html_extract_col(F.col(html_col)))


# ---------------------------------------------------------------------------
# Link extraction (anchor text + href → link-graph edges)
# ---------------------------------------------------------------------------

LINK_RX = r'(?s)<a\s[^>]*href="([^"]*)"[^>]*>(.*?)</a>'


def extract_links(
    df: DataFrame, html_col: str = "html_text", id_col: str = "doc_id"
) -> DataFrame:
    """One row per <a href> in each page: (id, link_idx, href, anchor)
    with the anchor's inner markup stripped through the same chain as
    html_extract.  This is the link-graph edge extractor that feeds
    pagerank/connected-components; pure Catalyst (two regexp_extract_all
    passes zipped + one posexplode), no shuffle."""
    pat = F.lit(LINK_RX)
    z = df.withColumns(
        {
            "_hrefs": F.regexp_extract_all(F.col(html_col), pat, F.lit(1)),
            "_anchors": F.regexp_extract_all(F.col(html_col), pat, F.lit(2)),
        }
    ).select(
        id_col,
        F.posexplode(F.arrays_zip("_hrefs", "_anchors")).alias("link_idx", "z"),
    )
    return z.select(
        id_col,
        F.col("link_idx").cast("long").alias("link_idx"),
        F.col("z._hrefs").alias("href"),
        html_extract_col(F.col("z._anchors")).alias("anchor"),
    )


def host_graph(
    links: DataFrame,
    page_domain_col: str = "domain",
    href_col: str = "href",
    id_col: str = "doc_id",
) -> DataFrame:
    """Domain-level link graph from extract_links output: one edge per
    (source registered domain → target registered domain) with link
    and page counts.  Absolute hrefs resolve through the same
    canonicalization chain as url_canonicalize; relative hrefs inherit
    the page's domain (intra-site edges).

    The edge aggregation is one map-side-combined shuffle on the
    (src, dst) pair — the host graph is |domains|², tiny next to the
    page-level graph, so this is the standard first reduction before
    domain-rank computations."""
    canon = url_canonicalize_col(F.col(href_col))
    is_abs = F.col(href_col).rlike("^[A-Za-z]+://")
    dst = F.when(
        is_abs, registered_domain_col(url_host_col(canon))
    ).otherwise(F.col(page_domain_col))
    return (
        links.groupBy(
            F.col(page_domain_col).alias("src_domain"),
            dst.alias("dst_domain"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_links"),
            F.countDistinct(id_col).cast("long").alias("n_pages"),
        )
    )


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("phone", r"\d{3}[-.]\d{3}[-.]\d{4}", "[PHONE]"),
    ("ipv4", r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}", "[IP]"),
)


def pii_redact(
    df: DataFrame, text_col: str = "text", out: str = "redacted"
) -> DataFrame:
    """Redact emails → phones → IPv4s (that order: an email whose
    domain looks dotted-numeric must be eaten by the email pass) and
    count each category on the ORIGINAL text (counts are audit
    metadata, independent of redaction order)."""
    c = F.col(text_col)
    red = c
    sel = [df["*"]]
    for name, pat, token in PII_PATTERNS:
        sel.append(
            F.size(F.regexp_extract_all(c, F.lit(pat), F.lit(0))).cast(
                "long"
            ).alias(f"n_{name}")
        )
        red = F.regexp_replace(red, pat, token)
    return df.select(*sel, red.alias(out))


# ---------------------------------------------------------------------------
# URL canonicalization + domain extraction
# ---------------------------------------------------------------------------


def url_canonicalize_col(url: Column) -> Column:
    """Crawl-frontier URL canonicalization: lowercase scheme+host,
    drop default ports, drop www., drop fragments and utm_* params.

    Regex-staged (RE2-safe); the scheme+host lowering keeps the PATH
    case intact by splitting at the first '/' after '//'.
    """
    head = F.lower(F.regexp_extract(url, r"^([A-Za-z]+://[^/?#]*)", 1))
    rest = F.regexp_replace(url, r"^[A-Za-z]+://[^/?#]*", "")
    c = F.concat(head, rest)
    c = F.regexp_replace(c, r"#.*$", "")  # fragment
    c = F.regexp_replace(c, r"^(https://[^/:?#]+):443(/|$)", r"$1$2")
    c = F.regexp_replace(c, r"^(http://[^/:?#]+):80(/|$)", r"$1$2")
    c = F.regexp_replace(c, r"^([a-z]+://)www\.", r"$1")
    # utm params, anchored to a ?/& parameter boundary so 'xutm_a=1'
    # or a path containing 'utm_' is never mangled: (1) every &utm_x=v
    # anywhere, (2) utm first-in-query with params after, (3) utm as
    # the only param.
    c = F.regexp_replace(c, r"&utm_[A-Za-z]+=[^&#]*", "")
    c = F.regexp_replace(c, r"\?utm_[A-Za-z]+=[^&#]*&", "?")
    c = F.regexp_replace(c, r"\?utm_[A-Za-z]+=[^&#]*$", "")
    c = F.regexp_replace(c, r"\?$", "")
    return c


def url_host_col(url: Column) -> Column:
    """Host of an already-canonicalized URL (port stripped)."""
    return F.regexp_extract(url, r"^[a-z]+://([^/:?#]+)", 1)


def registered_domain_col(host: Column) -> Column:
    """Last two labels (example.com) — the eTLD+1 approximation a
    public-suffix list would refine; documented simplification."""
    return F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)


def url_canonicalize(
    df: DataFrame, url_col: str = "url", out: str = "canon_url"
) -> DataFrame:
    c = url_canonicalize_col(F.col(url_col))
    return df.withColumn(out, c).withColumn(
        "domain", registered_domain_col(url_host_col(c))
    )


def domain_stats(
    df: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-registered-domain rollup: page count, distinct-text count
    (exact intra-domain dedup), representative doc.  One shuffle on
    the domain key; count_distinct(md5) keeps only 16-byte hashes —
    not text payloads — in the aggregation state."""
    canon = url_canonicalize(df, url_col)
    return canon.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_pages"),
        F.countDistinct(F.md5(F.col(text_col))).alias("n_unique_texts"),
        F.min(id_col).alias("rep_doc_id"),
    )


# ---------------------------------------------------------------------------
# Token-window chunking
# ---------------------------------------------------------------------------


def chunk_tokens(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = 8,
    stride: int = 6,
) -> DataFrame:
    """Overlapping token-window chunks (the LLM-training text splitter):
    windows of ``size`` whitespace tokens every ``stride`` tokens, the
    tail window may be shorter.  Pure Catalyst: split → sequence of
    starts → transform+slice → posexplode.  No Python, no shuffle."""
    if size < 1 or stride < 1:
        raise ValueError("size and stride must be >= 1")
    chunks = F.expr(
        f"transform(sequence(1, greatest(size(split({text_col}, ' ')), 1), {stride}),"
        f" s -> array_join(slice(split({text_col}, ' '), s, {size}), ' '))"
    )
    out = df.select(
        id_col, F.posexplode(chunks).alias("chunk_idx", "chunk_text")
    )
    return out.select(
        id_col,
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        "chunk_text",
        F.size(F.split(F.col("chunk_text"), " ")).cast("long").alias("n_tok"),
    )


# ---------------------------------------------------------------------------
# TF-IDF term ranking
# ---------------------------------------------------------------------------


def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Top-k distinctive terms per document.

    Log-free idf (score = tf * N / df as one double divide) keeps the
    score bit-identical across engines — integer products below 2^53
    then a single IEEE division; ln() last-ulp drift would break the
    driver's value hash.  Two map-side-combined aggs + one join on the
    term key (term dictionary ≪ corpus, broadcast at any corpus size
    where |vocab| is bounded) + one per-doc top-k window.
    """
    toks = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("tok")
    )
    tf = toks.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.select(F.countDistinct(id_col).alias("n_docs"))
    scored = (
        tf.join(F.broadcast(dfreq), "tok")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score", F.col("tf").cast("double") * F.col("n_docs") / F.col("df")
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc("score"), F.asc("tok")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            id_col,
            F.col("rnk").cast("long").alias("rnk"),
            "tok",
            "tf",
            "df",
            "score",
        )
    )


# ---------------------------------------------------------------------------
# robots.txt evaluation
# ---------------------------------------------------------------------------


def robots_rules(
    df: DataFrame, txt_col: str = "robots_txt", key: str = "domain"
) -> DataFrame:
    """Parse robots.txt bodies into (key, directive, rule_path) rows,
    keeping only rules inside ``User-agent: *`` groups.

    Group tracking is a running count of User-agent lines (two plain
    window sums — no sequential scan, no Python), so the parse itself
    distributes: a corpus of a billion robots files is one explode +
    two windows partitioned by domain.
    """
    lines = df.select(
        key, F.posexplode(F.split(F.col(txt_col), "\n")).alias("ln", "line")
    )
    is_ua = F.col("line").startswith("User-agent:")
    wrun = (
        Window.partitionBy(key)
        .orderBy("ln")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    lines = lines.withColumn(
        "gid", F.sum(F.when(is_ua, 1).otherwise(0)).over(wrun)
    ).withColumn(
        "ua_line",
        F.when(is_ua, F.trim(F.regexp_extract("line", r"^User-agent:(.*)$", 1))),
    )
    wg = Window.partitionBy(key, "gid")
    lines = lines.withColumn("ua", F.max("ua_line").over(wg))
    rx = r"^(Allow|Disallow): *(.*[^ ]) *$"
    return (
        lines.where(F.col("ua") == "*")
        .select(
            key,
            F.regexp_extract("line", rx, 1).alias("directive"),
            F.regexp_extract("line", rx, 2).alias("rule_path"),
        )
        .where(F.col("directive") != "")
    )


def robots_check(
    urls: DataFrame,
    rules: DataFrame,
    id_col: str = "doc_id",
    key: str = "domain",
    path_col: str = "path",
) -> DataFrame:
    """Longest-match robots evaluation per URL (the documented Google
    semantics: most-specific rule wins, Allow wins length ties).

    One equi-join on the domain key (rules ≪ pages per domain, so AQE
    broadcasts or SMJs as stats dictate) + one per-URL rank window.
    URLs whose domain has no matching rule are allowed.
    """
    j = urls.join(rules, key, "left")
    matched = (
        F.substring(F.col(path_col), 1, F.length("rule_path"))
        == F.col("rule_path")
    )
    j = j.withColumn("m", F.when(matched, 1).otherwise(0)).withColumn(
        "rlen", F.coalesce(F.length("rule_path"), F.lit(0))
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc("m"), F.desc("rlen"), F.asc("directive"), F.asc("rule_path")
    )
    top = j.withColumn("rnk", F.row_number().over(w)).where(F.col("rnk") == 1)
    return top.select(
        id_col,
        key,
        path_col,
        ((F.col("m") == 0) | (F.col("directive") == "Allow")).alias("allowed"),
        F.when(F.col("m") == 1, F.col("rule_path")).alias("winning_rule"),
    )


def robots_meta(
    df: DataFrame, txt_col: str = "robots_txt", key: str = "domain"
) -> DataFrame:
    """Per-domain crawl metadata from robots.txt: the ``Crawl-delay``
    inside the ``User-agent: *`` group (the politeness interval a
    frontier scheduler consumes) and the ``Sitemap:`` directives
    (global per RFC 9309 — they live outside group scoping).

    Same distributed parse as robots_rules: one explode + two windows
    per domain, then a single map-side-combined aggregate."""
    lines = df.select(
        key, F.posexplode(F.split(F.col(txt_col), "\n")).alias("ln", "line")
    )
    is_ua = F.col("line").startswith("User-agent:")
    wrun = (
        Window.partitionBy(key)
        .orderBy("ln")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    lines = lines.withColumn(
        "gid", F.sum(F.when(is_ua, 1).otherwise(0)).over(wrun)
    ).withColumn(
        "ua_line",
        F.when(is_ua, F.trim(F.regexp_extract("line", r"^User-agent:(.*)$", 1))),
    )
    wg = Window.partitionBy(key, "gid")
    lines = lines.withColumn("ua", F.max("ua_line").over(wg))
    delay = F.when(
        (F.col("ua") == "*")
        & (F.col("line").rlike(r"^Crawl-delay: *[0-9]+(\.[0-9]+)? *$")),
        F.regexp_extract("line", r"^Crawl-delay: *([0-9.]+)", 1).cast(
            "double"
        ),
    )
    smap = F.when(
        F.col("line").startswith("Sitemap:"),
        F.trim(F.regexp_extract("line", r"^Sitemap:(.*)$", 1)),
    )
    return (
        lines.withColumn("delay", delay)
        .withColumn("smap", smap)
        .groupBy(key)
        .agg(
            F.min("delay").alias("crawl_delay"),
            F.count("smap").cast("long").alias("n_sitemaps"),
            F.min("smap").alias("first_sitemap"),
        )
    )


# RFC 9309 wildcard rules: '*' matches any run, trailing '$' anchors
# the end of the path.  The rule translates to an RE2-safe regex by
# literal-escaping every metacharacter, then expanding '*'.  The
# escape chain is plain replace() calls so DuckDB reproduces the SAME
# pattern string byte-for-byte.
_RULE_ESCAPES = (
    "\\", ".", "+", "?", "(", ")", "[", "]", "{", "}", "|", "^", "$",
)


def robots_rule_regex_col(rule: Column) -> Column:
    """Regex equivalent of a robots rule path: anchored at the start,
    '*' → '.*', trailing '$' → end anchor, everything else literal."""
    anchored = rule.endswith("$")
    body = F.when(
        anchored, F.substring(rule, 1, F.length(rule) - 1)
    ).otherwise(rule)
    c = body
    for ch in _RULE_ESCAPES:
        c = F.replace(c, F.lit(ch), F.lit("\\" + ch))
    c = F.replace(c, F.lit("*"), F.lit(".*"))
    return F.concat(
        F.lit("^"), c, F.when(anchored, F.lit("$")).otherwise(F.lit(""))
    )


def robots_check_wildcard(
    urls: DataFrame,
    rules: DataFrame,
    id_col: str = "doc_id",
    key: str = "domain",
    path_col: str = "path",
) -> DataFrame:
    """robots evaluation with full RFC 9309 wildcard semantics:
    '*' and trailing-'$' rules match via per-rule regexes; the most
    specific rule (most octets in the rule text) wins, Allow wins
    length ties.  Same join/window shape as ``robots_check`` — the
    regex probe replaces the prefix compare; patterns compile per
    (rule, row) JVM-side (regexp_like with a column pattern)."""
    j = urls.join(rules, key, "left")
    rx = robots_rule_regex_col(F.col("rule_path"))
    matched = F.expr(f"regexp_like({path_col}, rx)")
    j = j.withColumn("rx", rx).withColumn(
        "m", F.when(matched, 1).otherwise(0)
    ).withColumn("rlen", F.coalesce(F.length("rule_path"), F.lit(0)))
    w = Window.partitionBy(id_col).orderBy(
        F.desc("m"), F.desc("rlen"), F.asc("directive"), F.asc("rule_path")
    )
    top = j.withColumn("rnk", F.row_number().over(w)).where(F.col("rnk") == 1)
    return top.select(
        id_col,
        key,
        path_col,
        ((F.col("m") == 0) | (F.col("directive") == "Allow")).alias("allowed"),
        F.when(F.col("m") == 1, F.col("rule_path")).alias("winning_rule"),
    )


# ---------------------------------------------------------------------------
# Geohash tiling
# ---------------------------------------------------------------------------

GEOHASH32 = "0123456789bcdefghjkmnpqrstuvwxyz"

# 32-bit → 64-bit even-position bit spread (classic magic masks)
SPREAD64_STEPS = (
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
)


def _spread_bits(c: Column) -> Column:
    for shift, mask in SPREAD64_STEPS:
        c = (c.bitwiseOR(F.shiftleft(c, shift))).bitwiseAND(F.lit(mask))
    return c


def geohash_col(lat: Column, lon: Column, precision: int = 8) -> Column:
    """Standard geohash (base-32, lon bit first) as pure Catalyst bit
    math — same spread-mask chain as the engine's Z-order cells
    (cells.py), different interleave order + alphabet.  Even precision
    only (lat/lon get equal bit budgets) keeps the math branch-free."""
    if precision % 2 or not (2 <= precision <= 12):
        raise ValueError("precision must be even, 2..12")
    half = 5 * precision // 2  # bits per axis
    n = 1 << half
    ilon = F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(float(n)))
    ilat = F.floor((lat + F.lit(90.0)) / F.lit(180.0) * F.lit(float(n)))
    ilon = F.least(F.greatest(ilon, F.lit(0)), F.lit(n - 1)).cast("long")
    ilat = F.least(F.greatest(ilat, F.lit(0)), F.lit(n - 1)).cast("long")
    val = F.shiftleft(_spread_bits(ilon), 1).bitwiseOR(_spread_bits(ilat))
    chars = []
    total = 5 * precision
    for j in range(precision):
        idx = F.shiftrightunsigned(val, total - 5 * (j + 1)).bitwiseAND(
            F.lit(31)
        )
        chars.append(F.lit(GEOHASH32).substr((idx + 1).cast("int"), F.lit(1)))
    return F.concat(*chars)


def geohash_encode(
    df: DataFrame,
    y: str = "lat",
    x: str = "lon",
    precision: int = 8,
    out: str = "geohash",
) -> DataFrame:
    return df.withColumn(out, geohash_col(F.col(y), F.col(x), precision))
