"""Round-4 contract queries: the web-text pipeline surface.

Each Spark query (operators/web.py — pure Catalyst) has a bit-exact
DuckDB oracle.  The documents table is word-salad text, so the
web-shaped inputs (HTML wrappers, PII strings, URLs) are DERIVED
deterministically from (doc_id, text) with the identical expression on
both engines — same discipline as the derived-points family in
entry_queries.py.

Cross-engine notes baked into the oracles:
- DuckDB regexp_replace needs the 'g' option (Spark replaces all
  matches by default);
- replacement backrefs are $1 in java.util.regex but \\1 in RE2;
- every pattern stays in the RE2-compatible subset;
- the one double in tfidf is a single IEEE divide of exact integers
  (log-free idf) so the value hash matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .entry_queries import PTS_SQL, derived_points, load
from .operators import s2, sample, text, web

# ---------------------------------------------------------------------------
# Shared derivations (Spark + SQL twins)
# ---------------------------------------------------------------------------

_HTML_SQL = (
    "'<html><head><title>d</title><style>p {color: red}</style>"
    "<script>if (1 < 2) { var s = \"</p>\"; }</script></head>"
    "<body><!-- nav <b> --><p>' || text || '</p>"
    "<p>A &amp; B &lt;tag&gt;&nbsp;end</p>"
    "<p>C &#60;x&#62;&#160;D &#38;lt; E&#x26;amp</p>"
    "<div id=\"f\">tail ' || (doc_id % 7) || '</div></body></html>'"
)


def _html_col() -> F.Column:
    return F.concat(
        F.lit(
            '<html><head><title>d</title><style>p {color: red}</style>'
            '<script>if (1 < 2) { var s = "</p>"; }</script></head>'
            "<body><!-- nav <b> --><p>"
        ),
        F.col("text"),
        F.lit(
            "</p><p>A &amp; B &lt;tag&gt;&nbsp;end</p>"
            "<p>C &#60;x&#62;&#160;D &#38;lt; E&#x26;amp</p>"
            '<div id="f">tail '
        ),
        (F.col("doc_id") % 7).cast("string"),
        F.lit("</div></body></html>"),
    )


_PII_SQL = (
    "text || ' contact user' || (doc_id % 97) || '@mail' || (doc_id % 5)"
    " || '.example.com or 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')"
    " || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
    " || ' ip 192.168.' || (doc_id % 256) || '.' || (doc_id % 100)"
)


def _pii_col() -> F.Column:
    d = F.col("doc_id")
    return F.concat(
        F.col("text"),
        F.lit(" contact user"),
        (d % 97).cast("string"),
        F.lit("@mail"),
        (d % 5).cast("string"),
        F.lit(".example.com or 555-"),
        F.lpad((d % 1000).cast("string"), 3, "0"),
        F.lit("-"),
        F.lpad((d % 10000).cast("string"), 4, "0"),
        F.lit(" ip 192.168."),
        (d % 256).cast("string"),
        F.lit("."),
        (d % 100).cast("string"),
    )


_URL_SQL = (
    "CASE WHEN doc_id % 2 = 0 THEN"
    " 'HTTPS://WWW.Site' || (doc_id % 37) || '.Example' || (doc_id % 3)"
    " || '.COM:443/P/' || doc_id || '?utm_source=a&id=' || doc_id || '#frag'"
    " ELSE"
    " 'http://Site' || (doc_id % 37) || '.Example' || (doc_id % 3)"
    " || '.com:80/P/' || doc_id || '?id=' || doc_id || '&utm_campaign=b'"
    " END"
)


def _url_col() -> F.Column:
    d = F.col("doc_id")
    k = (d % 37).cast("string")
    j = (d % 3).cast("string")
    i = d.cast("string")
    even = F.concat(
        F.lit("HTTPS://WWW.Site"), k, F.lit(".Example"), j,
        F.lit(".COM:443/P/"), i, F.lit("?utm_source=a&id="), i, F.lit("#frag"),
    )
    odd = F.concat(
        F.lit("http://Site"), k, F.lit(".Example"), j,
        F.lit(".com:80/P/"), i, F.lit("?id="), i, F.lit("&utm_campaign=b"),
    )
    return F.when(d % 2 == 0, even).otherwise(odd)


# ---------------------------------------------------------------------------
# Spark-side queries
# ---------------------------------------------------------------------------


def q_web_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    wrapped = docs.withColumn("html_text", _html_col())
    out = web.html_extract(wrapped, "html_text", out="extracted")
    return out.select(
        "doc_id",
        "extracted",
        F.length("extracted").cast("long").alias("n_chars"),
    ).orderBy("doc_id")


def q_web_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    seeded = docs.withColumn("pii_text", _pii_col()).select("doc_id", "pii_text")
    out = web.pii_redact(seeded, "pii_text", out="redacted")
    return out.select(
        "doc_id", "n_email", "n_phone", "n_ipv4", "redacted"
    ).orderBy("doc_id")


def q_web_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id")
    seeded = docs.withColumn("url", _url_col())
    out = web.url_canonicalize(seeded, "url", out="canon_url")
    return out.select("doc_id", "canon_url", "domain").orderBy("doc_id")


def q_web_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    seeded = docs.withColumn("url", _url_col())
    out = web.domain_stats(seeded, "url", "text", "doc_id")
    return out.select(
        "domain", "n_pages", "n_unique_texts", "rep_doc_id"
    ).orderBy("domain")


def q_web_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    out = web.chunk_tokens(docs, size=8, stride=6)
    return out.orderBy("doc_id", "chunk_idx")


def q_web_tfidf_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    out = web.tfidf_top_terms(docs, k=3)
    return out.orderBy("doc_id", "rnk")


def q_web_geohash_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = derived_points(spark, sf_dir)
    enc = web.geohash_encode(pts, precision=4)
    return (
        enc.groupBy("geohash")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("point_id").alias("min_pid"),
        )
        .orderBy("geohash")
    )


_LINKS_SQL = (
    "'<html><body><p>' || text || '</p>"
    "<a class=\"x\" href=\"http://s' || (doc_id % 37) || '.ex.com/p/'"
    " || (doc_id * 3) || '\">see <b>this</b></a>' ||"
    " CASE WHEN doc_id % 3 >= 1 THEN"
    " '<a href=\"/rel/' || doc_id || '\">rel ' || (doc_id % 5) || '</a>'"
    " ELSE '' END ||"
    " CASE WHEN doc_id % 3 >= 2 THEN"
    " '<a href=\"https://t.ex' || (doc_id % 3) ||"
    " '.org/q?x=' || doc_id || '\">&quot;q&quot; link</a>'"
    " ELSE '' END || '</body></html>'"
)


def _links_col() -> F.Column:
    d = F.col("doc_id")
    l0 = F.concat(
        F.lit('<a class="x" href="http://s'),
        (d % 37).cast("string"),
        F.lit(".ex.com/p/"),
        (d * 3).cast("string"),
        F.lit('">see <b>this</b></a>'),
    )
    l1 = F.when(
        d % 3 >= 1,
        F.concat(
            F.lit('<a href="/rel/'), d.cast("string"), F.lit('">rel '),
            (d % 5).cast("string"), F.lit("</a>"),
        ),
    ).otherwise(F.lit(""))
    l2 = F.when(
        d % 3 >= 2,
        F.concat(
            F.lit('<a href="https://t.ex'), (d % 3).cast("string"),
            F.lit(".org/q?x="), d.cast("string"),
            F.lit('">&quot;q&quot; link</a>'),
        ),
    ).otherwise(F.lit(""))
    return F.concat(
        F.lit("<html><body><p>"), F.col("text"), F.lit("</p>"),
        l0, l1, l2, F.lit("</body></html>"),
    )


def q_link_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anchor/href extraction — the link-graph edge source that feeds
    pagerank/connected-components.  Pages carry 1-3 links (absolute,
    relative, query-string) with markup and entities inside anchors."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    pages = docs.withColumn("html_text", _links_col())
    out = web.extract_links(pages)
    return out.orderBy("doc_id", "link_idx")


def _link_extract_oracle_sql() -> str:
    anchor = _strip_sql("anchors[i]")
    return (
        f"WITH d AS (SELECT doc_id, {_LINKS_SQL} AS html FROM documents),"
        " x AS (SELECT doc_id,"
        f" regexp_extract_all(html, '{web.LINK_RX}', 1) AS hrefs,"
        f" regexp_extract_all(html, '{web.LINK_RX}', 2) AS anchors"
        " FROM d),"
        " s AS (SELECT doc_id, hrefs, anchors,"
        " unnest(generate_series(1, len(hrefs))) AS i FROM x)"
        " SELECT doc_id, CAST(i - 1 AS BIGINT) AS link_idx,"
        f" hrefs[i] AS href, {anchor} AS anchor"
        " FROM s ORDER BY doc_id, link_idx"
    )


def q_host_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-level link graph (web.host_graph): page-level anchor
    edges roll up to (src registered domain → dst registered domain)
    with link/page counts; absolute hrefs resolve through the
    canonicalization chain, relative hrefs stay intra-site."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    pages = docs.withColumn("html_text", _links_col())
    links = web.extract_links(pages).withColumn(
        "domain",
        F.concat(
            F.lit("example"),
            (F.col("doc_id") % 3).cast("string"),
            F.lit(".com"),
        ),
    )
    return web.host_graph(links).orderBy("src_domain", "dst_domain")


def _host_graph_oracle_sql() -> str:
    canon = _canon_sql_expr()
    dom = _domain_sql_expr("canon_url")
    return (
        f"WITH d AS (SELECT doc_id, {_LINKS_SQL} AS html FROM documents),"
        " x AS (SELECT doc_id,"
        f" regexp_extract_all(html, '{web.LINK_RX}', 1) AS hrefs"
        " FROM d),"
        " s AS (SELECT doc_id, hrefs,"
        " unnest(generate_series(1, len(hrefs))) AS i FROM x),"
        " e AS (SELECT doc_id,"
        " 'example' || (doc_id % 3) || '.com' AS domain,"
        " hrefs[i] AS u FROM s),"
        f" c AS (SELECT doc_id, domain, u, {canon} AS canon_url FROM e),"
        " t AS (SELECT doc_id, domain,"
        " CASE WHEN regexp_matches(u, '^[A-Za-z]+://')"
        f" THEN {dom} ELSE domain END AS dst FROM c)"
        " SELECT domain AS src_domain, dst AS dst_domain,"
        " CAST(count(*) AS BIGINT) AS n_links,"
        " CAST(count(DISTINCT doc_id) AS BIGINT) AS n_pages"
        " FROM t GROUP BY src_domain, dst_domain"
        " ORDER BY src_domain, dst_domain"
    )


def q_s2_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 tiling rollup over rational direction vectors derived from
    doc_id — the trig-free path, so the whole chain (ratios, quadratic
    ST sqrt, floor, Hilbert automaton) is bit-exact cross-engine.  The
    Spark side runs the Arrow-batched numpy encoder (operators/s2.py);
    the oracle replays the automaton as an unrolled CTE chain."""
    docs = load(spark, sf_dir, "documents").select("doc_id")
    d = F.col("doc_id")
    vecs = docs.select(
        "doc_id",
        (((d * 7) % 2001 - 1000) / F.lit(1000.0)).alias("x"),
        (((d * 13) % 2001 - 1000) / F.lit(1000.0)).alias("y"),
        ((((d % 1999) * 2) - 1999) / F.lit(2000.0)).alias("z"),
    )
    enc = s2.s2_encode_xyz(vecs, level=_S2_LEVEL)
    return (
        enc.groupBy("s2_cell")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("doc_id").alias("min_doc"),
        )
        .orderBy("s2_cell")
    )


_S2_LEVEL = 6


def q_robots_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """robots.txt longest-match evaluation, fully in Catalyst: group
    tracking via running-count windows, rule resolution via a rank
    window.  Three derived domains carry a non-* group (ignored), a
    short Disallow, a longer Allow overriding it, and an empty
    Disallow (spec: allow-all, dropped by the parser)."""
    docs = load(spark, sf_dir, "documents").select("doc_id")
    d = F.col("doc_id")
    urls = docs.select(
        "doc_id",
        F.concat(
            F.lit("example"), (d % 3).cast("string"), F.lit(".com")
        ).alias("domain"),
        F.concat(F.lit("/P/"), d.cast("string")).alias("path"),
    )
    robots = spark.range(3).select(
        F.concat(
            F.lit("example"), F.col("id").cast("string"), F.lit(".com")
        ).alias("domain"),
        F.concat(
            F.lit(
                "User-agent: bot\nDisallow: /\nUser-agent: *"
                "\nDisallow: /P/1\nAllow: /P/1"
            ),
            F.col("id").cast("string"),
            F.lit("\nDisallow: /P/2\nDisallow:"),
        ).alias("robots_txt"),
    )
    rules = web.robots_rules(robots)
    return web.robots_check(urls, rules).orderBy("doc_id")


_ROBOTS_RX = "^(Allow|Disallow): *(.*[^ ]) *$"


def _robots_oracle_sql() -> str:
    txt = (
        "'User-agent: bot' || chr(10) || 'Disallow: /' || chr(10) ||"
        " 'User-agent: *' || chr(10) || 'Disallow: /P/1' || chr(10) ||"
        " 'Allow: /P/1' || j || chr(10) || 'Disallow: /P/2' || chr(10) ||"
        " 'Disallow:'"
    )
    return (
        "WITH u AS (SELECT doc_id,"
        " 'example' || (doc_id % 3) || '.com' AS domain,"
        " '/P/' || doc_id AS path FROM documents),"
        " r0 AS (SELECT CAST(range AS BIGINT) AS j FROM range(3)),"
        f" rb AS (SELECT 'example' || j || '.com' AS domain, {txt}"
        " AS robots_txt FROM r0),"
        " tk AS (SELECT domain, string_split(robots_txt, chr(10)) AS toks"
        " FROM rb),"
        " s AS (SELECT domain, toks,"
        " unnest(generate_series(1, len(toks))) AS ln FROM tk),"
        " l AS (SELECT domain, ln, toks[ln] AS line FROM s),"
        " g AS (SELECT domain, ln, line,"
        " SUM(CASE WHEN line LIKE 'User-agent:%' THEN 1 ELSE 0 END)"
        " OVER (PARTITION BY domain ORDER BY ln"
        " ROWS UNBOUNDED PRECEDING) AS gid,"
        " CASE WHEN line LIKE 'User-agent:%' THEN"
        " trim(regexp_extract(line, '^User-agent:(.*)$', 1)) END AS ua_line"
        " FROM l),"
        " g2 AS (SELECT *, MAX(ua_line) OVER (PARTITION BY domain, gid)"
        " AS ua FROM g),"
        " rules AS (SELECT domain,"
        f" regexp_extract(line, '{_ROBOTS_RX}', 1) AS directive,"
        f" regexp_extract(line, '{_ROBOTS_RX}', 2) AS rule_path"
        " FROM g2 WHERE ua = '*'"
        f" AND regexp_extract(line, '{_ROBOTS_RX}', 1) <> ''),"
        " cand AS (SELECT u.doc_id, u.domain, u.path, r.directive,"
        " r.rule_path,"
        " CASE WHEN r.rule_path IS NOT NULL AND"
        " substr(u.path, 1, length(r.rule_path)) = r.rule_path"
        " THEN 1 ELSE 0 END AS m,"
        " COALESCE(length(r.rule_path), 0) AS rlen"
        " FROM u LEFT JOIN rules r USING (domain)),"
        " rk AS (SELECT *, row_number() OVER (PARTITION BY doc_id"
        " ORDER BY m DESC, rlen DESC, directive ASC, rule_path ASC)"
        " AS rnk FROM cand)"
        " SELECT doc_id, domain, path,"
        " (m = 0 OR directive = 'Allow') AS allowed,"
        " CASE WHEN m = 1 THEN rule_path END AS winning_rule"
        " FROM rk WHERE rnk = 1 ORDER BY doc_id"
    )


def q_robots_wildcard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFC 9309 wildcard robots evaluation (web.robots_check_wildcard):
    '*' runs and trailing-'$' anchors, longest-rule-wins with Allow on
    ties.  The derived rules block paths ending in 7 under /P/ but
    re-allow the 1-prefixed ones, plus a plain prefix Disallow."""
    docs = load(spark, sf_dir, "documents").select("doc_id")
    d = F.col("doc_id")
    urls = docs.select(
        "doc_id",
        F.concat(
            F.lit("example"), (d % 3).cast("string"), F.lit(".com")
        ).alias("domain"),
        F.concat(F.lit("/P/"), d.cast("string")).alias("path"),
    )
    robots = spark.range(3).select(
        F.concat(
            F.lit("example"), F.col("id").cast("string"), F.lit(".com")
        ).alias("domain"),
        F.lit(
            "User-agent: *\nDisallow: /P/*7$\nAllow: /P/1*7$"
            "\nDisallow: /P/3"
        ).alias("robots_txt"),
    )
    rules = web.robots_rules(robots)
    return web.robots_check_wildcard(urls, rules).orderBy("doc_id")


def q_robots_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-delay (group-scoped to UA *) + Sitemap (global) parsing
    (web.robots_meta).  Domain 0 has no wildcard-group delay — its
    Crawl-delay sits in a bot-specific group and must be ignored."""
    docs = load(spark, sf_dir, "documents").select("doc_id")
    ids = docs.select((F.col("doc_id") % 3).alias("j")).distinct()
    robots = ids.select(
        F.concat(
            F.lit("example"), F.col("j").cast("string"), F.lit(".com")
        ).alias("domain"),
        F.concat(
            F.lit(
                "User-agent: bot\nCrawl-delay: 9\nDisallow: /\n"
                "Sitemap: https://maps.example/s0.xml\n"
                "User-agent: *\nDisallow: /tmp\n"
            ),
            F.when(
                F.col("j") > 0,
                F.concat(
                    F.lit("Crawl-delay: "),
                    (F.col("j") * 2).cast("string"),
                    F.lit(".5\n"),
                ),
            ).otherwise(F.lit("")),
            F.lit("Sitemap: https://maps.example/s"),
            F.col("j").cast("string"),
            F.lit(".xml"),
        ).alias("robots_txt"),
    )
    return web.robots_meta(robots).orderBy("domain")


def _robots_meta_oracle_sql() -> str:
    txt = (
        "'User-agent: bot' || chr(10) || 'Crawl-delay: 9' || chr(10) ||"
        " 'Disallow: /' || chr(10) ||"
        " 'Sitemap: https://maps.example/s0.xml' || chr(10) ||"
        " 'User-agent: *' || chr(10) || 'Disallow: /tmp' || chr(10) ||"
        " (CASE WHEN j > 0 THEN 'Crawl-delay: ' || (j * 2) || '.5'"
        " || chr(10) ELSE '' END) ||"
        " 'Sitemap: https://maps.example/s' || j || '.xml'"
    )
    return (
        "WITH ids AS (SELECT DISTINCT doc_id % 3 AS j FROM documents),"
        f" rb AS (SELECT 'example' || j || '.com' AS domain, {txt}"
        " AS robots_txt FROM ids),"
        " tk AS (SELECT domain, string_split(robots_txt, chr(10)) AS toks"
        " FROM rb),"
        " s AS (SELECT domain, toks,"
        " unnest(generate_series(1, len(toks))) AS ln FROM tk),"
        " l AS (SELECT domain, ln, toks[ln] AS line FROM s),"
        " g AS (SELECT domain, ln, line,"
        " SUM(CASE WHEN line LIKE 'User-agent:%' THEN 1 ELSE 0 END)"
        " OVER (PARTITION BY domain ORDER BY ln"
        " ROWS UNBOUNDED PRECEDING) AS gid,"
        " CASE WHEN line LIKE 'User-agent:%' THEN"
        " trim(regexp_extract(line, '^User-agent:(.*)$', 1)) END AS ua_line"
        " FROM l),"
        " g2 AS (SELECT *, MAX(ua_line) OVER (PARTITION BY domain, gid)"
        " AS ua FROM g),"
        " m AS (SELECT domain,"
        " CASE WHEN ua = '*' AND"
        r" regexp_matches(line, '^Crawl-delay: *[0-9]+(\.[0-9]+)? *$')"
        " THEN CAST(regexp_extract(line, '^Crawl-delay: *([0-9.]+)', 1)"
        " AS DOUBLE) END AS delay,"
        " CASE WHEN line LIKE 'Sitemap:%' THEN"
        " trim(regexp_extract(line, '^Sitemap:(.*)$', 1)) END AS smap"
        " FROM g2)"
        " SELECT domain, MIN(delay) AS crawl_delay,"
        " CAST(COUNT(smap) AS BIGINT) AS n_sitemaps,"
        " MIN(smap) AS first_sitemap"
        " FROM m GROUP BY domain ORDER BY domain"
    )


def _rule_regex_sql(rule: str) -> str:
    """DuckDB twin of web.robots_rule_regex_col over expression
    ``rule`` — same replace chain, same anchor handling."""
    body = (
        f"CASE WHEN {rule} LIKE '%$' THEN"
        f" substr({rule}, 1, length({rule}) - 1) ELSE {rule} END"
    )
    c = body
    for ch in web._RULE_ESCAPES:
        lit = ch.replace("'", "''")
        esc = ("\\" + ch).replace("'", "''")
        c = f"replace({c}, '{lit}', '{esc}')"
    c = f"replace({c}, '*', '.*')"
    return (
        f"'^' || {c} || (CASE WHEN {rule} LIKE '%$' THEN '$' ELSE '' END)"
    )


def _robots_wildcard_oracle_sql() -> str:
    txt = (
        "'User-agent: *' || chr(10) || 'Disallow: /P/*7$' || chr(10) ||"
        " 'Allow: /P/1*7$' || chr(10) || 'Disallow: /P/3'"
    )
    rx = _rule_regex_sql("r.rule_path")
    return (
        "WITH u AS (SELECT doc_id,"
        " 'example' || (doc_id % 3) || '.com' AS domain,"
        " '/P/' || doc_id AS path FROM documents),"
        " r0 AS (SELECT CAST(range AS BIGINT) AS j FROM range(3)),"
        f" rb AS (SELECT 'example' || j || '.com' AS domain, {txt}"
        " AS robots_txt FROM r0),"
        " tk AS (SELECT domain, string_split(robots_txt, chr(10)) AS toks"
        " FROM rb),"
        " s AS (SELECT domain, toks,"
        " unnest(generate_series(1, len(toks))) AS ln FROM tk),"
        " l AS (SELECT domain, ln, toks[ln] AS line FROM s),"
        " g AS (SELECT domain, ln, line,"
        " SUM(CASE WHEN line LIKE 'User-agent:%' THEN 1 ELSE 0 END)"
        " OVER (PARTITION BY domain ORDER BY ln"
        " ROWS UNBOUNDED PRECEDING) AS gid,"
        " CASE WHEN line LIKE 'User-agent:%' THEN"
        " trim(regexp_extract(line, '^User-agent:(.*)$', 1)) END AS ua_line"
        " FROM l),"
        " g2 AS (SELECT *, MAX(ua_line) OVER (PARTITION BY domain, gid)"
        " AS ua FROM g),"
        " rules AS (SELECT domain,"
        f" regexp_extract(line, '{_ROBOTS_RX}', 1) AS directive,"
        f" regexp_extract(line, '{_ROBOTS_RX}', 2) AS rule_path"
        " FROM g2 WHERE ua = '*'"
        f" AND regexp_extract(line, '{_ROBOTS_RX}', 1) <> ''),"
        " cand AS (SELECT u.doc_id, u.domain, u.path, r.directive,"
        " r.rule_path,"
        " CASE WHEN r.rule_path IS NOT NULL AND"
        f" regexp_matches(u.path, {rx})"
        " THEN 1 ELSE 0 END AS m,"
        " COALESCE(length(r.rule_path), 0) AS rlen"
        " FROM u LEFT JOIN rules r USING (domain)),"
        " rk AS (SELECT *, row_number() OVER (PARTITION BY doc_id"
        " ORDER BY m DESC, rlen DESC, directive ASC, rule_path ASC)"
        " AS rnk FROM cand)"
        " SELECT doc_id, domain, path,"
        " (m = 0 OR directive = 'Allow') AS allowed,"
        " CASE WHEN m = 1 THEN rule_path END AS winning_rule"
        " FROM rk WHERE rnk = 1 ORDER BY doc_id"
    )


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected-components dedup clustering over a derived pair
    graph: short per-decade chains, one 61-node chain (forces the
    pointer-doubling path — plain propagation would need 60 rounds),
    and cross-decade hub links.  Oracle is a DuckDB recursive CTE
    computing min-reachable-id per node."""
    from .operators import graph

    docs = load(spark, sf_dir, "documents").select("doc_id")
    d = F.col("doc_id")
    e1 = docs.where(d % 10 < 4).select(d.alias("src"), (d + 1).alias("dst"))
    e2 = docs.where((d >= 100) & (d < 160)).select(
        d.alias("src"), (d + 1).alias("dst")
    )
    e3 = docs.where(d % 25 == 0).select(d.alias("src"), (d * 2).alias("dst"))
    edges = e1.unionAll(e2).unionAll(e3)
    out = graph.dedup_clusters(edges, "src", "dst")
    return out.orderBy("node")


def _dedup_clusters_oracle_sql() -> str:
    return (
        "WITH RECURSIVE e AS ("
        " SELECT doc_id AS src, doc_id + 1 AS dst FROM documents"
        " WHERE doc_id % 10 < 4"
        " UNION ALL SELECT doc_id, doc_id + 1 FROM documents"
        " WHERE doc_id >= 100 AND doc_id < 160"
        " UNION ALL SELECT doc_id, doc_id * 2 FROM documents"
        " WHERE doc_id % 25 = 0),"
        " sym AS (SELECT src AS a, dst AS b FROM e WHERE src <> dst"
        " UNION SELECT dst, src FROM e WHERE src <> dst),"
        " n AS (SELECT DISTINCT a AS node FROM sym),"
        " reach(node, lbl) AS ("
        " SELECT node, node FROM n"
        " UNION"
        " SELECT s.a, r.lbl FROM sym s JOIN reach r ON r.node = s.b)"
        " SELECT node, MIN(lbl) AS cluster,"
        " (node = MIN(lbl)) AS is_canonical"
        " FROM reach GROUP BY node ORDER BY node"
    )


def q_pagerank_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-exact PageRank over a derived link graph (2-3 out-links
    per doc via modular hashing), 5 iterations, top-20 pages.  Integer
    micro-ranks with floor divisions make an ITERATIVE algorithm
    value-hash-exact — float PageRank could never face this gate."""
    from .operators import graph

    docs = load(spark, sf_dir, "documents").select("doc_id")
    nd = docs.agg(F.count(F.lit(1)).alias("n"))
    base = docs.crossJoin(F.broadcast(nd))
    d = F.col("doc_id")
    n = F.col("n")
    e1 = base.select(d.alias("src"), ((d * 7 + 3) % n).alias("dst"))
    e2 = base.select(d.alias("src"), ((d * 13 + 11) % n).alias("dst"))
    e3 = base.where(d % 3 == 0).select(
        d.alias("src"), ((d * 31 + 17) % n).alias("dst")
    )
    edges = e1.unionAll(e2).unionAll(e3)
    pr = graph.pagerank_int(edges, docs, n_iter=5, id_col="doc_id")
    return (
        pr.select("doc_id", F.col("rank").alias("pr"))
        .orderBy(F.desc("pr"), F.asc("doc_id"))
        .limit(20)
    )


def _pagerank_oracle_sql(n_iter: int = 5) -> str:
    head = (
        "WITH nd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),"
        " e AS ("
        " SELECT doc_id AS src, (doc_id * 7 + 3) % n AS dst"
        " FROM documents, nd"
        " UNION ALL SELECT doc_id, (doc_id * 13 + 11) % n"
        " FROM documents, nd"
        " UNION ALL SELECT doc_id, (doc_id * 31 + 17) % n"
        " FROM documents, nd WHERE doc_id % 3 = 0),"
        " deg AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg"
        " FROM e GROUP BY src),"
        " nodes AS (SELECT doc_id AS node FROM documents),"
        " r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM nodes)"
    )
    stages = []
    for k in range(1, n_iter + 1):
        stages.append(
            f", c{k} AS (SELECT e.dst AS node,"
            " CAST(SUM(r.r // d.outdeg) AS BIGINT) AS s"
            f" FROM e JOIN r{k - 1} r ON r.node = e.src"
            " JOIN deg d ON d.src = e.src GROUP BY e.dst)"
            f", r{k} AS (SELECT nodes.node,"
            " CAST(150000 + (85 * COALESCE(c.s, 0)) // 100 AS BIGINT) AS r"
            f" FROM nodes LEFT JOIN c{k} c USING (node))"
        )
    return (
        head
        + "".join(stages)
        + f" SELECT node AS doc_id, r AS pr FROM r{n_iter}"
        " ORDER BY pr DESC, doc_id ASC LIMIT 20"
    )


def q_warc_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Container roundtrip: pack documents into per-group gzipped WARC
    blobs (the Common-Crawl layout: one gzip member per record), parse
    them back with the from-scratch reader, and emit each record's url,
    date, payload size, and the text DECODED FROM THE CONTAINER — the
    oracle derives the same rows straight from the table, so a single
    flipped byte anywhere in writer or parser breaks the value hash
    (the input_hint's byte-identical-text invariant, proven through a
    container)."""
    import pandas as pd

    from .sources import warc as warclib

    docs = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .withColumn("gid", F.col("doc_id") % 40)
    )

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        recs = []
        for did, text in zip(pdf["doc_id"], pdf["text"]):
            s = int(did) % 86400
            date = (
                f"2024-01-01T{s // 3600:02d}:{s % 3600 // 60:02d}"
                f":{s % 60:02d}Z"
            )
            recs.append((f"http://w{did}.example/p", date,
                         str(text).encode("utf-8")))
        blob = warclib.build_warc(recs, gzip_records=True)
        return pd.DataFrame({"gid": [int(pdf["gid"].iloc[0])],
                             "warc": [blob]})

    blobs = docs.groupBy("gid").applyInPandas(build, "gid long, warc binary")
    recs = warclib.records_df(blobs, "warc")
    return recs.select(
        "url",
        "warc_date",
        F.octet_length("payload").cast("long").alias("n_bytes"),
        F.col("payload").cast("string").alias("text"),
    ).orderBy("url")


def _warc_oracle_sql() -> str:
    s = "(doc_id % 86400)"
    date = (
        f"'2024-01-01T' || lpad(CAST({s} // 3600 AS VARCHAR), 2, '0')"
        f" || ':' || lpad(CAST(({s} % 3600) // 60 AS VARCHAR), 2, '0')"
        f" || ':' || lpad(CAST({s} % 60 AS VARCHAR), 2, '0') || 'Z'"
    )
    return (
        "SELECT 'http://w' || doc_id || '.example/p' AS url,"
        f" {date} AS warc_date,"
        " CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,"
        " text FROM documents ORDER BY url"
    )

_S2_XYZ_SQL = (
    "SELECT doc_id,"
    " CAST((doc_id * 7) % 2001 - 1000 AS DOUBLE) / 1000.0 AS x,"
    " CAST((doc_id * 13) % 2001 - 1000 AS DOUBLE) / 1000.0 AS y,"
    " CAST((doc_id % 1999) * 2 - 1999 AS DOUBLE) / 2000.0 AS z"
    " FROM documents"
)


def _s2_oracle_sql(level: int = _S2_LEVEL) -> str:
    n = 1 << level
    # face pick mirrors s2.xyz_to_face_uv's where-chain exactly
    face = (
        "CASE WHEN abs(x) >= abs(y) AND abs(x) >= abs(z) THEN"
        " (CASE WHEN x >= 0 THEN 0 ELSE 3 END)"
        " WHEN abs(y) >= abs(z) THEN (CASE WHEN y >= 0 THEN 1 ELSE 4 END)"
        " ELSE (CASE WHEN z >= 0 THEN 2 ELSE 5 END) END"
    )
    u = (
        "CASE face WHEN 0 THEN y/x WHEN 1 THEN -x/y WHEN 2 THEN -x/z"
        " WHEN 3 THEN z/x WHEN 4 THEN z/y ELSE -y/z END"
    )
    v = (
        "CASE face WHEN 0 THEN z/x WHEN 1 THEN z/y WHEN 2 THEN -y/z"
        " WHEN 3 THEN y/x WHEN 4 THEN -x/y ELSE -x/z END"
    )

    def st(col: str) -> str:
        return (
            f"CASE WHEN {col} >= 0 THEN 0.5 * sqrt(1 + 3 * {col})"
            f" ELSE 1 - 0.5 * sqrt(1 - 3 * {col}) END"
        )

    def ij(col: str) -> str:
        return (
            f"LEAST(GREATEST(CAST(floor({col} * {n}.0) AS BIGINT), 0),"
            f" {n - 1})"
        )

    # unrolled Hilbert automaton: one CTE per level, MSB-first;
    # table lookups are shift+mask on the packed constants
    stages = []
    for k in range(level):
        sh = level - 1 - k
        idx = f"((r * 4 + (((i >> {sh}) & 1) * 2 + ((j >> {sh}) & 1))) * 2)"
        stages.append(
            f" h{k + 1} AS (SELECT doc_id, i, j, face,"
            f" pos * 4 + (({s2.POS_PACKED} >> {idx}) & 3) AS pos,"
            f" CAST(({s2.NEXTR_PACKED} >> {idx}) & 3 AS BIGINT) AS r"
            f" FROM h{k})"
        )
    return (
        f"WITH d AS ({_S2_XYZ_SQL}),"
        f" f AS (SELECT doc_id, x, y, z, {face} AS face FROM d),"
        f" uv AS (SELECT doc_id, face, {u} AS u, {v} AS v FROM f),"
        f" st AS (SELECT doc_id, face, {st('u')} AS s, {st('v')} AS t"
        " FROM uv),"
        f" h0 AS (SELECT doc_id, face, {ij('s')} AS i, {ij('t')} AS j,"
        " CAST(face % 2 AS BIGINT) AS r, CAST(0 AS BIGINT) AS pos FROM st),"
        + ",".join(stages)
        + f" SELECT face * {4 ** level} + pos AS s2_cell,"
        " CAST(count(*) AS BIGINT) AS n, MIN(doc_id) AS min_doc"
        f" FROM h{level} GROUP BY s2_cell ORDER BY s2_cell"
    )


def q_doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filters (operators/text.py
    repetition_stats): top-bigram fraction + duplicate-trigram
    fraction, exact integer counts with single-IEEE-divide ratios."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    return text.repetition_stats(docs).orderBy("doc_id")


def q_lm_bigram_bits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained add-one bigram-LM surprisal per doc, quantized to
    integer bits via exact floor-log2 (operators/text.py
    lm_bigram_bits) — the cross-engine-safe perplexity stand-in."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    return text.lm_bigram_bits(docs).orderBy("doc_id")


def q_corpus_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic md5-bucket Bernoulli sample (37%) then a per-domain
    stratified cap of 40 picked by hash order (operators/sample.py) —
    the reproducible-subset + per-domain-balancing pipeline step."""
    docs = load(spark, sf_dir, "documents").select("doc_id")
    seeded = docs.withColumn(
        "domain",
        F.concat(
            F.lit("example"),
            (F.col("doc_id") % 3).cast("string"),
            F.lit(".com"),
        ),
    )
    samp = sample.hash_sample(seeded, "doc_id", pct=37)
    capped = sample.stratified_cap(samp, "domain", k=40, id_col="doc_id")
    return capped.select("doc_id", "domain", "bucket", "rk").orderBy("doc_id")


def q_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lowercase + non-alphanumeric collapse normalization
    (operators/text.py normalize_text) over a punctuation/case-seeded
    derivation of the documents table, plus the md5 of the normalized
    form (the case/punct-robust dedup key)."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    seeded = docs.withColumn(
        "noisy",
        F.concat(
            F.upper(F.substring("text", 1, 10)),
            F.lit("!!  "),
            F.col("text"),
            F.lit(" ... #"),
            (F.col("doc_id") % 13).cast("string"),
        ),
    )
    out = text.normalize_text(seeded, "noisy", out="norm")
    return out.select(
        "doc_id",
        "norm",
        F.md5("norm").alias("norm_md5"),
        F.length("norm").cast("long").alias("n_chars"),
    ).orderBy("doc_id")


def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capped-postings inverted index (operators/text.py
    inverted_index): per-term occurrence/doc counts + the first 10 doc
    ids, the WindowGroupLimit-capped search-index build."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    return text.inverted_index(docs, k_postings=10).orderBy("tok")


def q_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level duplicate spans (operators/dedup.py dup_spans):
    per-doc count of 8-token windows occurring anywhere else in the
    corpus — the suffix-array-dedup signal via shingle hashes."""
    from .operators import dedup

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    return dedup.dup_spans(docs, n=8).orderBy("doc_id")


def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (operators/dedup.py contamination):
    8-token-window overlap of every doc against a deterministic eval
    subset (doc_id % 50 == 0) — eval docs must self-report ~100%."""
    from .operators import dedup

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    ev = docs.where(F.col("doc_id") % 50 == 0)
    return dedup.contamination(docs, ev, n=8).orderBy("doc_id")


def q_streaming_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The decontamination probe as a REAL Structured Streaming job:
    documents arrive as a parquet file stream, the broadcast eval-set
    shingle dictionary joins stream-static (no stream shuffle on the
    shingle key — the same plan property as the batch path), and the
    per-doc aggregation drains with availableNow into the memory sink.
    Complete mode: each doc lives in one micro-batch, so the final
    table is exactly the batch answer — same SQL oracle as the batch
    `contamination` row."""
    import os
    import shutil
    import tempfile

    from .operators import dedup

    base = os.path.join(
        tempfile.gettempdir(), f"spapy_cont_{os.getpid()}"
    )
    shutil.rmtree(base, ignore_errors=True)
    src = os.path.join(base, "in")
    os.makedirs(src)
    shutil.copy(
        os.path.join(sf_dir, "documents.parquet"),
        os.path.join(src, "documents.parquet"),
    )
    batch = load(spark, sf_dir, "documents")
    stream = (
        spark.readStream.schema(batch.schema)
        .parquet(src)
        .select("doc_id", "text")
    )
    ev = batch.select("doc_id", "text").where(F.col("doc_id") % 50 == 0)
    out = dedup.contamination(stream, ev, n=8)
    name = f"spapy_cont_q_{os.getpid()}"
    (
        out.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", os.path.join(base, "ck"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return spark.table(name).select(
        "doc_id", "n_spans", "n_eval_spans", "contamination_frac"
    ).orderBy("doc_id")


_SHINGLE8_CTE = (
    "t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),"
    " si AS (SELECT doc_id, tk,"
    " unnest(generate_series(1, len(tk) - 7)) AS i"
    " FROM t WHERE len(tk) >= 8),"
    " sh AS (SELECT doc_id, i AS pos,"
    " md5(array_to_string(tk[i:i+7], ' ')) AS h FROM si)"
)


def _dup_spans_oracle_sql() -> str:
    return (
        f"WITH {_SHINGLE8_CTE},"
        " c AS (SELECT h, count(*) AS n_occ FROM sh GROUP BY h),"
        " j AS (SELECT sh.doc_id, c.n_occ FROM sh JOIN c USING (h)),"
        " a AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,"
        " CAST(sum(CASE WHEN n_occ > 1 THEN 1 ELSE 0 END) AS BIGINT)"
        " AS n_dup_spans FROM j GROUP BY doc_id)"
        " SELECT doc_id, n_spans, n_dup_spans,"
        " CAST(n_dup_spans AS DOUBLE) / n_spans AS dup_span_frac"
        " FROM a ORDER BY doc_id"
    )


def _contamination_oracle_sql() -> str:
    return (
        f"WITH {_SHINGLE8_CTE},"
        " ev AS (SELECT DISTINCT h FROM sh WHERE doc_id % 50 = 0),"
        " j AS (SELECT sh.doc_id,"
        " CASE WHEN ev.h IS NOT NULL THEN 1 ELSE 0 END AS hit"
        " FROM sh LEFT JOIN ev ON sh.h = ev.h),"
        " a AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,"
        " CAST(sum(hit) AS BIGINT) AS n_eval_spans FROM j"
        " GROUP BY doc_id)"
        " SELECT doc_id, n_spans, n_eval_spans,"
        " CAST(n_eval_spans AS DOUBLE) / n_spans AS contamination_frac"
        " FROM a ORDER BY doc_id"
    )


_NOISY_SQL = (
    "upper(substr(text, 1, 10)) || '!!  ' || text || ' ... #'"
    " || (doc_id % 13)"
)


def _text_normalize_oracle_sql() -> str:
    norm = (
        "trim(regexp_replace(lower(noisy), '[^a-z0-9]+', ' ', 'g'))"
    )
    return (
        f"WITH d AS (SELECT doc_id, {_NOISY_SQL} AS noisy FROM documents),"
        f" n AS (SELECT doc_id, {norm} AS norm FROM d)"
        " SELECT doc_id, norm, md5(norm) AS norm_md5,"
        " CAST(length(norm) AS BIGINT) AS n_chars"
        " FROM n ORDER BY doc_id"
    )


def _inverted_index_oracle_sql(k: int = 10) -> str:
    return (
        "WITH t AS (SELECT doc_id,"
        " unnest(string_split(text, ' ')) AS tok FROM documents),"
        " td AS (SELECT tok, doc_id, count(*) AS c FROM t"
        " GROUP BY tok, doc_id),"
        " r AS (SELECT *, row_number() OVER (PARTITION BY tok"
        " ORDER BY doc_id) AS rk FROM td),"
        " p AS (SELECT tok,"
        " array_to_string(list(doc_id ORDER BY doc_id), ',') AS postings"
        f" FROM r WHERE rk <= {k} GROUP BY tok),"
        " s AS (SELECT tok, CAST(sum(c) AS BIGINT) AS n_occurrences,"
        " CAST(count(*) AS BIGINT) AS n_docs FROM td GROUP BY tok)"
        " SELECT tok, n_occurrences, n_docs, postings"
        " FROM s JOIN p USING (tok) ORDER BY tok"
    )


def _repetition_oracle_sql() -> str:
    return (
        "WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk"
        " FROM documents),"
        " bi AS (SELECT doc_id, tk,"
        " unnest(generate_series(1, len(tk) - 1)) AS i"
        " FROM t WHERE len(tk) >= 2),"
        " bg AS (SELECT doc_id, tk[i] || ' ' || tk[i+1] AS bg FROM bi),"
        " bgc AS (SELECT doc_id, bg, count(*) AS c FROM bg"
        " GROUP BY doc_id, bg),"
        " bstats AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,"
        " CAST(max(c) AS BIGINT) AS top_bigram_n FROM bgc GROUP BY doc_id),"
        " ti AS (SELECT doc_id, tk,"
        " unnest(generate_series(1, len(tk) - 2)) AS i"
        " FROM t WHERE len(tk) >= 3),"
        " tg AS (SELECT doc_id,"
        " tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS tri FROM ti),"
        " tstats AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_trigrams,"
        " CAST(count(DISTINCT tri) AS BIGINT) AS n_distinct_tri FROM tg"
        " GROUP BY doc_id)"
        " SELECT doc_id, n_bigrams, top_bigram_n,"
        " CAST(top_bigram_n AS DOUBLE) / n_bigrams AS top_bigram_frac,"
        " n_trigrams,"
        " CAST(n_trigrams - n_distinct_tri AS DOUBLE) / n_trigrams"
        " AS dup_trigram_frac"
        " FROM bstats JOIN tstats USING (doc_id) ORDER BY doc_id"
    )


def _lm_bigram_oracle_sql() -> str:
    # length(bin(x)) - 1 == floor(log2(x)) exactly (same trick as the
    # Spark side's length(bin(col)) - 1) — no float log anywhere
    return (
        "WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk"
        " FROM documents),"
        " tok AS (SELECT doc_id, unnest(tk) AS tok FROM t),"
        " c1 AS (SELECT tok, count(*) AS c1 FROM tok GROUP BY tok),"
        " vv AS (SELECT count(DISTINCT tok) AS v FROM tok),"
        " bi AS (SELECT doc_id, tk,"
        " unnest(generate_series(1, len(tk) - 1)) AS i"
        " FROM t WHERE len(tk) >= 2),"
        " e AS (SELECT doc_id, tk[i] AS w1, tk[i+1] AS w2 FROM bi),"
        " c2 AS (SELECT w1, w2, count(*) AS c2 FROM e GROUP BY w1, w2),"
        " j AS (SELECT e.doc_id,"
        " (length(bin(c1.c1 + vv.v)) - 1) - (length(bin(c2.c2 + 1)) - 1)"
        " AS bits"
        " FROM e JOIN c2 USING (w1, w2) JOIN c1 ON e.w1 = c1.tok"
        " CROSS JOIN vv),"
        " a AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,"
        " CAST(sum(bits) AS BIGINT) AS bits FROM j GROUP BY doc_id)"
        " SELECT doc_id, n_bigrams, bits,"
        " CAST(bits AS DOUBLE) / n_bigrams AS bits_per_bigram"
        " FROM a ORDER BY doc_id"
    )


_BUCKET_SQL = (
    "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT"
)


def _corpus_sample_oracle_sql(pct: int = 37, k: int = 40) -> str:
    return (
        "WITH d AS (SELECT doc_id,"
        " 'example' || (doc_id % 3) || '.com' AS domain FROM documents),"
        f" b AS (SELECT doc_id, domain, {_BUCKET_SQL} % 100 AS bucket"
        " FROM d),"
        f" s AS (SELECT * FROM b WHERE bucket < {pct}),"
        " r AS (SELECT *, row_number() OVER (PARTITION BY domain"
        f" ORDER BY {_BUCKET_SQL} % 268435456, doc_id) AS rk FROM s)"
        " SELECT doc_id, domain, bucket, CAST(rk AS BIGINT) AS rk"
        f" FROM r WHERE rk <= {k} ORDER BY doc_id"
    )


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------


def _strip_sql(col: str) -> str:
    """The html_extract_col chain in DuckDB syntax over expression
    ``col`` (shared by the html-extract and link-anchor oracles)."""
    kills = [
        r"(?s)<script[^>]*>.*?</script>",
        r"(?s)<style[^>]*>.*?</style>",
        r"(?s)<!--.*?-->",
    ]
    c = col
    for pat in kills:
        c = f"regexp_replace({c}, '{pat}', ' ', 'g')"
    c = f"regexp_replace({c}, '<[^>]*>', ' ', 'g')"
    for ent, rep in web._ENTITIES:
        rep_sql = rep.replace("'", "''")
        ent_sql = ent.replace("'", "''")
        c = f"regexp_replace({c}, '{ent_sql}', '{rep_sql}', 'g')"
    return rf"trim(regexp_replace({c}, '\s+', ' ', 'g'))"


def _html_oracle_sql() -> str:
    c = _strip_sql("h")
    return (
        f"WITH d AS (SELECT doc_id, {_HTML_SQL} AS h FROM documents)"
        f" SELECT doc_id, {c} AS extracted,"
        f" CAST(length({c}) AS BIGINT) AS n_chars"
        " FROM d ORDER BY doc_id"
    )


def _pii_oracle_sql() -> str:
    red = "t"
    counts = []
    for name, pat, token in web.PII_PATTERNS:
        counts.append(
            f"CAST(len(regexp_extract_all(t, '{pat}')) AS BIGINT) AS n_{name}"
        )
        red = f"regexp_replace({red}, '{pat}', '{token}', 'g')"
    return (
        f"WITH d AS (SELECT doc_id, {_PII_SQL} AS t FROM documents)"
        f" SELECT doc_id, {', '.join(counts)}, {red} AS redacted"
        " FROM d ORDER BY doc_id"
    )


def _canon_sql_expr() -> str:
    """The canonicalization chain in DuckDB syntax (RE2 \\1 backrefs)."""
    c = (
        "lower(regexp_extract(u, '^([A-Za-z]+://[^/?#]*)', 1))"
        " || regexp_replace(u, '^[A-Za-z]+://[^/?#]*', '', 'g')"
    )
    c = f"regexp_replace({c}, '#.*$', '', 'g')"
    c = rf"regexp_replace({c}, '^(https://[^/:?#]+):443(/|$)', '\1\2', 'g')"
    c = rf"regexp_replace({c}, '^(http://[^/:?#]+):80(/|$)', '\1\2', 'g')"
    c = rf"regexp_replace({c}, '^([a-z]+://)www\.', '\1', 'g')"
    c = f"regexp_replace({c}, '&utm_[A-Za-z]+=[^&#]*', '', 'g')"
    c = f"regexp_replace({c}, '\\?utm_[A-Za-z]+=[^&#]*&', '?', 'g')"
    c = f"regexp_replace({c}, '\\?utm_[A-Za-z]+=[^&#]*$', '', 'g')"
    c = rf"regexp_replace({c}, '\?$', '', 'g')"
    return c


def _domain_sql_expr(canon: str) -> str:
    host = f"regexp_extract({canon}, '^[a-z]+://([^/:?#]+)', 1)"
    return f"regexp_extract({host}, '([^.]+\\.[^.]+)$', 1)"


def _url_canonical_oracle_sql() -> str:
    canon = _canon_sql_expr()
    dom = _domain_sql_expr("canon_url")
    return (
        f"WITH d AS (SELECT doc_id, {_URL_SQL} AS u FROM documents),"
        f" c AS (SELECT doc_id, {canon} AS canon_url FROM d)"
        f" SELECT doc_id, canon_url, {dom} AS domain"
        " FROM c ORDER BY doc_id"
    )


def _domain_stats_oracle_sql() -> str:
    canon = _canon_sql_expr()
    dom = _domain_sql_expr("canon_url")
    return (
        f"WITH d AS (SELECT doc_id, text, {_URL_SQL} AS u FROM documents),"
        f" c AS (SELECT doc_id, text, {canon} AS canon_url FROM d),"
        f" g AS (SELECT doc_id, text, {dom} AS domain FROM c)"
        " SELECT domain, CAST(count(*) AS BIGINT) AS n_pages,"
        " CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_unique_texts,"
        " MIN(doc_id) AS rep_doc_id"
        " FROM g GROUP BY domain ORDER BY domain"
    )


def _chunks_oracle_sql(size: int = 8, stride: int = 6) -> str:
    return (
        "WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks"
        " FROM documents),"
        " s AS (SELECT doc_id, toks,"
        f" unnest(generate_series(1, greatest(len(toks), 1), {stride}))"
        " AS st FROM t)"
        f" SELECT doc_id, CAST((st - 1) / {stride} AS BIGINT) AS chunk_idx,"
        f" array_to_string(toks[st:least(st + {size - 1}, len(toks))], ' ')"
        " AS chunk_text,"
        f" CAST(least(st + {size - 1}, len(toks)) - st + 1 AS BIGINT) AS n_tok"
        " FROM s ORDER BY doc_id, chunk_idx"
    )


def _tfidf_oracle_sql(k: int = 3) -> str:
    return (
        "WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok"
        " FROM documents),"
        " tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf"
        " FROM toks GROUP BY doc_id, tok),"
        " dfreq AS (SELECT tok, CAST(count(*) AS BIGINT) AS df"
        " FROM tf GROUP BY tok),"
        " nd AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs"
        " FROM documents),"
        " sc AS (SELECT f.doc_id, f.tok, f.tf, d.df,"
        " CAST(f.tf AS DOUBLE) * nd.n_docs / d.df AS score"
        " FROM tf f JOIN dfreq d USING (tok) CROSS JOIN nd),"
        " r AS (SELECT *, row_number() OVER (PARTITION BY doc_id"
        " ORDER BY score DESC, tok) AS rnk FROM sc)"
        f" SELECT doc_id, CAST(rnk AS BIGINT) AS rnk, tok, tf, df, score"
        f" FROM r WHERE rnk <= {k} ORDER BY doc_id, rnk"
    )


def _geohash_oracle_sql(precision: int = 4) -> str:
    half = 5 * precision // 2
    n = 1 << half
    total = 5 * precision

    def spread(var: str) -> str:
        c = var
        for shift, mask in web.SPREAD64_STEPS:
            c = f"(({c} | ({c} << {shift})) & {mask})"
        return c

    chars = []
    for j in range(precision):
        sh = total - 5 * (j + 1)
        chars.append(
            f"substr('{web.GEOHASH32}',"
            f" CAST(((val >> {sh}) & 31) AS INT) + 1, 1)"
        )
    gh = " || ".join(chars)
    return (
        f"WITH pts AS ({PTS_SQL}),"
        " q0 AS (SELECT point_id,"
        f" CAST(floor((lon + 180.0) / 360.0 * {n}.0) AS BIGINT) AS ix0,"
        f" CAST(floor((lat + 90.0) / 180.0 * {n}.0) AS BIGINT) AS iy0"
        " FROM pts),"
        " q1 AS (SELECT point_id,"
        f" LEAST(GREATEST(ix0, 0), {n - 1}) AS ix,"
        f" LEAST(GREATEST(iy0, 0), {n - 1}) AS iy FROM q0),"
        " v AS (SELECT point_id,"
        f" (({spread('ix')} << 1) | {spread('iy')}) AS val FROM q1),"
        f" g AS (SELECT point_id, {gh} AS geohash FROM v)"
        " SELECT geohash, CAST(count(*) AS BIGINT) AS n,"
        " MIN(point_id) AS min_pid"
        " FROM g GROUP BY geohash ORDER BY geohash"
    )


# ---------------------------------------------------------------------------
# Registration
# ---------------------------------------------------------------------------


def build_queries() -> dict:
    return {
        "web_html_extract": q_web_html_extract,
        "web_pii_redact": q_web_pii_redact,
        "web_url_canonical": q_web_url_canonical,
        "web_domain_stats": q_web_domain_stats,
        "web_doc_chunks": q_web_doc_chunks,
        "web_tfidf_top": q_web_tfidf_top,
        "web_geohash_tiles": q_web_geohash_tiles,
        "s2_tiles": q_s2_tiles,
        "warc_extract": q_warc_extract,
        "robots_check": q_robots_check,
        "dedup_clusters": q_dedup_clusters,
        "pagerank_top": q_pagerank_top,
        "link_extract": q_link_extract,
        "doc_repetition": q_doc_repetition,
        "lm_bigram_bits": q_lm_bigram_bits,
        "corpus_sample": q_corpus_sample,
        "text_normalize": q_text_normalize,
        "inverted_index": q_inverted_index,
        "dup_spans": q_dup_spans,
        "contamination": q_contamination,
        "robots_wildcard": q_robots_wildcard,
        "host_graph": q_host_graph,
        "streaming_contamination": q_streaming_contamination,
        "robots_meta": q_robots_meta,
    }


def build_oracle_sql() -> dict:
    return {
        "web_html_extract": _html_oracle_sql(),
        "web_pii_redact": _pii_oracle_sql(),
        "web_url_canonical": _url_canonical_oracle_sql(),
        "web_domain_stats": _domain_stats_oracle_sql(),
        "web_doc_chunks": _chunks_oracle_sql(),
        "web_tfidf_top": _tfidf_oracle_sql(),
        "web_geohash_tiles": _geohash_oracle_sql(),
        "s2_tiles": _s2_oracle_sql(),
        "warc_extract": _warc_oracle_sql(),
        "robots_check": _robots_oracle_sql(),
        "dedup_clusters": _dedup_clusters_oracle_sql(),
        "pagerank_top": _pagerank_oracle_sql(),
        "link_extract": _link_extract_oracle_sql(),
        "doc_repetition": _repetition_oracle_sql(),
        "lm_bigram_bits": _lm_bigram_oracle_sql(),
        "corpus_sample": _corpus_sample_oracle_sql(),
        "text_normalize": _text_normalize_oracle_sql(),
        "inverted_index": _inverted_index_oracle_sql(),
        "dup_spans": _dup_spans_oracle_sql(),
        "contamination": _contamination_oracle_sql(),
        "robots_wildcard": _robots_wildcard_oracle_sql(),
        "host_graph": _host_graph_oracle_sql(),
        "streaming_contamination": _contamination_oracle_sql(),
        "robots_meta": _robots_meta_oracle_sql(),
    }
