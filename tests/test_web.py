"""Web-text pipeline operators (operators/web.py).

Fixtures are hand-computed expected outputs; the cross-engine
bit-exactness of the same operators is covered by the seven
entry_queries4 oracle rows (tools/check_contract.py).
"""

import pytest
from pyspark.sql import Row, functions as F

from spapy_spark.operators import web


def test_html_extract(spark):
    html = (
        '<html><head><style>p {color: red}</style>'
        '<script>if (1 < 2) { var s = "</p>"; }</script></head>'
        "<body><!-- nav <b> --><p>hello   world</p>"
        "<p>A &amp; B &lt;tag&gt;&nbsp;end</p><div>tail</div></body></html>"
    )
    df = spark.createDataFrame([Row(html_text=html)])
    out = web.html_extract(df).select("extracted").first()[0]
    assert out == "hello world A & B <tag> end tail"


def test_html_extract_amp_order(spark):
    # &amp;lt; must decode to the literal text "&lt;", not "<"
    df = spark.createDataFrame([Row(html_text="x &amp;lt; y")])
    out = web.html_extract(df).select("extracted").first()[0]
    assert out == "x &lt; y"


def test_pii_redact(spark):
    txt = "mail a.b@ex.com twice a.b@ex.com call 555-012-3456 ip 10.0.0.1 end"
    df = spark.createDataFrame([Row(text=txt)])
    r = web.pii_redact(df).first()
    assert (r["n_email"], r["n_phone"], r["n_ipv4"]) == (2, 1, 1)
    assert r["redacted"] == (
        "mail [EMAIL] twice [EMAIL] call [PHONE] ip [IP] end"
    )


def test_pii_counts_are_preredaction(spark):
    # the email's dotted host must not leak into the ipv4 count
    df = spark.createDataFrame([Row(text="u@h.io 1.2.3.4")])
    r = web.pii_redact(df).first()
    assert (r["n_email"], r["n_ipv4"]) == (1, 1)
    assert r["redacted"] == "[EMAIL] [IP]"


@pytest.mark.parametrize(
    "url,canon,domain",
    [
        (
            "HTTPS://WWW.Site.Example.COM:443/Path/X?utm_source=a&id=7#frag",
            "https://site.example.com/Path/X?id=7",
            "example.com",
        ),
        (
            "http://Host.example.com:80/p?id=1&utm_campaign=b",
            "http://host.example.com/p?id=1",
            "example.com",
        ),
        # non-default port survives; path case is preserved
        ("http://a.B.com:8080/UP", "http://a.b.com:8080/UP", "b.com"),
        # lone utm param leaves no dangling '?'
        ("https://x.io/?utm_x=1", "https://x.io/", "x.io"),
        # 'utm_' mid-token is NOT a tracking param (r4 ADVICE): the
        # strip must anchor to a ?/& boundary
        (
            "https://x.io/p?xutm_a=1&b=2",
            "https://x.io/p?xutm_a=1&b=2",
            "x.io",
        ),
        # 'utm_' in the path stays untouched
        (
            "https://x.io/autm_b=c&d/e?id=3",
            "https://x.io/autm_b=c&d/e?id=3",
            "x.io",
        ),
        # consecutive utm params all stripped
        (
            "https://x.io/p?utm_a=1&utm_b=2&id=9",
            "https://x.io/p?id=9",
            "x.io",
        ),
        ("https://x.io/p?utm_a=1&utm_b=2", "https://x.io/p", "x.io"),
    ],
)
def test_url_canonicalize(spark, url, canon, domain):
    df = spark.createDataFrame([Row(url=url)])
    r = web.url_canonicalize(df).first()
    assert r["canon_url"] == canon
    assert r["domain"] == domain


def test_domain_stats(spark):
    rows = [
        Row(doc_id=1, text="a", url="http://www.x.com/1"),
        Row(doc_id=2, text="a", url="http://x.com/2"),
        Row(doc_id=3, text="b", url="https://y.org/1"),
    ]
    df = spark.createDataFrame(rows)
    out = {
        r["domain"]: r
        for r in web.domain_stats(df, "url", "text", "doc_id").collect()
    }
    assert out["x.com"]["n_pages"] == 2
    assert out["x.com"]["n_unique_texts"] == 1
    assert out["x.com"]["rep_doc_id"] == 1
    assert out["y.org"]["n_pages"] == 1


def test_chunk_tokens(spark):
    txt = " ".join(f"t{i}" for i in range(1, 11))  # 10 tokens
    df = spark.createDataFrame([Row(doc_id=1, text=txt)])
    rows = web.chunk_tokens(df, size=8, stride=6).collect()
    # starts 1, 7: chunks [t1..t8], [t7..t10]
    assert [(r["chunk_idx"], r["n_tok"]) for r in rows] == [(0, 8), (1, 4)]
    assert rows[1]["chunk_text"] == "t7 t8 t9 t10"


def test_chunk_tokens_short_doc(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="solo")])
    rows = web.chunk_tokens(df, size=8, stride=6).collect()
    assert len(rows) == 1 and rows[0]["chunk_text"] == "solo"


def test_tfidf_top_terms(spark):
    rows = [
        Row(doc_id=1, text="apple apple banana shared"),
        Row(doc_id=2, text="banana cherry shared"),
        Row(doc_id=3, text="cherry cherry cherry shared"),
    ]
    df = spark.createDataFrame(rows)
    out = web.tfidf_top_terms(df, k=1).orderBy("doc_id").collect()
    # doc1: apple tf=2 df=1 → 6.0 beats banana 1.5, shared 1.0
    assert [(r["doc_id"], r["tok"], r["score"]) for r in out] == [
        (1, "apple", 6.0),
        (2, "banana", 1.5),
        (3, "cherry", 4.5),
    ]


def test_extract_links(spark):
    html = (
        '<html><body><a class="x" href="http://a.io/1">see <b>this</b></a>'
        '<p>noise</p><a href="/rel">r &amp; s</a>'
        "<a name=anchor>no href</a></body></html>"
    )
    df = spark.createDataFrame([Row(doc_id=1, html_text=html)])
    rows = web.extract_links(df).orderBy("link_idx").collect()
    assert [(r["link_idx"], r["href"], r["anchor"]) for r in rows] == [
        (0, "http://a.io/1", "see this"),
        (1, "/rel", "r & s"),
    ]


def test_extract_links_multiline_anchor(spark):
    html = '<a href="/x">line1\nline2</a>'
    df = spark.createDataFrame([Row(doc_id=1, html_text=html)])
    r = web.extract_links(df).first()
    assert r["anchor"] == "line1 line2"


def test_extract_links_no_links(spark):
    df = spark.createDataFrame([Row(doc_id=1, html_text="<p>none</p>")])
    assert web.extract_links(df).count() == 0


ROBOTS = """User-agent: bot
Disallow: /secret
User-agent: *
Disallow: /private
Allow: /private/ok
Disallow:
User-agent: other
Disallow: /x"""


def test_robots_rules_group_scoping(spark):
    df = spark.createDataFrame([Row(domain="d.com", robots_txt=ROBOTS)])
    rules = {
        (r["directive"], r["rule_path"])
        for r in web.robots_rules(df).collect()
    }
    # only the * group survives; the empty Disallow (allow-all) drops
    assert rules == {
        ("Disallow", "/private"),
        ("Allow", "/private/ok"),
    }


@pytest.mark.parametrize(
    "path,allowed,rule",
    [
        ("/public/a", True, None),        # no rule matches
        ("/private", False, "/private"),
        ("/private/no", False, "/private"),
        ("/private/ok", True, "/private/ok"),     # longer Allow wins
        ("/private/okay", True, "/private/ok"),
        ("/secret", True, None),          # non-* group ignored
    ],
)
def test_robots_check_longest_match(spark, path, allowed, rule):
    robots = spark.createDataFrame([Row(domain="d.com", robots_txt=ROBOTS)])
    rules = web.robots_rules(robots)
    urls = spark.createDataFrame([Row(doc_id=1, domain="d.com", path=path)])
    r = web.robots_check(urls, rules).first()
    assert r["allowed"] == allowed and r["winning_rule"] == rule


def test_robots_check_allow_wins_length_tie(spark):
    rules = spark.createDataFrame(
        [
            Row(domain="d.com", directive="Disallow", rule_path="/a"),
            Row(domain="d.com", directive="Allow", rule_path="/b"),
        ]
    )
    urls = spark.createDataFrame(
        [Row(doc_id=1, domain="d.com", path="/a/x")]
    )
    # only /a matches — disallowed; then a same-length Allow match:
    r = web.robots_check(urls, rules).first()
    assert r["allowed"] is False
    rules2 = rules.union(
        spark.createDataFrame(
            [Row(domain="d.com", directive="Allow", rule_path="/a")]
        )
    )
    r2 = web.robots_check(urls, rules2).first()
    assert r2["allowed"] is True  # Allow wins the length tie


def test_robots_unknown_domain_allowed(spark):
    robots = spark.createDataFrame([Row(domain="d.com", robots_txt=ROBOTS)])
    rules = web.robots_rules(robots)
    urls = spark.createDataFrame(
        [Row(doc_id=1, domain="other.com", path="/private")]
    )
    r = web.robots_check(urls, rules).first()
    assert r["allowed"] is True and r["winning_rule"] is None


def test_geohash_known_values(spark):
    # canonical fixtures: geohash.org reference encodings
    df = spark.createDataFrame(
        [
            Row(pid=1, lat=57.64911, lon=10.40744),   # u4pruydq
            Row(pid=2, lat=42.6, lon=-5.6),           # ezs42
            Row(pid=3, lat=0.0, lon=0.0),
            Row(pid=4, lat=-90.0, lon=-180.0),
            Row(pid=5, lat=90.0, lon=180.0),          # clamp top edge
        ]
    )
    out = {r["pid"]: r["geohash"] for r in
           web.geohash_encode(df, "lat", "lon", precision=8).collect()}
    assert out[1] == "u4pruydq"
    assert out[2].startswith("ezs42")
    assert out[3].startswith("s000")
    assert out[4] == "00000000"
    assert out[5] == "zzzzzzzz"


def test_geohash_matches_reference_impl(spark):
    # pure-python reference geohash vs the Catalyst bit-math version
    def ref_geohash(lat, lon, precision):
        b32 = web.GEOHASH32
        lat_r, lon_r = [-90.0, 90.0], [-180.0, 180.0]
        bits, out, even = 0, [], True
        ch = 0
        while len(out) < precision:
            if even:
                mid = (lon_r[0] + lon_r[1]) / 2
                if lon >= mid:
                    ch = ch * 2 + 1
                    lon_r[0] = mid
                else:
                    ch = ch * 2
                    lon_r[1] = mid
            else:
                mid = (lat_r[0] + lat_r[1]) / 2
                if lat >= mid:
                    ch = ch * 2 + 1
                    lat_r[0] = mid
                else:
                    ch = ch * 2
                    lat_r[1] = mid
            even = not even
            bits += 1
            if bits == 5:
                out.append(b32[ch])
                bits, ch = 0, 0
        return "".join(out)

    pts = [
        (48.8566, 2.3522),
        (-33.8688, 151.2093),
        (35.6895, 139.6917),
        (1e-9, -1e-9),
        (-0.1, 0.1),
    ]
    df = spark.createDataFrame(
        [Row(pid=i, lat=la, lon=lo) for i, (la, lo) in enumerate(pts)]
    )
    got = {r["pid"]: r["geohash"] for r in
           web.geohash_encode(df, "lat", "lon", precision=8).collect()}
    for i, (la, lo) in enumerate(pts):
        assert got[i] == ref_geohash(la, lo, 8), (la, lo)


def test_geohash_rejects_odd_precision():
    with pytest.raises(ValueError):
        web.geohash_col(F.lit(0.0), F.lit(0.0), precision=5)


WILD_ROBOTS = (
    "User-agent: *\nDisallow: /private*\nAllow: /private*/pub$"
    "\nDisallow: /*.pdf$\nDisallow: /exact$"
)


@pytest.mark.parametrize(
    "path,allowed,rule",
    [
        ("/private/x", False, "/private*"),
        ("/privateer", False, "/private*"),
        ("/private/a/pub", True, "/private*/pub$"),
        ("/private/a/pub/more", False, "/private*"),  # $ stops the Allow
        ("/doc.pdf", False, "/*.pdf$"),
        ("/doc.pdfx", True, None),  # $ anchor: .pdfx does not match
        ("/a.pdf/b", True, None),
        ("/exact", False, "/exact$"),
        ("/exactly", True, None),
        ("/open", True, None),
    ],
)
def test_robots_wildcard_semantics(spark, path, allowed, rule):
    robots = spark.createDataFrame(
        [Row(domain="d.com", robots_txt=WILD_ROBOTS)]
    )
    rules = web.robots_rules(robots)
    urls = spark.createDataFrame(
        [Row(doc_id=1, domain="d.com", path=path)]
    )
    r = web.robots_check_wildcard(urls, rules).first()
    assert r["allowed"] == allowed, (path, r)
    assert r["winning_rule"] == rule, (path, r)


def test_robots_wildcard_escapes_metachars(spark):
    # a rule containing regex metachars must match only literally
    robots = spark.createDataFrame(
        [Row(domain="d.com", robots_txt="User-agent: *\nDisallow: /a.b(c)+")]
    )
    rules = web.robots_rules(robots)
    urls = spark.createDataFrame(
        [
            Row(doc_id=1, domain="d.com", path="/a.b(c)+x"),
            Row(doc_id=2, domain="d.com", path="/aXb(c)+"),   # '.' literal
            Row(doc_id=3, domain="d.com", path="/a.bccc"),    # '(c)+' literal
        ]
    )
    got = {
        r["doc_id"]: r["allowed"]
        for r in web.robots_check_wildcard(urls, rules).collect()
    }
    assert got == {1: False, 2: True, 3: True}


def test_host_graph_rollup(spark):
    links = spark.createDataFrame(
        [
            Row(doc_id=1, domain="a.com", href="http://www.B.com/x"),
            Row(doc_id=1, domain="a.com", href="https://sub.b.com/y"),
            Row(doc_id=2, domain="a.com", href="/relative/path"),
            Row(doc_id=2, domain="a.com", href="http://c.org/z"),
            Row(doc_id=3, domain="b.com", href="http://a.com/"),
        ]
    )
    got = {
        (r["src_domain"], r["dst_domain"]): (r["n_links"], r["n_pages"])
        for r in web.host_graph(links).collect()
    }
    assert got == {
        ("a.com", "b.com"): (2, 1),   # www + subdomain both roll up
        ("a.com", "a.com"): (1, 1),   # relative href stays intra-site
        ("a.com", "c.org"): (1, 1),
        ("b.com", "a.com"): (1, 1),
    }


def test_html_extract_numeric_entities(spark):
    df = spark.createDataFrame(
        [Row(html_text="<p>a &#60;b&#62;&#160;c &#x3c;d&#x3e; "
                       "&#34;q&#x27; &#38;lt; &#x26;amp</p>")]
    )
    out = web.html_extract(df).select("extracted").first()[0]
    # &#38;lt; -> literal "&lt;" (no double decode); &#x26;amp -> "&amp"
    assert out == "a <b> c <d> \"q' &lt; &amp"


def test_robots_meta_group_scoping(spark):
    txt = (
        "User-agent: bot\nCrawl-delay: 9\nDisallow: /\n"
        "Sitemap: https://m.ex/a.xml\n"
        "User-agent: *\nCrawl-delay: 2.5\nDisallow: /x\n"
        "Sitemap: https://m.ex/b.xml"
    )
    df = spark.createDataFrame([Row(domain="d.com", robots_txt=txt)])
    r = web.robots_meta(df).first()
    # bot-group delay (9) ignored; sitemaps are global
    assert r["crawl_delay"] == 2.5
    assert r["n_sitemaps"] == 2
    assert r["first_sitemap"] == "https://m.ex/a.xml"


def test_robots_meta_no_wildcard_delay(spark):
    txt = "User-agent: bot\nCrawl-delay: 9\nUser-agent: *\nDisallow: /p"
    df = spark.createDataFrame([Row(domain="d.com", robots_txt=txt)])
    r = web.robots_meta(df).first()
    assert r["crawl_delay"] is None
    assert r["n_sitemaps"] == 0
