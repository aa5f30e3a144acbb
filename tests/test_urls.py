"""URL canonicalization: planted fixtures covering every rule, plus the
malformed-input passthrough contract."""

from __future__ import annotations

from cosmos_xenna_spark.operators.urls import with_normalized_urls

CASES = [
    # (raw, norm, host, domain)
    (
        "HTTPS://WWW.Site.Example.COM:443/a/b/?utm_source=x&b=2&a=1#frag",
        "https://site.example.com/a/b?a=1&b=2",
        "site.example.com",
        "example.com",
    ),
    ("http://ex.com:80/p/", "http://ex.com/p", "ex.com", "ex.com"),
    ("http://ex.com:8080/p", "http://ex.com:8080/p", "ex.com", "ex.com"),
    ("https://ex.com:80/p", "https://ex.com:80/p", "ex.com", "ex.com"),
    ("https://news.site.org/x//", "https://news.site.org/x", "news.site.org", "site.org"),
    # userinfo stripped from the host; tracking-only query vanishes
    (
        "https://user:pw@ex.com/p?gclid=abc&fbclid=z",
        "https://ex.com/p",
        "ex.com",
        "ex.com",
    ),
    # empty query/fragment markers collapse away
    ("http://ex.com/", "http://ex.com", "ex.com", "ex.com"),
    # param sorting is byte-lexicographic
    ("http://ex.com/p?z=1&y=2&x=3", "http://ex.com/p?x=3&y=2&z=1", "ex.com", "ex.com"),
    # ref= is tracking, href= and pref= are NOT (prefix match on whole key=)
    (
        "http://ex.com/p?ref=tw&href=a&pref=b",
        "http://ex.com/p?href=a&pref=b",
        "ex.com",
        "ex.com",
    ),
    # single-label host: no registered domain
    ("http://localhost:9000/x", "http://localhost:9000/x", "localhost", ""),
    # malformed: no scheme -> passthrough, NULL host/domain
    ("not a url at all", "not a url at all", None, None),
    ("/relative/path?a=1", "/relative/path?a=1", None, None),
]


def test_url_normalization_fixture(spark):
    df = spark.createDataFrame([(i, raw) for i, (raw, _, _, _) in enumerate(CASES)], "i long, url string")
    got = {
        r.i: (r.url_norm, r.url_host, r.registered_domain)
        for r in with_normalized_urls(df, "url").collect()
    }
    for i, (raw, norm, host, domain) in enumerate(CASES):
        assert got[i] == (norm, host, domain), f"case {i}: {raw!r} -> {got[i]}"


def test_url_normalization_idempotent(spark):
    """Canonicalizing an already-canonical URL is a no-op."""
    df = spark.createDataFrame(
        [(i, norm) for i, (_, norm, _, d) in enumerate(CASES) if d is not None],
        "i long, url string",
    )
    out = with_normalized_urls(df, "url").collect()
    for r in out:
        assert r.url_norm == r.url, r


def test_parsed_ips_branches(spark):
    from cosmos_xenna_spark.operators.urls import with_parsed_ips

    rows = [
        (0, "8.8.8.8"),
        (1, "10.1.2.3"),
        (2, "172.16.0.9"),
        (3, "172.32.0.9"),   # NOT private (172.32 is public)
        (4, "192.168.255.1"),
        (5, "127.0.0.1"),
        (6, "169.254.9.1"),
        (7, "256.1.1.1"),    # octet out of range
        (8, "1.2.3"),        # wrong field count
        (9, "not-an-ip"),
        (10, "01.2.3.4"),    # leading zero: still parses (regex allows)
    ]
    df = spark.createDataFrame(rows, "i long, ip string")
    got = {r.i: (r.ip_u32, r.cidr24, r.cidr16, r.is_private) for r in with_parsed_ips(df, "ip").collect()}
    assert got[0] == (8 * 16777216 + 8 * 65536 + 8 * 256 + 8, "8.8.8.0/24", "8.8.0.0/16", 0)
    assert got[1][3] == 1 and got[2][3] == 1 and got[4][3] == 1
    assert got[3][3] == 0
    assert got[5][3] == 1 and got[6][3] == 1
    for i in (7, 8, 9):
        assert got[i] == (None, None, None, None), i
    assert got[10][0] == 1 * 16777216 + 2 * 65536 + 3 * 256 + 4


def test_ua_parse_branches(spark):
    from cosmos_xenna_spark.operators.urls import with_parsed_user_agents

    rows = [
        (0, "Mozilla/5.0 (Windows NT 10.0) Chrome/120.0 Safari/537.36"),
        (1, "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15) Firefox/115.0"),
        (2, "Mozilla/5.0 (iPhone; CPU iPhone OS 17_0) Safari/604.1"),
        (3, "Mozilla/5.0 (Windows NT 10.0) Chrome/120.0 Safari/537.36 Edg/120.0"),
        (4, "Mozilla/5.0 (Linux; Android 14) Chrome/121.0 Safari/537.36 OPR/76.2"),
        (5, "Mozilla/5.0 (compatible; Googlebot/2.1; +http://www.google.com/bot.html)"),
        (6, "python-requests/2.31"),
        (7, "SomethingEntirelyUnknown/1.0"),
    ]
    df = spark.createDataFrame(rows, "i long, ua string")
    got = {r.i: (r.is_bot, r.browser_family, r.os_family)
           for r in with_parsed_user_agents(df, "ua").collect()}
    assert got[0] == (0, "chrome", "windows")
    assert got[1] == (0, "firefox", "macos")
    assert got[2] == (0, "safari", "ios")
    assert got[3] == (0, "edge", "windows")       # Edg/ beats Chrome/
    assert got[4] == (0, "opera", "android")      # OPR/ beats Chrome/
    assert got[5][0] == 1 and got[5][1] is None   # bot despite Mozilla token
    assert got[6][0] == 1
    assert got[7] == (0, "other", "other")


def test_outlink_domains_extraction(spark):
    from cosmos_xenna_spark.operators.urls import extract_outlink_domains

    rows = [
        (1, "x https://www.A.Example.com/p http://b.example.org/q?z=1 plain text"),
        (2, "no urls here"),
        (3, "twice https://c.example.net/1 and https://sub.c.example.net/2"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.doc_id, r.domain): r.n_links
           for r in extract_outlink_domains(df, "doc_id", "text").collect()}
    assert got == {
        (1, "example.com"): 1,
        (1, "example.org"): 1,
        (3, "example.net"): 2,
    }
