"""URL canonicalization for web-corpus pipelines.

Every large web-scale curation pipeline (CommonCrawl-style) needs a
deterministic URL canonicalizer before URL-keyed dedup, domain capping
and domain-mix rebalancing: the same page arrives as
``HTTPS://WWW.Site.com:443/a/?utm_source=x&b=1`` and
``https://site.com/a?b=1`` and must key identically.

All steps are row-local Spark built-ins (regexp + array HOFs, JVM-side
whole-stage codegen — no Python, no shuffle): this is a projection,
so it composes with any downstream keyed operator at zero plan cost.

Normalization contract (applied in order):
1. scheme lowercased;
2. host lowercased, userinfo-free, leading ``www.`` stripped;
3. default ports dropped (``:80`` for http, ``:443`` for https),
   non-default ports kept;
4. trailing slashes stripped from the path (``/a/`` == ``/a``; the
   root path collapses to empty);
5. query parameters: tracking params dropped (``utm_*`` prefixes and
   the exact keys in ``TRACKING_PREFIXES``), the rest sorted
   byte-lexicographically and re-joined (param order never
   distinguishes pages);
6. fragment dropped.

``registered_domain`` is the last-two-labels heuristic — correct for
``example.com`` / ``site.org``, wrong for multi-label public suffixes
(``example.co.uk`` -> ``co.uk``); a production deployment swaps in a
broadcast public-suffix table (same join shape as the keyword
blocklist), which this container does not carry.

Reference parity: the reference has no URL handling (its pipelines
treat web metadata inside user Stage code); this is engine surface a
curation pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# exact-prefix matches against "key=value" strings
TRACKING_PREFIXES = ("utm_", "gclid=", "fbclid=", "ref=", "mc_cid=", "mc_eid=")

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOSTPORT_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#]+)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
_QUERY_RE = r"\?([^#]*)"


def _is_tracking(x: Column) -> Column:
    cond = x.startswith(TRACKING_PREFIXES[0])
    for p in TRACKING_PREFIXES[1:]:
        cond = cond | x.startswith(p)
    return cond


def _norm_query(url: Column) -> Column:
    raw = F.regexp_extract(url, _QUERY_RE, 1)
    parts = F.split(raw, "&")
    keep = F.filter(parts, lambda x: (x != "") & ~_is_tracking(x))
    return F.array_join(F.array_sort(keep), "&")


def with_normalized_urls(df: DataFrame, url_col: str) -> DataFrame:
    """Add ``url_norm``, ``url_host`` and ``registered_domain``.

    Rows whose value does not parse as ``scheme://...`` pass through
    with ``url_norm`` equal to the raw value and NULL host/domain (a
    malformed URL must never be silently rewritten into a valid one).
    """
    url = F.col(url_col)
    scheme = F.lower(F.regexp_extract(url, _SCHEME_RE, 1))
    hostport = F.lower(F.regexp_extract(url, _HOSTPORT_RE, 1))
    host = F.regexp_replace(hostport, r":[0-9]+$", "")
    port = F.regexp_extract(hostport, r":([0-9]+)$", 1)
    host_nw = F.regexp_replace(host, r"^www\.", "")
    default = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443")
    )
    portpart = F.when((port == "") | default, F.lit("")).otherwise(
        F.concat(F.lit(":"), port)
    )
    path = F.regexp_replace(F.regexp_extract(url, _PATH_RE, 1), r"/+$", "")
    q = _norm_query(url)
    qpart = F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q))
    norm = F.concat(scheme, F.lit("://"), host_nw, portpart, path, qpart)
    parsed = scheme != ""
    return df.withColumns(
        {
            "url_norm": F.when(parsed, norm).otherwise(url),
            "url_host": F.when(parsed, host_nw),
            "registered_domain": F.when(
                parsed, F.regexp_extract(host_nw, r"([^.]+\.[^.]+)$", 1)
            ),
        }
    )


def with_normalized_urls_sql(table_sql: str, url_col: str) -> str:
    """DuckDB mirror of :func:`with_normalized_urls` — identical
    regexes and the same filter/sort/join pipeline via list HOFs."""
    drop = " OR ".join(f"starts_with(x, '{p}')" for p in TRACKING_PREFIXES)
    return f"""
    WITH raw AS (
      SELECT *,
             lower(regexp_extract({url_col}, '{_SCHEME_RE}', 1)) AS __scheme,
             lower(regexp_extract({url_col}, '{_HOSTPORT_RE}', 1)) AS __hostport,
             regexp_replace(regexp_extract({url_col}, '{_PATH_RE}', 1),
                            '/+$', '') AS __path,
             COALESCE(list_aggregate(
               list_sort(list_filter(
                 string_split(regexp_extract({url_col}, '{_QUERY_RE}', 1), '&'),
                 x -> x <> '' AND NOT ({drop})
               )), 'string_agg', '&'), '') AS __q
      FROM ({table_sql})
    ),
    hp AS (
      SELECT *,
             regexp_replace(regexp_replace(__hostport, ':[0-9]+$', ''),
                            '^www\\.', '') AS __host,
             regexp_extract(__hostport, ':([0-9]+)$', 1) AS __port
      FROM raw
    ),
    np AS (
      SELECT *,
             CASE WHEN __port = '' OR (__scheme = 'http' AND __port = '80')
                       OR (__scheme = 'https' AND __port = '443')
                  THEN '' ELSE ':' || __port END AS __portpart,
             CASE WHEN __q = '' THEN '' ELSE '?' || __q END AS __qpart
      FROM hp
    )
    SELECT * EXCLUDE (__scheme, __hostport, __path, __q, __host, __port,
                      __portpart, __qpart),
           CASE WHEN __scheme <> ''
                THEN __scheme || '://' || __host || __portpart || __path || __qpart
                ELSE {url_col} END AS url_norm,
           CASE WHEN __scheme <> '' THEN __host END AS url_host,
           CASE WHEN __scheme <> ''
                THEN regexp_extract(__host, '([^.]+\\.[^.]+)$', 1) END
             AS registered_domain
    FROM np
    """


def with_parsed_ips(df: DataFrame, ip_col: str) -> DataFrame:
    """Parse dotted-quad IPv4 strings into the fields a web-log
    curation pass keys on: ``ip_u32`` (numeric form, range-joinable
    against geo/CIDR tables), ``cidr24`` / ``cidr16`` (the standard
    abuse-rate and dedup aggregation prefixes, as canonical
    ``a.b.c.0/24`` strings), and ``is_private`` (RFC1918 + loopback +
    link-local — traffic to drop before any public-corpus statistics).

    All row-local JVM regexp + integer arithmetic (zero shuffle, whole-
    stage codegen).  Malformed addresses (wrong field count, values >
    255, empty octets) yield NULLs across the board — never a silently
    wrong prefix.
    """
    ip = F.col(ip_col)
    octs = [
        F.regexp_extract(ip, r"^(\d{1,3})\.(\d{1,3})\.(\d{1,3})\.(\d{1,3})$", i)
        for i in (1, 2, 3, 4)
    ]
    valid = (F.regexp_extract(ip, r"^(\d{1,3})\.(\d{1,3})\.(\d{1,3})\.(\d{1,3})$", 1) != "")
    for o in octs:
        valid = valid & (o.cast("int") <= 255)
    a, b, c, d = [o.cast("bigint") for o in octs]
    u32 = a * 16777216 + b * 65536 + c * 256 + d
    private = (
        (a == 10)
        | ((a == 172) & (b >= 16) & (b <= 31))
        | ((a == 192) & (b == 168))
        | (a == 127)
        | ((a == 169) & (b == 254))
    )
    return df.withColumns(
        {
            "ip_u32": F.when(valid, u32),
            "cidr24": F.when(
                valid,
                F.concat_ws(".", octs[0], octs[1], octs[2], F.lit("0/24")),
            ),
            "cidr16": F.when(
                valid,
                F.concat_ws(".", octs[0], octs[1], F.lit("0"), F.lit("0/16")),
            ),
            "is_private": F.when(valid, private.cast("bigint")),
        }
    )


def with_parsed_ips_sql(table_sql: str, ip_col: str) -> str:
    """DuckDB mirror — identical regex and arithmetic."""
    rx = r"^(\d{1,3})\.(\d{1,3})\.(\d{1,3})\.(\d{1,3})$"
    octs = [f"regexp_extract({ip_col}, '{rx}', {i})" for i in (1, 2, 3, 4)]
    # TRY_CAST, not CAST: DuckDB's vectorized AND does NOT short-circuit
    # per row, so CAST('') can evaluate for non-matching rows even
    # behind the <> '' guard (surfaced by the sf1.0 sweep's multi-part
    # parquet batching; NULL <= 255 is NULL -> CASE falls through
    # exactly like the old guard intended).
    valid = f"({octs[0]} <> ''" + "".join(
        f" AND TRY_CAST({o} AS INTEGER) <= 255" for o in octs
    ) + ")"
    a, b, c, d = [f"TRY_CAST({o} AS BIGINT)" for o in octs]
    u32 = f"{a} * 16777216 + {b} * 65536 + {c} * 256 + {d}"
    private = (
        f"({a} = 10 OR ({a} = 172 AND {b} >= 16 AND {b} <= 31)"
        f" OR ({a} = 192 AND {b} = 168) OR {a} = 127"
        f" OR ({a} = 169 AND {b} = 254))"
    )
    return f"""
    SELECT *,
           CASE WHEN {valid} THEN {u32} END AS ip_u32,
           CASE WHEN {valid} THEN {octs[0]} || '.' || {octs[1]} || '.' || {octs[2]} || '.0/24' END AS cidr24,
           CASE WHEN {valid} THEN {octs[0]} || '.' || {octs[1]} || '.0.0/16' END AS cidr16,
           CASE WHEN {valid} THEN CAST({private} AS BIGINT) END AS is_private
    FROM ({table_sql})
    """


# Ordered (family, pattern) rules — first match wins, mirroring the
# CASE chain in SQL.  Bot detection runs FIRST (a crawler UA often
# embeds a browser token: "Mozilla/5.0 ... Googlebot/2.1").
UA_BOT_RE = r"(?i)(bot|crawl|spider|slurp|curl|wget|python-requests)"
UA_FAMILIES = (
    ("edge", r"Edg(e|A|iOS)?/"),
    ("opera", r"(OPR|Opera)/"),
    ("chrome", r"Chrome/"),
    ("firefox", r"Firefox/"),
    ("safari", r"Safari/"),
)
UA_OSES = (
    ("android", r"Android"),
    ("ios", r"(iPhone|iPad|iOS)"),
    ("windows", r"Windows"),
    ("macos", r"Mac OS X"),
    ("linux", r"Linux"),
)


def with_parsed_user_agents(df: DataFrame, ua_col: str) -> DataFrame:
    """Classify user-agent strings into the buckets a traffic-curation
    pass keys on: ``is_bot`` (crawler/tooling signatures — the rows a
    human-traffic corpus drops first), ``browser_family`` and
    ``os_family`` (first-match-wins rule chains; 'other' when nothing
    matches).  Row-local regexps, zero shuffle, whole-stage codegen.

    This is deliberately a RULE TABLE, not a full UA grammar: the
    rules are data (``UA_FAMILIES`` / ``UA_OSES``), so a production
    deployment extends them without touching the plan shape.
    """
    ua = F.col(ua_col)
    is_bot = ua.rlike(UA_BOT_RE)
    fam = F.lit("other")
    for name, pat in reversed(UA_FAMILIES):
        fam = F.when(ua.rlike(pat), name).otherwise(fam)
    osf = F.lit("other")
    for name, pat in reversed(UA_OSES):
        osf = F.when(ua.rlike(pat), name).otherwise(osf)
    return df.withColumns(
        {
            "is_bot": is_bot.cast("bigint"),
            "browser_family": F.when(~is_bot, fam),
            "os_family": F.when(~is_bot, osf),
        }
    )


def with_parsed_user_agents_sql(table_sql: str, ua_col: str) -> str:
    """DuckDB mirror — identical rule order and regexes."""
    fam = " ".join(
        f"WHEN regexp_matches({ua_col}, '{pat}') THEN '{name}'"
        for name, pat in UA_FAMILIES
    )
    osf = " ".join(
        f"WHEN regexp_matches({ua_col}, '{pat}') THEN '{name}'"
        for name, pat in UA_OSES
    )
    bot = f"regexp_matches({ua_col}, '{UA_BOT_RE}')"
    return f"""
    SELECT *,
           CAST({bot} AS BIGINT) AS is_bot,
           CASE WHEN NOT {bot} THEN CASE {fam} ELSE 'other' END END AS browser_family,
           CASE WHEN NOT {bot} THEN CASE {osf} ELSE 'other' END END AS os_family
    FROM ({table_sql})
    """


def extract_outlink_domains(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Outlink extraction: every http(s) URL mentioned in the text,
    reduced to its registered domain and counted per (doc, domain) —
    the web-graph construction primitive behind citation analysis,
    spam-farm detection and domain-level PageRank inputs.

    One regexp explode (row-local) + one aggregation on the fine-
    grained (doc, domain) key.  Returns ``(id, domain, n_links)``.
    """
    urls = F.expr(
        f"regexp_extract_all({text_col}, 'https?://[^\\\\s/]+[^\\\\s]*', 0)"
    )
    host = F.regexp_replace(
        F.lower(F.regexp_extract(F.col("__u"), _HOSTPORT_RE, 1)),
        r"(:[0-9]+$)|(^www\.)",
        "",
    )
    return (
        df.select(F.col(id_col), F.explode(urls).alias("__u"))
        .select(
            id_col,
            F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1).alias("domain"),
        )
        .filter(F.col("domain") != "")
        .groupBy(id_col, "domain")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_links"))
    )


def extract_outlink_domains_sql(table_sql: str, id_col: str, text_col: str) -> str:
    return f"""
    SELECT {id_col}, domain, CAST(COUNT(*) AS BIGINT) AS n_links
    FROM (
      SELECT {id_col},
             regexp_extract(
               regexp_replace(
                 lower(regexp_extract(u, '{_HOSTPORT_RE}', 1)),
                 '(:[0-9]+$)|(^www\\.)', ''),
               '([^.]+\\.[^.]+)$', 1) AS domain
      FROM (
        SELECT {id_col},
               UNNEST(regexp_extract_all({text_col}, 'https?://[^\\s/]+[^\\s]*', 0)) AS u
        FROM ({table_sql})
      )
    ) WHERE domain <> ''
    GROUP BY {id_col}, domain
    """
