"""Web/URL curation operators — the stage between WARC ingest and
per-host policies (URL dedup needs canonical URLs; host caps and
blocklists need a host column). Pure pyspark.sql.functions string
work (codegen, map-side, zero shuffle), RE2-compatible patterns so
every rule has an exact DuckDB oracle.

Reference scope note: the reference engine has no web surface; this is
beyond-reference pipeline infrastructure alongside sources/warc.py.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf type hints resolve against globals

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# http(s)://[userinfo@]host[:port][/path][?query][#fragment] —
# anchored, no backrefs/lookaround (Java + RE2 + DuckDB compatible).
# The optional userinfo group matters: without it, url_host on
# 'http://u:p@blocked.example/' returns 'u' and host caps/blocklists
# key on garbage a crawl source controls. The userinfo char class
# includes '@' and the group is GREEDY, so the host is the token
# after the LAST '@' before the path — WHATWG/browser semantics;
# first-@ parsing would let 'http://x@y@evil.com/' evade a blocklist
# on evil.com (the real fetch target).
_URL_RE = (r"(?i)^(https?)://(?:([^/?#]*)@)?"
           r"([^/?#:@]+)(:[0-9]+)?([^?#]*)(\?[^#]*)?(#.*)?$")

# tracking parameters every published pipeline strips before URL dedup
TRACKING_PARAM_RE = r"^(utm_[A-Za-z0-9_]*|gclid|fbclid|msclkid|ref_src)="


def url_host(col):
    """Lowercased REAL host of an http(s) URL (userinfo and port
    stripped); NULL when the value does not parse as an http(s) URL.
    One regexp_extract — usable directly as the key of cap_per_key
    (per-host caps) or a blocklist join."""
    h = F.regexp_extract(col, _URL_RE, 3)
    return F.when(h != "", F.lower(h))


def normalize_url(
    df: DataFrame,
    url_col: str = "url",
    out_col: str | None = None,
    strip_www: bool = False,
) -> DataFrame:
    """Canonicalize http(s) URLs so URL-level dedup keys agree:

    - scheme and host lowercased (userinfo, when present, is kept
      VERBATIM — it is case-sensitive and folding it would conflate
      distinct credentials); default ports dropped (:80 on http,
      :443 on https), other ports kept;
    - fragment dropped (never reaches the server);
    - tracking query params removed (TRACKING_PARAM_RE: utm_*, gclid,
      fbclid, msclkid, ref_src); the '?' goes too when nothing
      survives; surviving params keep their original ORDER (sorting
      would conflate ?a=1&b=2 with ?b=2&a=1 — semantics-changing for
      some sites, so we only remove, never reorder);
    - empty path becomes '/' (http://x and http://x/ are the same
      resource).

    Non-http(s) values (mailto:, data:, garbage) pass through
    UNCHANGED — curation drops them downstream by host IS NULL, and a
    normalizer that nulls them would silently conflate all of them.
    Entirely map-side; exact DuckDB twin for the oracle.
    """
    u = F.col(url_col)
    scheme = F.lower(F.regexp_extract(u, _URL_RE, 1))
    userinfo = F.regexp_extract(u, _URL_RE, 2)
    host = F.lower(F.regexp_extract(u, _URL_RE, 3))
    if strip_www:
        host = F.regexp_replace(host, r"^www\.", "")
    port = F.regexp_extract(u, _URL_RE, 4)
    path = F.regexp_extract(u, _URL_RE, 5)
    query = F.regexp_extract(u, _URL_RE, 6)
    keep_port = F.when(
        ((scheme == "http") & (port == ":80"))
        | ((scheme == "https") & (port == ":443")), F.lit("")
    ).otherwise(port)
    params = F.filter(
        F.split(F.regexp_replace(query, r"^\?", ""), "&"),
        lambda p: (F.length(p) > 0)
        & ~p.rlike(TRACKING_PARAM_RE),
    )
    clean_query = F.when(
        F.size(params) > 0,
        F.concat(F.lit("?"), F.array_join(params, "&")),
    ).otherwise(F.lit(""))
    # userinfo (group 2) matched iff the URL had '@' before the host;
    # an EMPTY userinfo ('http://@x/') still had the '@' — re-emit it
    at = F.when(u.rlike(r"(?i)^https?://[^/?#]*@"), F.lit("@")) \
        .otherwise(F.lit(""))
    norm = F.concat(
        scheme, F.lit("://"), userinfo, at, host, keep_port,
        F.when(path == "", F.lit("/")).otherwise(path),
        clean_query,
    )
    out = F.when(scheme != "", norm).otherwise(u)
    return df.withColumn(out_col or url_col, out)


def host_suffixes(col):
    """array<string> of dot-suffixes of a host, most-specific first:
    'a.b.co' -> ['a.b.co', 'b.co', 'co'] — the match domain set a
    suffix blocklist (UT1 / RefinedWeb-style) keys on. Map-side; the
    array is bounded by the label count of one hostname."""
    parts = F.split(col, r"\.")
    n = F.size(parts)
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.array_join(F.slice(parts, i, n - i + F.lit(1)), "."),
    )


def blocklist_filter(
    df: DataFrame,
    blocked: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    block_col: str = "host",
    mode: str = "drop",
    flag_col: str = "blocked",
) -> DataFrame:
    """Suffix-domain blocklist over a URL column — the adult/malware/
    spam host gate every published crawl pipeline (C4, RefinedWeb,
    Gopher) applies before content filters. A row is blocked when the
    URL's REAL host (url_host: post-userinfo, lowercased) or ANY
    parent domain appears in ``blocked`` — listing 'evil.com' blocks
    'cdn.evil.com' but never 'notevil.com'.

    mode='drop' removes blocked rows AND rows with no parseable
    http(s) host (a crawl row whose URL cannot be keyed can't be
    policy-checked — failing open would let every garbage URL through
    the gate); mode='flag' keeps every row and adds boolean
    ``flag_col`` (NULL-host rows flag true, same fail-closed stance).

    Scale shape: two broadcast joins, the corpus never shuffles. The
    blocklist (small by contract — UT1 is ~4M hosts, a few MB)
    broadcasts against a NARROW (id, suffix) explode (<= ~6 rows per
    doc, two short columns — never the text); the surviving blocked-id
    set (blocked rows only, small when the gate is doing its job)
    broadcasts back for the anti/flag join. If a blocklist ever
    matched most of the corpus, flip the second join around — but
    that corpus has bigger problems.
    """
    if mode not in ("drop", "flag"):
        raise ValueError(f"mode must be 'drop' or 'flag', got {mode!r}")
    bl = F.broadcast(
        blocked.select(F.lower(F.col(block_col)).alias("_bl_host"))
        .distinct())
    host = url_host(F.col(url_col))
    sfx = df.select(
        F.col(id_col).alias("_bid"),
        F.explode(host_suffixes(host)).alias("_sfx"),
    )
    hit_ids = F.broadcast(
        sfx.join(bl, sfx["_sfx"] == bl["_bl_host"], "left_semi")
        .select("_bid").distinct())
    if mode == "flag":
        return (
            df.join(hit_ids, df[id_col] == hit_ids["_bid"], "left")
            .withColumn(
                flag_col,
                F.col("_bid").isNotNull() | host.isNull())
            .drop("_bid")
        )
    return df.filter(host.isNotNull()).join(
        hit_ids, df[id_col] == hit_ids["_bid"], "left_anti")


def host_stats(
    df: DataFrame,
    url_col: str = "url",
    value_cols: tuple = (),
) -> DataFrame:
    """(host, n_docs, n_urls, avg_<value>...) — the per-host corpus
    profile that feeds per-domain caps (cap_per_key) and reputation
    policies. One map-side-combined groupBy on the extracted host;
    rows with no parseable host aggregate under NULL so the garbage
    volume is visible rather than silently dropped."""
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(F.col(url_col)).alias("n_urls"),
    ]
    for c in value_cols:
        aggs.append(F.round(F.avg(F.col(c)), 6).alias(f"avg_{c}"))
    return (
        df.withColumn("_host", url_host(F.col(url_col)))
        .groupBy(F.col("_host").alias("host"))
        .agg(*aggs)
    )


def blocklist_flag_stream(
    df: DataFrame,
    blocked,
    url_col: str = "url",
    flag_col: str = "blocked",
) -> DataFrame:
    """Stream-legal twin of ``blocklist_filter(mode='flag')``: the
    suffix-domain membership test as ONE stateless Arrow-batched map
    over a broadcast host set — no joins, no distinct, no state, so it
    runs verbatim inside a streaming query (the batch operator's
    blocked-id broadcast-back needs a distinct the streaming planner
    rejects). Same fail-closed semantics: unparseable URLs flag True.

    ``blocked``: a host DataFrame (collected — blocklists are small by
    contract, the batch path broadcasts the same rows) or an iterable
    of hosts. Batch frames accept the same call (stream==batch
    pytest pins equality against blocklist_filter on every URL family
    incl. the userinfo-evasion cases).
    """
    import re as _re

    if isinstance(blocked, DataFrame):
        hosts = {r[0].lower() for r in blocked.collect()}
    else:
        hosts = {h.lower() for h in blocked}
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(hosts)
    pat = _re.compile(_URL_RE)

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("boolean")
    def _flag(urls: pd.Series) -> pd.Series:
        bl = bc.value

        def one(u):
            if u is None:
                return True
            m = pat.match(u)
            if not m or not m.group(3):
                return True  # fail closed: no policy key
            parts = m.group(3).lower().split(".")
            return any(".".join(parts[i:]) in bl
                       for i in range(len(parts)))

        return urls.map(one)

    return df.withColumn(flag_col, _flag(F.col(url_col)))
