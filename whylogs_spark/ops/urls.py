"""URL normalization, deduplication and domain statistics.

Web-scale training corpora are keyed by URL before any content-level
dedup runs (C4, RefinedWeb, Dolma all dedupe on a canonicalized URL
first — it is orders of magnitude cheaper than text hashing and
catches re-crawls of the same page). The reference has no URL surface;
this module is part of the beyond-reference LLM-pipeline family.

Everything here is pure JVM expression (regexp + array functions over
codegen) — zero shuffle for normalization/parts, and the dedup reuses
the skew-immune partial-agg winner pattern of ``ops.dedup.exact_dedup``
(a viral URL crawled a million times collapses map-side; no window
over the URL key).

Normalization rules (the common canonicalization subset):
* scheme and host lowercased; ``www.`` prefix dropped from the host
* default ports stripped (``:80`` for http, ``:443`` for https)
* fragment dropped
* tracking parameters removed: ``utm_*``, ``fbclid``, ``gclid``,
  ``msclkid``, ``ref``, ``ref_src``
* remaining query parameters sorted byte-wise (param order is not
  semantic for the overwhelming majority of endpoints)
* trailing ``/`` dropped (root path and non-root alike, so
  ``http://a.com`` and ``http://a.com/`` canonicalize identically)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TRACKING_RE = r"^(utm_[^=]*|fbclid|gclid|msclkid|ref|ref_src)="


def url_host(c: Column) -> Column:
    """Lowercased host (no port, no ``www.`` prefix). Scheme-less
    inputs (``example.com/a`` — common in messy crawl data) parse as
    host-first."""
    host = F.lower(F.regexp_extract(
        c, r"^(?:[a-zA-Z][a-zA-Z0-9+.-]*://)?([^/?#:]+)", 1))
    return F.regexp_replace(host, r"^www\.", "")


def registered_domain(c: Column) -> Column:
    """Last two host labels (``a.b.co`` -> ``b.co``) — a pragmatic
    registered-domain approximation that needs no suffix list."""
    return F.regexp_extract(url_host(c), r"([^.]+\.[^.]+)$", 1)


def normalize_url(c: Column) -> Column:
    """Canonical URL per the module rules, as one codegen expression.

    Inputs without a ``scheme://`` prefix are returned trimmed but
    otherwise untouched: canonicalizing an unparseable string would
    collapse every such row onto one key (an earlier draft mapped them
    all to ``'://'`` — one viral dedup bucket of unrelated rows).
    """
    scheme = F.lower(F.regexp_extract(c, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    hostport = F.lower(F.regexp_extract(c, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1))
    host = F.regexp_replace(
        F.when(scheme == "http", F.regexp_replace(hostport, r":80$", ""))
        .when(scheme == "https", F.regexp_replace(hostport, r":443$", ""))
        .otherwise(hostport),
        r"^www\.", "")
    path = F.regexp_extract(c, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    path = F.regexp_replace(path, r"/$", "")
    query = F.regexp_extract(c, r"\?([^#]*)", 1)
    params = F.array_sort(F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(_TRACKING_RE),
    ))
    qnorm = F.array_join(params, "&")
    return F.when(
        scheme == "",
        F.trim(c),
    ).otherwise(F.concat(
        scheme, F.lit("://"), host, path,
        F.when(qnorm != "", F.concat(F.lit("?"), qnorm)).otherwise(F.lit("")),
    ))


def with_url_parts(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Append url_norm / host / domain / path_depth columns — a
    zero-shuffle projection."""
    c = F.col(url_col)
    path = F.regexp_extract(c, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    depth = F.size(F.filter(F.split(path, "/"), lambda s: s != ""))
    return (
        df.withColumn("url_norm", normalize_url(c))
        .withColumn("host", url_host(c))
        .withColumn("domain", registered_domain(c))
        .withColumn("path_depth", depth)
    )


def url_dedup(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Keep the lowest-id row per canonical URL.

    Winner via partial-aggregated ``groupBy(min)`` + semi-join on the
    unique (url_norm, id) pair — the same skew-immune shape as
    ``exact_dedup``; the shuffle key is the xxhash64 of the canonical
    URL (8 bytes, not the URL string).
    """
    with_fp = df.withColumn(
        "__ufp", F.xxhash64(normalize_url(F.col(url_col))))
    winners = with_fp.groupBy("__ufp").agg(F.min(F.col(id_col)).alias(id_col))
    return with_fp.join(
        winners, on=["__ufp", id_col], how="leftsemi").drop("__ufp")


def domain_stats(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Pages and distinct canonical URLs per registered domain — the
    crawl-balance monitor a corpus curator reads before sampling."""
    base = df.select(
        registered_domain(F.col(url_col)).alias("domain"),
        F.xxhash64(normalize_url(F.col(url_col))).alias("__ufp"),
    )
    return (
        base.groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.countDistinct("__ufp").alias("n_unique_urls"),
        )
        .withColumn("n_dup_pages", F.col("n_pages") - F.col("n_unique_urls"))
    )


def _host_suffixes(c: Column, max_labels: int = 6) -> Column:
    """Dot-suffixes of the host up to ``max_labels`` deep PLUS the
    full host itself: ``a.b.co`` -> [a.b.co, b.co, co]. The full host
    is always present so an exact-host list entry matches no matter how
    many labels the host has; the cap only bounds the intermediate
    suffixes. In-plan array expression."""
    host = url_host(c)
    labels = F.split(host, r"\.")
    n = F.size(labels)
    sufx = F.transform(
        F.sequence(F.lit(0), F.least(n - 1, F.lit(max_labels - 1))),
        lambda i: F.array_join(F.slice(labels, n - i, i + 1), "."),
    )
    return F.filter(
        F.array_distinct(F.concat(F.array(host), sufx)),
        lambda s: s != "",
    )


def domain_filter(
    df: DataFrame,
    blocklist: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    mode: str = "block",
) -> DataFrame:
    """Filter rows by a domain list with subdomain-suffix semantics
    (an entry ``spam.example`` matches ``spam.example`` AND
    ``ads.spam.example``).

    ``blocklist`` is a 1-column DataFrame of domains. ``mode="block"``
    drops matching rows; ``mode="allow"`` keeps only matches. Scale
    shape: each host explodes into its (≤6-entry) dot-suffix array and
    equality-joins the list — a hash join Spark broadcasts when the
    list is small, never a suffix-condition nested-loop join; matched
    row ids then semi/anti-join back on ``id_col``.
    """
    if mode not in ("block", "allow"):
        raise ValueError(f"mode must be 'block' or 'allow', got {mode!r}")
    entries = blocklist.select(
        F.lower(F.trim(F.col(blocklist.columns[0]))).alias("__dom")
    ).distinct()
    exploded = df.select(
        F.col(id_col),
        F.explode(_host_suffixes(F.col(url_col))).alias("__s"))
    hit_ids = exploded.join(
        entries, exploded["__s"] == entries["__dom"], "leftsemi"
    ).select(id_col).distinct()
    how = "leftsemi" if mode == "allow" else "leftanti"
    return df.join(hit_ids, id_col, how)


# ------------------------------------------------------- robots.txt

def _robots_rules_for(body: str, agent: str):
    """Parse a robots.txt body into the (allow, pattern, length) rule
    list for ``agent`` per RFC 9309: groups naming a token contained in
    ``agent`` beat the '*' groups; ALL groups at the winning
    specificity are MERGED (sec. 2.2.1 — repeated groups combine);
    records other than user-agent/allow/disallow are ignored entirely
    and do not break a group."""
    groups = []  # (agents:list[str], rules:list[(allow, path)])
    cur_agents: list = []
    cur_rules: list = []
    expecting_agents = True
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not expecting_agents:
                groups.append((cur_agents, cur_rules))
                cur_agents, cur_rules = [], []
            cur_agents.append(value.lower())
            expecting_agents = True
        elif field in ("allow", "disallow"):
            if value or field == "disallow":
                cur_rules.append((field == "allow", value))
            expecting_agents = False
        # any other record (sitemap, crawl-delay, ...): ignored, does
        # not end the group per RFC 9309
    if cur_agents:
        groups.append((cur_agents, cur_rules))
    al = agent.lower()
    best_len = -1
    for agents, _ in groups:
        for a in agents:
            if a != "*" and a and a in al and len(a) > best_len:
                best_len = len(a)
    out = []
    for agents, rules in groups:
        if best_len >= 0:
            match = any(a != "*" and a and a in al
                        and len(a) == best_len for a in agents)
        else:
            match = "*" in agents
        if not match:
            continue
        for allow, path in rules:
            if not path:  # empty Disallow: allows everything
                continue
            # precedence uses the rule's WRITTEN length (before any
            # simplification), so longest-match ordering between rules
            # never shifts
            ln = len(path)
            # collapse '*' runs (equivalent matches, smaller state)
            while "**" in path:
                path = path.replace("**", "*")
            anchored = path.endswith("$")
            pat = path[:-1] if anchored else path
            out.append((allow, (pat, anchored), ln))
    return out


def _glob_match(pattern: str, anchored: bool, path: str) -> bool:
    """Linear-state wildcard prefix match ('*' spans any run; the rule
    matches any path PREFIX unless '$'-anchored to the full path).
    Iterative two-pointer algorithm — O(len*len) worst case, immune to
    the catastrophic backtracking a '*'->'.*' regex translation
    invites from adversarial third-party robots bodies."""
    pi = si = 0
    star_pi = star_si = -1
    n, m = len(path), len(pattern)
    while si < n:
        # wildcard test FIRST: '*' is also a legal URL-path character,
        # and consuming a pattern star as a literal would lose its
        # backtracking point (e.g. '/*a' must match path '/*ba')
        if pi < m and pattern[pi] == "*":
            star_pi, star_si = pi, si
            pi += 1
        elif pi < m and (pattern[pi] == path[si]):
            pi += 1
            si += 1
        elif star_pi >= 0:
            star_si += 1
            pi, si = star_pi + 1, star_si
        else:
            return False
        if pi == m or (pi == m - 1 and pattern[pi] == "*"):
            # pattern exhausted (or only a trailing '*') -> prefix hit;
            # '$'-anchored rules additionally need the path consumed
            if not anchored:
                return True
    while pi < m and pattern[pi] == "*":
        pi += 1
    return pi == m and si == n


def _robots_allowed(rules, url: str) -> bool:
    """Longest-match evaluation (Allow wins length ties)."""
    from urllib.parse import urlsplit

    parts = urlsplit(url)
    path = parts.path or "/"
    if parts.query:
        path += "?" + parts.query
    verdict, best = True, -1
    for allow, (pat, anchored), ln in rules:
        if _glob_match(pat, anchored, path) and (
                ln > best or (ln == best and allow)):
            verdict, best = allow, ln
    return verdict


def robots_filter(
    df: DataFrame,
    robots: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
    robots_col: str = "robots_txt",
    agent: str = "*",
    keep: str = "allowed",
) -> DataFrame:
    """Filter URLs by robots.txt rules — the compliance gate of a crawl
    pipeline. ``robots`` is a (host, robots_txt) table, one fetched
    robots body per host; rows whose host has no entry (or a NULL
    body) are treated as ALLOWED, per crawler convention.

    ``keep`` is 'allowed' (drop disallowed URLs — the corpus-build
    setting) or 'disallowed' (keep only violations, for auditing).

    Rule evaluation implements RFC 9309 semantics directly:
    User-agent groups (most-specific matching group, '*' fallback),
    Allow/Disallow with LONGEST-MATCH precedence and Allow winning
    length ties, and the '*' / '$' wildcards — the stdlib
    ``urllib.robotparser`` is order-based (first match wins) and gets
    ``Disallow: /private/`` + ``Allow: /private/ok.html`` wrong, so it
    is deliberately not used; wildcard matching runs an iterative glob
    matcher (O(path*pattern) worst case) rather than a '*'->'.*' regex,
    so an adversarial third-party robots body cannot trigger
    catastrophic backtracking in the kernel.

    Scale shape: one equi-join on host (robots tables are per-host —
    millions of rows at web scale, so it broadcasts below the threshold
    and hash-joins above, either way keyed correctly), then an
    Arrow-batched kernel that parses each DISTINCT robots body once per
    partition (hash-keyed, size-bounded memo) and evaluates URLs
    against it — no per-row parser construction.

    Robots hosts are canonicalized EXACTLY like ``url_host`` does to
    the URLs (lowercase, port stripped, ``www.`` stripped — apex and
    www. hosts are deliberately conflated, matching the module's URL
    convention), and multiple rows per host are deterministically
    reduced to one (max body) so a re-fetched robots entry can never
    duplicate output rows.
    """
    import hashlib
    from typing import Iterator

    import pandas as pd

    from pyspark.sql import types as T

    if keep not in ("allowed", "disallowed"):
        raise ValueError("keep must be allowed|disallowed")
    want_allowed = keep == "allowed"
    withhost = df.withColumn("__host", url_host(F.col(url_col)))
    rb = (
        robots.select(
            url_host(F.col(host_col)).alias("__host"),
            F.col(robots_col).alias("__robots"))
        .groupBy("__host").agg(F.max("__robots").alias("__robots"))
    )
    joined = withhost.join(rb, "__host", "left")
    schema = T.StructType(
        list(df.schema.fields) + [T.StructField("__keep",
                                                T.BooleanType())])
    cols = [f.name for f in df.schema.fields]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # memo keyed by a digest (the 500 KiB body strings are not
        # retained) and bounded so a partition spanning millions of
        # hosts cannot pin unbounded rule state
        cache: dict = {}
        _CACHE_CAP = 50_000

        def allowed(body, url) -> bool:
            if body is None or not str(body).strip():
                return True
            key = hashlib.md5(str(body).encode("utf-8",
                                               "surrogatepass")).digest()
            rules = cache.get(key)
            if rules is None:
                rules = _robots_rules_for(str(body), agent)
                if len(cache) >= _CACHE_CAP:
                    # evict one entry, never wipe: a full clear would
                    # re-parse the hot hosts' rules over and over on a
                    # partition with many distinct bodies
                    cache.pop(next(iter(cache)))
                cache[key] = rules
            try:
                return _robots_allowed(rules, url)
            except Exception:
                return True  # unparseable rule set -> permissive
        for pdf in batches:
            res = pdf[cols].copy()
            res["__keep"] = [
                allowed(b, u) == want_allowed
                for b, u in zip(pdf["__robots"], pdf[url_col])
            ]
            yield res

    out = joined.mapInPandas(kernel, schema)
    return out.filter(F.col("__keep")).drop("__keep")
