"""URL analysis operators for web-corpus curation.

Beyond-reference extensions: web-crawl corpora (Common-Crawl-style)
key most curation decisions off the URL — canonical-URL dedup, domain
allow/block lists, per-domain caps. These operators keep the whole
family as pure Column expressions (regexp + string builtins, no UDF,
zero shuffle for the per-row forms) with semantics simple enough to
mirror exactly in the DuckDB oracle.

Parsing here is deliberately regex-based rather than Spark's
``parse_url``: parse_url's Java URI edge-case behavior (missing
components, encoding) cannot be reproduced in another engine, and
hash-exact verification is the house rule. The regexes cover the
well-formed http(s) URL shape a crawler emits; a production pipeline
would layer stricter RFC 3986 handling behind the same contract.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# One capture group per component, anchored; query/fragment optional.
_SCHEME_RE = "^([a-zA-Z][a-zA-Z0-9+.-]*)://"
_HOST_RE = "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)"
_PATH_RE = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^?#]*)"
_QUERY_RE = "\\?([^#]*)"


def _c(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def url_scheme(c: Column | str) -> Column:
    return F.lower(F.nullif(F.regexp_extract(_c(c), _SCHEME_RE, 1), F.lit("")))


def url_host(c: Column | str) -> Column:
    """Lowercased host with the SCHEME'S default port dropped (:80 for
    http, :443 for https). A non-default port — including
    http://host:443 — is kept: it names a distinct origin and must not
    dedup with the portless URL."""
    x = _c(c)
    host = F.lower(F.regexp_extract(x, _HOST_RE, 1))
    scheme = url_scheme(x)
    host = (
        F.when(scheme == "http", F.regexp_replace(host, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(host, ":443$", ""))
        .otherwise(host)
    )
    return F.nullif(host, F.lit(""))


def url_path(c: Column | str) -> Column:
    """Path component (case preserved — paths are case-sensitive),
    trailing slash stripped, '' → '/'."""
    path = F.regexp_extract(_c(c), _PATH_RE, 1)
    path = F.regexp_replace(path, "/+$", "")
    return F.when(path == "", F.lit("/")).otherwise(path)


def url_query(c: Column | str) -> Column:
    return F.nullif(F.regexp_extract(_c(c), _QUERY_RE, 1), F.lit(""))


def path_depth_of(path: Column) -> Column:
    """Number of non-empty segments of an already-extracted path
    column ('/a/b/' → 2, '/' → 0)."""
    return F.size(F.filter(F.split(path, "/"), lambda s: s != ""))


def url_path_depth(c: Column | str) -> Column:
    """Number of non-empty path segments ('/a/b/' → 2, '/' → 0)."""
    return path_depth_of(url_path(c))


def registered_domain(c: Column | str) -> Column:
    """Heuristic eTLD+1: the last two labels of the host (www.a.com →
    a.com). A real pipeline uses the public-suffix list (co.uk et
    al.); the two-label heuristic is the verifiable stand-in and the
    broadcast-join shape for the PSL variant is identical. A
    non-default port (kept in url_host) is stripped first so it never
    leaks into the domain."""
    return domain_of(url_host(c))


def domain_of(host: Column) -> Column:
    """registered_domain over an already-extracted host column."""
    bare = F.regexp_replace(host, ":[0-9]+$", "")
    return F.nullif(F.regexp_extract(bare, "([^.]+\\.[^.]+)$", 1), F.lit(""))


def strip_tracking_params(query: Column) -> Column:
    """Remove utm_*/fbclid/gclid tracking parameters from a query
    string, preserving the relative order of the rest. NULL when
    nothing survives."""
    kept = F.filter(
        F.split(query, "&"),
        lambda kv: ~kv.rlike("^(utm_[a-zA-Z]+|fbclid|gclid)="),
    )
    return F.when(
        query.isNotNull() & (F.size(kept) > 0), F.array_join(kept, "&")
    )


def canonical_from_parts(
    scheme: Column, host: Column, path: Column, q: Column
) -> Column:
    """Canonical URL assembled from already-materialized part columns
    (``q`` post-strip_tracking_params). Prefer this over
    canonicalize_url when the parts exist as columns: Spark's CSE
    does not deduplicate subtrees across when-branches and lambda
    bodies, so the inlined form re-runs each regex several times."""
    base = F.concat(scheme, F.lit("://"), host, path)
    return F.when(
        scheme.isNotNull() & host.isNotNull(),
        F.concat(
            base,
            F.when(q.isNotNull(), F.concat(F.lit("?"), q)).otherwise(F.lit("")),
        ),
    )


def canonicalize_url(c: Column | str) -> Column:
    """Canonical URL for exact-dedup keys: lowercase scheme+host, drop
    default port, strip fragment, strip tracking params, strip the
    path's trailing slash. Deterministic, engine-mirrorable, one
    expression — for hot paths, materialize the parts first (see
    with_url_parts / canonical_from_parts)."""
    return canonical_from_parts(
        url_scheme(c),
        url_host(c),
        url_path(c),
        strip_tracking_params(url_query(c)),
    )


def with_url_parts(df, url_col: str, prefix: str = "__url_"):
    """Add scheme/host/path/stripped-query part columns in one
    projection, so every downstream consumer (canonical key, domain,
    depth) references the materialized columns instead of re-running
    the regex chain per consumer."""
    return df.select(
        "*",
        url_scheme(url_col).alias(f"{prefix}scheme"),
        url_host(url_col).alias(f"{prefix}host"),
        url_path(url_col).alias(f"{prefix}path"),
        strip_tracking_params(url_query(url_col)).alias(f"{prefix}q"),
    )


def url_dedup_first_wins(df, url_col: str, order_col: str):
    """Keep the first row (by ``order_col``) per canonical URL — the
    crawl-layer exact dedup. One shuffle on the canonical key; the
    row_number trim compiles to map-side WindowGroupLimit, so each
    duplicate group moves one row per map partition, not the group.
    The canonical key is built in two projections (parts, then
    assembly) so each URL regex evaluates exactly once per row."""
    from pyspark.sql import Window

    parts = with_url_parts(df, url_col)
    canon = parts.withColumn(
        "__canon",
        canonical_from_parts(
            F.col("__url_scheme"),
            F.col("__url_host"),
            F.col("__url_path"),
            F.col("__url_q"),
        ),
    ).drop("__url_scheme", "__url_host", "__url_path", "__url_q")
    w = Window.partitionBy("__canon").orderBy(F.asc(order_col))
    return (
        canon.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def html_to_text(c: Column | str) -> Column:
    """Boilerplate-free text from raw HTML — the extraction step every
    web-corpus pipeline runs between the crawl and the curation
    filters (trafilatura-lite). Pure regexp_replace chain: script and
    style blocks (with their content) and comments removed, remaining
    tags stripped, the five ubiquitous named entities decoded (&amp;
    LAST, the conventional single-pass order, so '&amp;lt;' decodes to
    '&lt;' identically on every engine), whitespace collapsed.
    Codegen'd, zero shuffle, linear scan. RE2-compatible patterns
    (no backreferences), so the oracle mirrors them verbatim.
    A production pipeline chains readability scoring behind the same
    Column contract; numeric character references are out of scope."""
    x = _c(c)
    x = F.regexp_replace(x, "(?is)<script[^>]*>.*?</script>", " ")
    x = F.regexp_replace(x, "(?is)<style[^>]*>.*?</style>", " ")
    x = F.regexp_replace(x, "(?s)<!--.*?-->", " ")
    x = F.regexp_replace(x, "(?s)<[^>]+>", " ")
    for ent, ch in (
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "'"),
        ("&nbsp;", " "),
        ("&amp;", "&"),
    ):
        x = F.replace(x, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(x, "\\s+", " "))
