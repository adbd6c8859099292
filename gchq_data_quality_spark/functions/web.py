"""URL / domain operators for web-corpus curation.

A web-scale training pipeline keys most of its curation decisions on the
URL: per-domain caps (no single host dominates the mix), domain
blocklists (spam/SEO farms), and URL-shape quality signals (tracking-
parameter soup, extreme path depth, raw-IP hosts). Everything here is a
native Column expression — at 100 TB these run inside whole-stage
codegen on a pruned (url) scan, and the domain key they derive is what
``stats.cap_per_key`` / broadcast blocklist joins shuffle on (a short
string, never the document payload).

Host extraction is a deterministic regexp, not ``parse_url``: Spark's
parse_url delegates to java.net.URI, which returns NULL for hosts with
underscores or bare IPv6 and behaves differently across JVMs — a
regexp gives one engine-independent definition that an external SQL
oracle can replay verbatim.

The registrable-domain heuristic (last two labels, or last three under
a compound public suffix like co.uk) is exactly that — a heuristic. The
real Public Suffix List is a data file, not code: pass its entries to
``registrable_domain(suffixes=...)`` when available; the default list
covers the common compound suffixes so tests are hermetic.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# scheme://host[:port]/...  -> capture the host (no scheme = relative URL,
# no host). Group 1 = host. Lowercased before matching so HTTP://WWW.A.COM
# and http://www.a.com key identically.
_HOST_RE = r"^[a-z][a-z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)"

# common compound ("two-level") public suffixes; a real deployment feeds
# the full PSL here
_DEFAULT_COMPOUND_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "or.jp", "ne.jp",
    "com.br", "com.cn", "com.mx", "co.in", "co.kr", "co.za",
)


def url_host(url: Column) -> Column:
    """Lowercased host of an absolute URL; NULL when there is no
    scheme://host prefix (relative URLs, garbage). Strips userinfo and
    port. Pure regexp — engine-reproducible (see module docstring)."""
    host = F.regexp_extract(F.lower(F.trim(url)), _HOST_RE, 1)
    return F.when(host != "", host)


def is_ip_host(host: Column) -> Column:
    """True where the host is a raw IPv4 literal — a strong spam/CDN-
    bypass signal in web corpora (legit content hosts use names)."""
    return host.rlike(r"^\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}$")


def registrable_domain(
    host: Column, suffixes: Sequence[str] = _DEFAULT_COMPOUND_SUFFIXES
) -> Column:
    """Registrable domain (eTLD+1 heuristic) from a host: the last two
    dot-labels, or the last three when the last two form a compound
    public suffix ("bbc.co.uk" -> "bbc.co.uk", not "co.uk"). Raw-IP hosts
    pass through whole (capping per IP is the right behaviour). This is
    the per-domain grouping key for ``stats.cap_per_key`` and domain
    mix reports.

    Indexing uses 0-based ``F.get`` (NULL outside the array), NOT negative
    ``element_at``: the driver's session runs ANSI mode where element_at
    past the array bounds RAISES — a single-label host like ``localhost``
    must not error even though the n<=2 branch wins (Spark still compiles
    every branch's expression)."""
    parts = F.split(host, r"\.")
    n = F.size(parts)
    last2 = F.concat_ws(".", F.get(parts, n - 2), F.get(parts, n - 1))
    last3 = F.concat_ws(
        ".", F.get(parts, n - 3), F.get(parts, n - 2), F.get(parts, n - 1)
    )
    is_compound = last2.isin(*suffixes)
    return (
        F.when(host.isNull(), F.lit(None).cast("string"))
        .when(is_ip_host(host), host)
        .when(n <= 2, host)
        .when(is_compound & (n >= 3), last3)
        .otherwise(last2)
    )


def url_quality_flags(
    url: Column,
    max_len: int = 2048,
    max_path_depth: int = 10,
    max_query_params: int = 15,
) -> Column:
    """Struct of URL-shape quality signals: ``no_host`` (not an absolute
    URL), ``ip_host``, ``too_long``, ``deep_path`` (more than
    max_path_depth slash-separated segments), ``query_soup`` (more than
    max_query_params &-separated params — tracking/session-id farms), and
    ``ok``. NULL url -> every flag false except no_host. All codegen'd
    string ops; no UDF, no shuffle."""
    u = F.trim(url)
    host = url_host(u)
    no_host = u.isNull() | host.isNull()
    ip = F.coalesce(is_ip_host(host), F.lit(False))
    too_long = F.coalesce(F.length(u) > max_len, F.lit(False))
    # path = after the host, before ? or #; count its non-empty segments
    path = F.regexp_extract(F.lower(u), _HOST_RE + r"(/[^?#]*)", 2)
    depth = F.size(F.filter(F.split(path, "/"), lambda s: s != ""))
    deep = F.coalesce(depth > max_path_depth, F.lit(False))
    query = F.regexp_extract(u, r"\?([^#]*)", 1)
    n_params = F.size(F.filter(F.split(query, "&"), lambda s: s != ""))
    soup = F.coalesce(n_params > max_query_params, F.lit(False))
    ok = ~no_host & ~ip & ~too_long & ~deep & ~soup
    return F.struct(
        no_host.alias("no_host"),
        ip.alias("ip_host"),
        too_long.alias("too_long"),
        deep.alias("deep_path"),
        soup.alias("query_soup"),
        ok.alias("ok"),
    )


def filter_blocked_domains(
    df: DataFrame, url_col: str, blocked: Sequence[str] | DataFrame
) -> DataFrame:
    """Drop rows whose registrable domain is on a blocklist.

    ``blocked`` is either an in-memory list (becomes an ``isin`` literal
    set for small lists — purely map-side) or a 1-column DataFrame of
    domains (LEFT ANTI join on the derived key; Spark broadcasts the
    blocklist side when it is small, and a blocklist is always small
    relative to the corpus). Rows with no extractable host are KEPT —
    blocklisting is evidence-based; unparseable URLs are someone else's
    filter (url_quality_flags.no_host)."""
    dom = registrable_domain(url_host(F.col(url_col)))
    if isinstance(blocked, DataFrame):
        key = blocked.columns[0]
        block_keys = blocked.select(F.col(key).alias("__blocked_domain")).distinct()
        out = (
            df.withColumn("__domain", dom)
            .join(
                F.broadcast(block_keys),
                F.col("__domain") == F.col("__blocked_domain"),
                "left_anti",
            )
            .drop("__domain")
        )
        return out
    if not blocked:
        return df
    return df.filter(dom.isNull() | ~dom.isin(list(blocked)))


# ---------------------------------------------------------------------------
# HTML -> text extraction (native regexp passes, no UDF)
# ---------------------------------------------------------------------------

def strip_html(html: Column) -> Column:
    """Plain-text extraction from raw HTML — the first step of web-corpus
    curation, entirely in whole-stage codegen (a chain of regexp/literal
    replaces; no UDF, no external parser). Not a DOM parser: it is the
    pragmatic trafilatura-lite pass a 100 TB pipeline wants BEFORE quality
    scoring — drop script/style/comment payloads, turn block-level closers
    into newlines (so dedup_lines and the Gopher line metrics see real
    lines), strip remaining tags, decode the six ubiquitous entities, and
    squeeze whitespace while preserving paragraph breaks (max one blank
    line). NULL passes through."""
    out = F.regexp_replace(html, r"(?is)<(script|style)\b[^>]*>.*?</\1\s*>", " ")
    out = F.regexp_replace(out, r"(?s)<!--.*?-->", " ")
    # block-level boundaries become newlines so document structure survives
    out = F.regexp_replace(
        out,
        r"(?i)<br\s*/?>|</(p|div|h[1-6]|li|tr|ul|ol|table|blockquote|title|head)\s*>",
        "\n",
    )
    out = F.regexp_replace(out, r"(?s)<[^>]*>", " ")
    for entity, plain in (
        ("&nbsp;", " "),
        ("&amp;", "&"),
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "'"),
    ):
        out = F.replace(out, F.lit(entity), F.lit(plain))
    out = F.regexp_replace(out, r"[ \t\x0b\f\r]+", " ")
    out = F.regexp_replace(out, r" ?\n ?", "\n")
    out = F.regexp_replace(out, r"\n{3,}", "\n\n")
    return F.regexp_replace(F.trim(out), r"^\n+|\n+$", "")


def extract_links(html: Column) -> Column:
    """Array of href targets from anchor tags (single- or double-quoted),
    for outlink-based curation: feed through url_host/registrable_domain
    for per-page outlink-domain features, or into a blocklist sweep. Pure
    regexp_extract_all — one pass, no UDF. NULL -> NULL; no anchors ->
    empty array."""
    pat = r"(?i)<a\s[^>]*href\s*=\s*[\"']([^\"']+)[\"']"
    return F.regexp_extract_all(html, F.lit(pat), F.lit(1))
