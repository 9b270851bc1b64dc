"""URL canonicalization and domain rollup — the web-corpus hygiene ops
(C4/RefinedWeb-style pipelines dedupe and quota by canonical URL and
registrable domain before any text-level dedup touches the bytes).

Everything here is pure Catalyst expression (regexp_extract /
higher-order array functions — codegen'd, no UDF), and every rule is
chosen to be expressible IDENTICALLY in the DuckDB oracle dialect
(shared regex subset, list_filter/list_sort twins), so the catalog
queries hash-match.

Canonicalization rules (documented contract, applied in order):
  1. scheme and authority lowercase;
  2. default ports stripped (``:80`` for http, ``:443`` for https);
  3. fragment dropped;
  4. tracking query params dropped (``utm_*``, ``fbclid``, ``gclid``,
     ``msclkid``, ``mc_eid``), remaining params SORTED (byte order) and
     rejoined — param order never distinguishes documents;
  5. trailing slashes trimmed from the path (``/a/b/`` ≡ ``/a/b``; a
     bare root path collapses to the empty string).

Registrable-domain extraction uses the last-two-labels heuristic with a
small second-level allowlist (``co|com|org|net|ac|gov|edu`` → take three
labels, e.g. ``news.site.co.uk`` → ``site.co.uk``). Atomic hosts —
single-label (``localhost``), bare IPv4, bracketed IPv6 — bypass the
heuristic and roll up as themselves. The real Public Suffix List is a
data file, not an algorithm — at production scale it is a broadcast
lookup table joined on candidate suffixes (``registrable_domain_psl``
below is exactly that); the heuristic is the dependency-free default
and its divergences (e.g. multi-part ccTLDs outside the allowlist) are
accepted and documented.

At 100 TB: canonicalization is a narrow projection (no shuffle);
URL-level dedup is one hash-shuffle groupBy on the canonical string;
domain rollups shuffle on the (far lower-cardinality) domain key —
domain skew (a giant host) is bounded by map-side partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

URL_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(\?[^#]*)?.*$"
TRACKING_PARAM_RE = r"^(utm_[^=]*|fbclid|gclid|msclkid|mc_eid)="
SECOND_LEVEL = ["co", "com", "org", "net", "ac", "gov", "edu"]
IPV4_RE = r"^\d{1,3}(\.\d{1,3}){3}$"


def url_scheme(url: Column) -> Column:
    return F.lower(F.regexp_extract(url, URL_RE, 1))


def url_authority(url: Column) -> Column:
    """Lowercased authority with the scheme's default port stripped."""
    auth = F.lower(F.regexp_extract(url, URL_RE, 2))
    scheme = url_scheme(url)
    return (
        F.when(scheme == "http", F.regexp_replace(auth, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(auth, ":443$", ""))
        .otherwise(auth)
    )


def url_host(url: Column) -> Column:
    """Authority minus any port (and minus userinfo, for completeness)."""
    return F.regexp_replace(
        F.regexp_replace(url_authority(url), "^[^@]*@", ""), ":[0-9]*$", ""
    )


def _canonical_query(url: Column) -> Column:
    q = F.regexp_extract(url, URL_RE, 4)
    params = F.array_sort(
        F.filter(
            F.split(F.substring(q, 2, 1_000_000), "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    return F.when(
        F.size(params) > 0, F.concat(F.lit("?"), F.array_join(params, "&"))
    ).otherwise(F.lit(""))


def canonicalize_url(url: Column) -> Column:
    path = F.regexp_replace(F.regexp_extract(url, URL_RE, 3), "/+$", "")
    return F.concat(
        url_scheme(url), F.lit("://"), url_authority(url), path, _canonical_query(url)
    )


def registrable_domain_psl(
    df, host_col: str, psl, out_col: str = "domain", max_suffix_labels: int | None = None
):
    """PSL-as-data registrable-domain extraction: ``psl`` is a DataFrame
    with one ``suffix`` column (public suffixes, e.g. ``com``, ``co.uk``,
    ``nagoya.jp`` — load the real Public Suffix List at production; any
    subset works). Longest-match semantics via CHAINED BROADCAST LEFT
    JOINS, one per suffix depth from deepest to shallowest: at depth d
    the host's trailing-d-label string is equi-joined against the
    depth-d suffixes, and the registrable domain is taken from the
    deepest depth that matched (suffix + one preceding label). Hosts
    matching no suffix — and hosts that ARE a bare public suffix (no
    label left to register) — fall back to the ``registrable_domain``
    heuristic, which also handles atomic hosts (IPv4/IPv6/single-label).

    100 TB shape: zero shuffles and zero explodes on the corpus side —
    the PSL (~10k rows) is collected once at plan time to size the
    depth chain, and each depth's slice is broadcast; the corpus flows
    through d broadcast hash joins as a narrow pipeline. Depth chain
    length = max labels in any PSL suffix (capped by
    ``max_suffix_labels`` if given; real-PSL max is 5)."""
    depth_col = F.size(F.split(F.col("suffix"), r"\."))
    max_d = psl.agg(F.max(depth_col)).first()[0] or 1
    if max_suffix_labels is not None:
        max_d = min(max_d, max_suffix_labels)
    host = F.col(host_col)
    labels = F.split(host, r"\.")
    n = F.size(labels)
    out = df
    for d in range(max_d, 0, -1):
        suffixes_d = (
            psl.filter(depth_col == d)
            .select(F.col("suffix").alias(f"__psl_{d}"))
            .distinct()
        )
        # trailing-d-label string; only meaningful (and only joinable)
        # when at least one label precedes the suffix
        trail = F.when(
            n > d, F.concat_ws(".", F.slice(labels, n - d + 1, d))
        )
        out = out.join(
            F.broadcast(suffixes_d), on=trail == F.col(f"__psl_{d}"), how="left"
        )
    matched = None
    for d in range(max_d, 0, -1):
        reg_d = F.concat_ws(".", F.slice(labels, n - d, d + 1))
        matched = (
            F.when(F.col(f"__psl_{d}").isNotNull(), reg_d)
            if matched is None
            else matched.when(F.col(f"__psl_{d}").isNotNull(), reg_d)
        )
    domain = matched.otherwise(registrable_domain(host))
    return out.withColumn(out_col, domain).drop(
        *[f"__psl_{d}" for d in range(1, max_d + 1)]
    )


def registrable_domain(host: Column) -> Column:
    """Last-two-labels heuristic with the SECOND_LEVEL allowlist (see
    module docstring for the accepted divergence vs the real PSL).

    Atomic hosts bypass the label heuristic entirely: bare IPv4
    addresses (a "registrable domain" of ``3.4`` would poison any
    per-domain quota), bracketed IPv6 authorities (``[2001:db8::1]`` —
    never label-structured), and single-label hosts (``localhost``) all
    roll up as themselves. The atomic guard is the FIRST branch of the
    CASE, so the ``element_at(labels, n-1)`` suffix arithmetic is only
    ever evaluated for rows with >= 2 labels — conditional-branch
    evaluation is the load-bearing guarantee, pinned by tests and the
    url_canonicalize_battery oracle rows."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    atomic = host.startswith("[") | host.rlike(IPV4_RE) | (n < 2)
    second = F.element_at(labels, n - 1)
    take3 = (n >= 3) & second.isin(SECOND_LEVEL)
    return F.when(atomic, host).otherwise(
        F.when(
            take3,
            F.concat_ws(
                ".", F.element_at(labels, n - 2), second, F.element_at(labels, n)
            ),
        ).otherwise(
            F.concat_ws(".", F.element_at(labels, n - 1), F.element_at(labels, n))
        )
    )
