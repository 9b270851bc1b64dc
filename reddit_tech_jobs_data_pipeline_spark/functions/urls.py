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
labels, e.g. ``news.site.co.uk`` → ``site.co.uk``). The real Public
Suffix List is a data file, not an algorithm — at production scale it
would be a broadcast lookup table joined on the candidate suffixes; the
heuristic is the dependency-free stand-in and its divergences (e.g.
multi-part ccTLDs outside the allowlist) are accepted and documented.

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


def registrable_domain(host: Column) -> Column:
    """Last-two-labels heuristic with the SECOND_LEVEL allowlist (see
    module docstring for the accepted divergence vs the real PSL)."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    second = F.element_at(labels, n - 1)
    take3 = (n >= 3) & second.isin(SECOND_LEVEL)
    return F.when(
        take3,
        F.concat_ws(
            ".", F.element_at(labels, n - 2), second, F.element_at(labels, n)
        ),
    ).otherwise(
        F.when(
            n >= 2, F.concat_ws(".", F.element_at(labels, n - 1), F.element_at(labels, n))
        ).otherwise(host)
    )
