"""Text-analysis expression library for large-scale corpus pipelines.

All builders return native Columns (JVM-side, codegen'd) — language ID,
quality scoring, token counting, and fingerprinting run at full scan
throughput with no Python in the loop. These generalize the reference's
title-enrichment stage (SURVEY.md §2.2) to the document-corpus operators
a 100 TB training-data pipeline needs (BASELINE.json north star).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

from reddit_tech_jobs_data_pipeline_spark.functions.extract import (
    ColumnOrName,
    _col,
    bind1,
    tokens,
)

# Tiny per-language marker-word lists for the n-gram/stopword heuristic.
# Real deployments swap in fastText-style models via the pandas_udf escape
# hatch; the heuristic itself (score = marker hits, argmax wins) is the
# operator under test and is fully expressible in SQL.
DEFAULT_LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "ist", "nicht"],
    "fr": ["le", "la", "et", "est", "les"],
    "es": ["el", "la", "de", "que", "es"],
}

DEFAULT_STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "is", "in", "it"]


def char_count(text: ColumnOrName) -> Column:
    return F.coalesce(F.length(_col(text)), F.lit(0))


def token_count(text: ColumnOrName) -> Column:
    """Whitespace-word token count (\\w+ runs)."""
    return F.size(tokens(text))


def bpe_ish_token_count(text: ColumnOrName) -> Column:
    """BPE-flavored token estimate: word pieces of ≤4 chars + punctuation
    marks, via one regexp count — the cheap proxy for "how many LLM tokens
    is this corpus" that runs at scan speed."""
    return F.regexp_count(F.lower(_col(text)), F.lit(r"\w{1,4}|[^\w\s]"))


def _stopword_ratio_from(toks: Column, stopwords: Sequence[str]) -> Column:
    hits = F.size(F.filter(toks, lambda t: t.isin([*stopwords])))
    return F.when(F.size(toks) > 0, hits.cast("double") / F.size(toks)).otherwise(F.lit(0.0))


def stopword_ratio(text: ColumnOrName, stopwords: Sequence[str] = DEFAULT_STOPWORDS) -> Column:
    """Fraction of tokens that are stopwords; 0.0 for empty/NULL text.
    Token array let-bound (bind1): its three mentions otherwise
    re-tokenize the text three times — HOF expressions get no
    common-subexpression elimination."""
    return bind1(tokens(text), lambda t: _stopword_ratio_from(t, stopwords))


def punct_ratio(text: ColumnOrName) -> Column:
    """Punctuation chars / total chars; 0.0 for empty/NULL."""
    t = _col(text)
    n = F.length(t)
    punct = F.length(F.regexp_replace(t, r"[\w\s]", ""))
    return F.when(n > 0, punct.cast("double") / n).otherwise(F.lit(0.0))


def _mean_token_len_from(toks: Column) -> Column:
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.when(F.size(toks) > 0, total.cast("double") / F.size(toks)).otherwise(F.lit(0.0))


def mean_token_len(text: ColumnOrName) -> Column:
    return bind1(tokens(text), _mean_token_len_from)


def quality_score(text: ColumnOrName, stopwords: Sequence[str] = DEFAULT_STOPWORDS) -> Column:
    """Composite [0,1] quality heuristic: length band + stopword presence +
    low punctuation + sane mean token length. Deterministic, fully
    expressible in ANSI SQL for the oracle. One bind1 shares a single
    tokenizer run across all three token-based terms (was 7 tokenizer
    evaluations per row through the sub-functions' own mentions)."""
    t = _col(text)
    pr = punct_ratio(t)

    def _score(toks: Column) -> Column:
        n_tok = F.size(toks)
        len_ok = (n_tok >= 5) & (n_tok <= 100000)
        sw = _stopword_ratio_from(toks, stopwords)
        mtl = _mean_token_len_from(toks)
        return (
            len_ok.cast("double") * 0.4
            + (sw > 0.05).cast("double") * 0.2
            + (pr < 0.2).cast("double") * 0.2
            + ((mtl >= 2.0) & (mtl <= 12.0)).cast("double") * 0.2
        )

    return bind1(tokens(t), _score)


def lang_id(
    text: ColumnOrName, markers: Mapping[str, Sequence[str]] = DEFAULT_LANG_MARKERS
) -> Column:
    """Marker-word language ID: score = count of marker hits in the token
    set per language; argmax wins, ties broken by language code order;
    no hits -> 'und' (undetermined). Token array let-bound across the
    per-language filters (one tokenizer run, not one per language)."""
    return bind1(tokens(text), lambda toks: _lang_id_from(toks, markers))


def _lang_id_from(
    toks: Column, markers: Mapping[str, Sequence[str]] = DEFAULT_LANG_MARKERS
) -> Column:
    """lang_id over an already-bound token array (see lang_id)."""

    def _hits(kws: Sequence[str]):
        # NB: returns a 1-arg lambda; extra lambda params (even defaulted)
        # make PySpark bind the higher-order function's index argument.
        return lambda t: t.isin([*kws])

    scored = []
    for code in sorted(markers):
        hits = F.size(F.filter(toks, _hits(markers[code])))
        scored.append(F.struct(hits.alias("score"), F.lit(code).alias("code")))
    # array_max over (score, code) structs: max score, then max code — to
    # get deterministic *lowest* code on ties we order codes descending in
    # the struct comparison by negating: instead sort ascending and pick
    # last of (score asc, code desc) == first of (score desc, code asc).
    arr = F.array(*scored)
    top = F.array_sort(
        arr,
        lambda a, b: F.when(a["score"] > b["score"], -1)
        .when(a["score"] < b["score"], 1)
        .when(a["code"] < b["code"], -1)
        .when(a["code"] > b["code"], 1)
        .otherwise(0),
    )[0]
    # nested bind1: ``top`` is mentioned twice below — without the
    # binding the sort (and the per-language filters feeding it)
    # would run twice per row
    return bind1(
        top,
        lambda best: F.when(best["score"] > 0, best["code"]).otherwise(F.lit("und")),
    )


def rolling_fingerprint(text: ColumnOrName, mod: int = 1_000_000_007) -> Column:
    """Order-sensitive polynomial rolling hash over the token stream
    (Rabin-Karp style): fold (acc*31 + h(token)) mod p, with h(token) the
    first 32 bits of md5 — engine-agnostic (md5 + integer fold reproduce
    bit-identically in any SQL engine). Distinguishes reorderings that the
    canonical ``fingerprint`` deliberately collapses. Empty/NULL -> 0."""
    toks = tokens(text)
    th = lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long")  # noqa: E731
    return F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: (acc * 31 + th(t)) % F.lit(mod)
    )


def fingerprint(text: ColumnOrName) -> Column:
    """Canonical document fingerprint: md5 over the sorted distinct token
    set — robust to word order and repetition, the cheap exact-near-dup
    key (full near-dup via minhash in operators/dedup.py)."""
    canon = F.array_join(F.array_sort(F.array_distinct(tokens(text))), " ")
    return F.md5(canon)


# PII scrub patterns, applied in declaration order (email first so the
# host part can't be half-eaten by the ipv4 rule, ipv4 before phone so
# dotted octets aren't mistaken for dotted phone numbers). RE2- and
# Java-regex-compatible subset: no backrefs, no lookaround.
PII_PATTERNS: list[tuple[str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ipv4", r"\b(\d{1,3}\.){3}\d{1,3}\b"),
    ("phone", r"\+?\d{3}[-. ]\d{3}[-. ]\d{4}"),
]


def pii_redact(text: ColumnOrName) -> Column:
    """Replace every PII match with its typed placeholder (``<EMAIL>``,
    ``<IPV4>``, ``<PHONE>``) — chained ``regexp_replace``, pure Catalyst,
    one codegen stage; the corpus-prep scrub pass that must run over
    every byte at 100 TB, so it cannot afford a Python UDF."""
    out = F.coalesce(F.col(text) if isinstance(text, str) else text, F.lit(""))
    for name, pat in PII_PATTERNS:
        out = F.regexp_replace(out, pat, f"<{name.upper()}>")
    return out


def pii_count(text: ColumnOrName, kind: str) -> Column:
    """Matches of one PII pattern in the raw text (audit metric: how much
    was scrubbed, per type)."""
    pat = dict(PII_PATTERNS)[kind]
    t = F.coalesce(F.col(text) if isinstance(text, str) else text, F.lit(""))
    return F.regexp_count(t, F.lit(pat))
