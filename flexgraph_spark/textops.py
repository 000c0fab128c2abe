"""Training-data pipeline operators over document / embedding tables.

Everything JVM-expressible uses built-in pyspark.sql.functions (whole-stage
codegen); the few genuinely-Python kernels (simhash bit packing, random
projections) are Arrow-batched pandas UDFs — never per-row Python.

Operators:
* exact deduplication (content-hash groupBy)
* token / quality statistics (pure column expressions)
* Gopher-style repetition stats + quality filter + token-window chunking
* n-gram shingles + exact Jaccard similarity
* MinHash signatures + LSH banding -> near-duplicate candidate pairs
* SimHash (64-bit) near-dup
* language-ID heuristic (stopword n-gram scoring)
* rolling-hash document fingerprint
* brute-force cosine top-k ANN + LSH-bucketed variant
* multimodal binary-column plumbing (decode stubbed; schema/batching real)

Scale notes: dedup/minhash shuffle on hash keys (uniform by construction);
LSH candidate verification joins only within buckets; ANN brute force
broadcasts the (small) query set and computes dot products JVM-side.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


# ---------------------------------------------------------------------------
# Deduplication
# ---------------------------------------------------------------------------

def exact_duplicates(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Groups of byte-identical documents: (text_hash, dup_count, doc_ids).
    One shuffle on a 256-bit hash — uniform keys, no skew."""
    return (
        df.select(F.sha2(F.col(text_col), 256).alias("text_hash"), "doc_id")
        .groupBy("text_hash")
        .agg(F.count("*").alias("dup_count"), F.sort_array(F.collect_list("doc_id")).alias("doc_ids"))
        .filter(F.col("dup_count") > 1)
    )


def dedup_exact(df: DataFrame, text_col: str = "text", keep: str = "min_doc_id") -> DataFrame:
    """Keep one representative per identical text (lowest doc_id)."""
    w = Window.partitionBy(F.sha2(F.col(text_col), 256)).orderBy("doc_id")
    return df.withColumn("_rn", F.row_number().over(w)).filter("_rn = 1").drop("_rn")


# ---------------------------------------------------------------------------
# Text statistics / quality
# ---------------------------------------------------------------------------

def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, n_chars, avg_token_len) — whitespace tokenization,
    pure column expressions."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n_tokens = F.when(F.length(F.trim(F.col(text_col))) == 0, 0).otherwise(F.size(toks))
    return df.select(
        "doc_id",
        n_tokens.cast("long").alias("n_tokens"),
        F.length(text_col).cast("long").alias("n_chars"),
        (F.length(F.regexp_replace(F.col(text_col), r"\s+", "")) /
         F.greatest(n_tokens, F.lit(1))).alias("avg_token_len"),
    )


def regex_token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """BPE-ish token proxy: words + standalone punctuation as tokens."""
    return df.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(r"\w+|[^\w\s]"), F.lit(0)))
        .cast("long")
        .alias("n_regex_tokens"),
    )


def quality_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality features: length, punctuation density, digit ratio,
    uppercase ratio, mean line length. All JVM-side."""
    txt = F.col(text_col)
    n = F.greatest(F.length(txt), F.lit(1)).cast("double")
    punct = F.length(F.regexp_replace(txt, r"[^.!?,;:]", "")).cast("double")
    digits = F.length(F.regexp_replace(txt, r"[^0-9]", "")).cast("double")
    upper = F.length(F.regexp_replace(txt, r"[^A-Z]", "")).cast("double")
    lines = F.greatest(F.size(F.split(txt, r"\n")), F.lit(1)).cast("double")
    return df.select(
        "doc_id",
        F.length(txt).cast("long").alias("n_chars"),
        (punct / n).alias("punct_ratio"),
        (digits / n).alias("digit_ratio"),
        (upper / n).alias("upper_ratio"),
        (F.length(txt) / lines).alias("mean_line_len"),
    )


_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "was"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein", "von", "zu"],
    "fr": ["le", "la", "les", "et", "des", "est", "dans", "que", "une", "pour"],
    "es": ["el", "la", "los", "que", "de", "en", "es", "una", "por", "con"],
}


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-overlap language heuristic: (doc_id, lang_pred, lang_score).
    Pure column expressions: per-language hit count over the token set."""
    toks = F.array_distinct(F.split(F.lower(F.trim(F.col(text_col))), r"[^a-zà-ÿ]+"))
    scores = [
        F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in ws]))).alias(lang)
        for lang, ws in _STOPWORDS.items()
    ]
    scored = df.select("doc_id", *scores)
    langs = list(_STOPWORDS)
    best = F.greatest(*[F.col(lg) for lg in langs])
    pred = F.lit("unknown")
    for lg in reversed(langs):  # earlier langs win ties
        pred = F.when(F.col(lg) == best, F.lit(lg)).otherwise(pred)
    return scored.select(
        "doc_id",
        F.when(best > 0, pred).otherwise(F.lit("unknown")).alias("lang_pred"),
        best.cast("double").alias("lang_score"),
    )


def doc_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic 64-bit document fingerprint (xxhash of normalized text +
    a rolling-window structural hash)."""
    norm = F.lower(F.regexp_replace(F.col(text_col), r"\s+", " "))
    return df.select(
        "doc_id",
        F.xxhash64(norm).alias("fingerprint"),
        F.xxhash64(F.substring(norm, 1, 256)).alias("prefix_fingerprint"),
    )


# PII patterns: kept to syntax shared by Java regex (Spark) and RE2
# (DuckDB oracle) — character classes, \b, bounded quantifiers; no
# lookaround. Redaction order is fixed (email → ipv4 → ssn) so both
# engines rewrite identically when patterns could overlap.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_SSN = r"\b\d{3}-\d{2}-\d{4}\b"
URL_PATTERN = r"https?://\S+"
URL_DOMAIN = r"https?://([^/\s]+)"


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Training-data PII scrub: emails, IPv4 addresses, and SSN-shaped
    numbers replaced by ``<EMAIL>``/``<IP>``/``<SSN>`` tokens, with per-doc
    match counts (counted on the ORIGINAL text, per pattern independently).

    Returns (doc_id, redacted, n_emails, n_ipv4, n_ssn). Pure column
    expressions — whole-stage codegen, no shuffle, scales as a map-only
    pass over the corpus."""
    txt = F.col(text_col)

    def _count(pat: str) -> F.Column:
        return F.size(F.regexp_extract_all(txt, F.lit(pat), F.lit(0))).cast("long")

    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(txt, PII_EMAIL, "<EMAIL>"), PII_IPV4, "<IP>"
        ),
        PII_SSN,
        "<SSN>",
    )
    return df.select(
        "doc_id",
        redacted.alias("redacted"),
        _count(PII_EMAIL).alias("n_emails"),
        _count(PII_IPV4).alias("n_ipv4"),
        _count(PII_SSN).alias("n_ssn"),
    )


def url_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-domain URL statistics over the corpus: (domain, n_urls, n_docs).

    Extract-all + explode keeps the heavy regex work in the map phase;
    the only shuffle is the groupBy on domain (Catalyst partial-aggregates
    per partition first, so a few mega-domains reduce to one row per
    partition before moving — hub domains don't skew the shuffle)."""
    urls = df.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.col(text_col), F.lit(URL_PATTERN), F.lit(0))
        ).alias("url"),
    )
    return (
        urls.select("doc_id", F.regexp_extract("url", URL_DOMAIN, 1).alias("domain"))
        .groupBy("domain")
        .agg(
            F.count("*").alias("n_urls"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
    )


def repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style within-document repetition signals (Rae et al. 2021
    §A1.1): (doc_id, dup_line_frac, dup_line_char_frac, top_bigram_frac).

    * ``dup_line_frac`` — fraction of lines that are repeats of an earlier
      line (1 − distinct/total).
    * ``dup_line_char_frac`` — fraction of line CHARACTERS inside repeated
      lines (char-mass version; boilerplate detection).
    * ``top_bigram_frac`` — fraction of all word bigrams taken by the most
      frequent one (looping/spam detection).

    Line stats are pure column expressions (higher-order array functions,
    zero shuffle); the bigram mode needs a per-(doc, gram) count —
    explode + two-level aggregation, shuffle keyed on (doc_id, gram)
    (uniform: doc_id spreads hot grams across keys; map-side partial agg
    compacts before the wire)."""
    txt = F.col(text_col)
    lines = F.split(txt, r"\n")
    dlines = F.array_distinct(lines)
    chars = lambda arr: F.aggregate(  # noqa: E731
        arr, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    words = F.split(F.lower(F.trim(txt)), r"\s+")
    base = df.select(
        "doc_id",
        ((F.size(lines) - F.size(dlines)) / F.size(lines)).alias("dup_line_frac"),
        (
            (chars(lines) - chars(dlines))
            / F.greatest(chars(lines), F.lit(1)).cast("double")
        ).alias("dup_line_char_frac"),
        words.alias("w"),
    )
    grams = base.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("w") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size("w") - 1),
                    lambda i: F.concat_ws(
                        " ", F.element_at("w", i), F.element_at("w", i + 1)
                    ),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("gram"),
    )
    top = (
        grams.groupBy("doc_id", "gram")
        .agg(F.count("*").alias("cnt"))
        .groupBy("doc_id")
        .agg((F.max("cnt") / F.sum("cnt")).alias("top_bigram_frac"))
    )
    return base.drop("w").join(top, "doc_id", "left").withColumn(
        "top_bigram_frac", F.coalesce("top_bigram_frac", F.lit(0.0))
    )


def quality_filter(
    df: DataFrame,
    text_col: str = "text",
    min_tokens: int = 10,
    max_punct_ratio: float = 0.2,
    max_digit_ratio: float = 0.3,
    max_dup_line_frac: float = 0.3,
    min_avg_token_len: float = 2.0,
    max_avg_token_len: float = 12.0,
) -> DataFrame:
    """The classic pretraining quality gate: token-count window, punctuation
    / digit density caps, repeated-line cap, mean-token-length window
    (Gopher/C4-style rules). Returns the PASSING docs with their feature
    columns so a pipeline can audit the cut. Everything is a join of
    column-expression stat tables on doc_id — Catalyst collapses it into
    one scan when the stats come from the same source."""
    stats = (
        token_stats(df, text_col)
        .join(quality_scores(df, text_col).drop("n_chars"), "doc_id")
        .join(
            repetition_stats(df, text_col).select("doc_id", "dup_line_frac"),
            "doc_id",
        )
    )
    return stats.filter(
        (F.col("n_tokens") >= min_tokens)
        & (F.col("punct_ratio") <= max_punct_ratio)
        & (F.col("digit_ratio") <= max_digit_ratio)
        & (F.col("dup_line_frac") <= max_dup_line_frac)
        & (F.col("avg_token_len") >= min_avg_token_len)
        & (F.col("avg_token_len") <= max_avg_token_len)
    ).select(
        "doc_id",
        "n_tokens",
        "avg_token_len",
        "punct_ratio",
        "digit_ratio",
        "dup_line_frac",
    )


def paragraph_dedup(
    df: DataFrame,
    text_col: str = "text",
    sep: str = "\n",
) -> DataFrame:
    """C4-style corpus-wide paragraph deduplication (Raffel et al. 2020
    §2.2 dedup at span granularity, the line/paragraph variant): split
    each document on ``sep``, keep only the globally FIRST occurrence of
    every non-blank paragraph (first = lowest (doc_id, position) — a
    deterministic total order), drop later copies anywhere in the corpus,
    and reconstruct the cleaned document. Blank/whitespace-only
    paragraphs are structural, never keyed, always kept.

    Returns (doc_id, n_paras, n_dropped, clean_text) — callers wanting a
    compact equality face can hash clean_text (the driver query does).

    Plan: posexplode → key non-blank paragraphs by sha2-256 of their
    trimmed body (uniform shuffle key; ~no collisions at 2^-128) →
    min(struct(doc_id, pos)) per key (map-side partial agg — the winner
    pick never ships full duplicate groups) → join winners back on the
    hash → rebuild with sort_array(collect_list(struct(pos, para))).
    Two shuffles (winner agg keyed by hash, rebuild keyed by doc_id);
    paragraph text crosses the wire once per stage, no driver collect."""
    paras = df.select(
        "doc_id",
        F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "para"),
    ).withColumn(
        "key",
        F.when(F.trim("para") != "", F.sha2(F.trim("para"), 256)),
    )
    winners = (
        paras.filter(F.col("key").isNotNull())
        .groupBy("key")
        .agg(F.min(F.struct("doc_id", "pos")).alias("w"))
    )
    kept = (
        paras.join(winners, "key", "left")
        .withColumn(
            "keep",
            F.col("key").isNull()
            | ((F.col("w.doc_id") == F.col("doc_id")) & (F.col("w.pos") == F.col("pos"))),
        )
    )
    return (
        kept.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_paras"),
            F.sum((~F.col("keep")).cast("long")).alias("n_dropped"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(F.col("keep"), F.struct("pos", "para"))
                        )
                    ),
                    lambda s: s.getField("para"),
                ),
                sep,
            ).alias("clean_text"),
        )
    )


def duplicated_spans(
    df: DataFrame,
    n: int = 5,
    min_docs: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """Cross-document duplicated-span statistics — the per-document face
    of Lee et al. 2022 ("Deduplicating Training Data Makes Language
    Models Better", exact-substring dedup): how much of each document is
    made of word n-gram spans that also occur in ≥ ``min_docs`` OTHER-
    or-same documents. Returns
    (doc_id, n_grams, n_dup, dup_frac):

    * ``n_grams``   — token n-gram positions in the doc (0 if < n tokens)
    * ``n_dup``     — positions whose n-gram occurs in ≥ min_docs distinct
                      documents corpus-wide
    * ``dup_frac``  — n_dup / n_grams (0.0 for short docs), rounded 1e-6

    Plan: tokenize + sliding n-grams are pure column expressions (JVM
    higher-order functions — transform over sequence + slice, no Python);
    each gram is keyed by its sha2-256 (uniform 256-bit shuffle key, the
    gram STRING never crosses the wire beyond the first partial agg).
    Two aggregations: per-(doc, gram) counts (map-side combine), then
    gram → distinct-doc counts; duplicated grams join back per doc.
    At 100 TB the dup-gram set itself is join-sized (not broadcast);
    everything shuffles on the hash key. Suffix-automaton exact-substring
    dedup (the paper's other half) is deliberately out of scope — span
    statistics + near-dup operators cover the pipeline use."""
    toks = df.select(
        "doc_id",
        F.filter(
            F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != ""
        ).alias("t"),
    )
    grams = toks.select(
        "doc_id",
        F.greatest(F.size("t") - (n - 1), F.lit(0)).alias("n_grams"),
        F.when(
            F.size("t") >= n,
            F.expr(
                f"transform(sequence(1, size(t) - {n - 1}), "
                f"i -> sha2(array_join(slice(t, i, {n}), ' '), 256))"
            ),
        ).otherwise(F.array().cast("array<string>")).alias("g"),
    )
    per_dg = (
        grams.select("doc_id", F.explode("g").alias("gram"))
        .groupBy("doc_id", "gram")
        .agg(F.count("*").alias("cnt"))
    )
    dup_grams = (
        per_dg.groupBy("gram")
        .agg(F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .select("gram")
    )
    per_doc_dup = (
        per_dg.join(dup_grams, "gram")
        .groupBy("doc_id")
        .agg(F.sum("cnt").alias("n_dup"))
    )
    return (
        grams.select("doc_id", "n_grams")
        .join(per_doc_dup, "doc_id", "left")
        .select(
            "doc_id",
            "n_grams",
            F.coalesce("n_dup", F.lit(0)).alias("n_dup"),
            F.round(
                F.when(
                    F.col("n_grams") > 0,
                    F.coalesce("n_dup", F.lit(0)) / F.col("n_grams"),
                ).otherwise(0.0),
                6,
            ).alias("dup_frac"),
        )
    )


def blocklist_stats(
    df: DataFrame,
    terms: list[str],
    text_col: str = "text",
    max_flagged_frac: float = 0.0,
) -> DataFrame:
    """C4-style bad-words screen (Raffel et al. 2020 §2.2: drop any page
    containing a blocklisted word): per-document count and fraction of
    whitespace tokens that whole-token-match the blocklist
    (case-insensitive), plus the keep verdict
    ``passes = flagged_frac <= max_flagged_frac`` (C4's rule is the
    default 0.0 — one hit kills the doc; relax for audit-style runs).
    Returns ``(doc_id, n_tokens, n_flagged, flagged_frac, passes)``.

    Scale shape: the blocklist folds into the plan as an array LITERAL
    (a few hundred terms — never a join side) probed per token inside one
    higher-order filter; map-only, zero shuffle, whole-stage codegen.
    Empty docs pass (0 tokens, frac 0).
    """
    if not terms:
        raise ValueError("blocklist_stats needs a non-empty term list")
    lit_terms = F.array(*[F.lit(t.lower()) for t in sorted(set(terms))])
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != ""
    )
    flagged = F.size(
        F.filter(toks, lambda x: F.array_contains(lit_terms, x))
    ).cast("long")
    n_tok = F.size(toks).cast("long")
    frac = F.when(n_tok > 0, flagged / n_tok).otherwise(0.0)
    return df.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        flagged.alias("n_flagged"),
        F.round(frac, 6).alias("flagged_frac"),
        (frac <= float(max_flagged_frac)).alias("passes"),
    )


def remove_duplicated_spans(
    df: DataFrame,
    n: int = 5,
    min_docs: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """Exact-substring REMOVAL — the other half of Lee et al. 2022
    ("Deduplicating Training Data Makes Language Models Better"), the half
    :func:`duplicated_spans` only measures: rewrite every document with
    each corpus-duplicated token n-gram span CUT OUT. A token is removed
    iff it lies inside some n-gram occurring in ≥ ``min_docs`` distinct
    documents; overlapping spans merge, so exactly the union of duplicated
    spans disappears (the paper removes duplicated substrings ≥ a length
    floor; at token-n-gram granularity the removed set IS that union).
    Returns ``(doc_id, clean_text, n_tokens, n_removed)`` — ``clean_text``
    is the kept ORIGINAL tokens re-joined with single spaces (whitespace
    is normalized, the paragraph_dedup contract; duplicate DETECTION is
    case-insensitive like duplicated_spans, but the rewrite preserves the
    surviving tokens' case — a cleaning pass must not mangle text it
    keeps).

    Scale shape: the only per-token work stays INSIDE each row (sliding
    gram hashes, then one ``aggregate`` fold over the sorted duplicated
    start positions rebuilding the kept tokens — no token-level shuffle,
    no Python). What moves between executors: per-(doc, gram) partials
    into the dup-gram count (sha256 keys, uniform), then only the DUP
    START POSITIONS come back per doc (collect_list on doc_id). A 100 TB
    corpus with 1% duplication shuffles ~1% of its gram positions."""
    toks = df.select(
        "doc_id",
        F.filter(
            F.split(F.col(text_col), r"\s+"), lambda x: x != ""
        ).alias("t"),
    )
    # gram hashes feed ONLY the dup-count side (lowercased inside the
    # joined gram string — case-insensitive matching, case-preserving
    # rebuild); the rebuild side re-derives the cheap token array, so the
    # sha256 sliding window runs exactly once
    grams = toks.select(
        "doc_id",
        F.when(
            F.size("t") >= n,
            F.expr(
                f"transform(sequence(1, size(t) - {n - 1}), "
                f"i -> sha2(lower(array_join(slice(t, i, {n}), ' ')), 256))"
            ),
        ).otherwise(F.array().cast("array<string>")).alias("g"),
    )
    pos = grams.select("doc_id", F.posexplode("g").alias("i0", "gram"))
    # ONE (doc_id, gram) aggregation carries both consumers: the dup-doc
    # count derives from it AND the join-back reads it, so the two plan
    # branches share the identical exchange subtree (runtime exchange
    # reuse dedupes the explode + sha256 sliding window; the naive
    # distinct-then-join diamond recomputed it — measured 17.8s -> 10.1s
    # median at sf0.1/local[32]).
    per_dg = pos.groupBy("doc_id", "gram").agg(
        F.collect_list(F.col("i0") + 1).alias("ps")
    )
    dup_grams = (
        per_dg.groupBy("gram").agg(F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .select("gram")
    )
    # per-doc SORTED duplicated 1-based start positions (only these shuffle)
    starts = (
        per_dg.join(dup_grams, "gram")
        .groupBy("doc_id")
        .agg(F.array_sort(F.flatten(F.collect_list("ps"))).alias("s"))
    )
    # One fold over the starts rebuilds the kept tokens: state = (nxt, out);
    # each start x appends t[nxt .. x-1] (empty when spans overlap: the
    # greatest(..,0) guard) and advances nxt past the span; finish appends
    # the tail. O(tokens) per doc, all inside whole-stage codegen.
    kept = F.expr(
        f"aggregate(s, struct(1 as nxt, cast(array() as array<string>) as out), "
        f"(st, x) -> struct(greatest(st.nxt, x + {n}) as nxt, "
        f"  concat(st.out, slice(t, st.nxt, greatest(x - st.nxt, 0))) as out), "
        f"st -> concat(st.out, slice(t, st.nxt, size(t) - st.nxt + 1)))"
    )
    out = (
        toks.join(starts, "doc_id", "left")
        .select(
            "doc_id",
            F.size("t").alias("n_tokens"),
            F.when(F.col("s").isNotNull(), kept).otherwise(F.col("t")).alias("k"),
        )
        .select(
            "doc_id",
            F.array_join("k", " ").alias("clean_text"),
            "n_tokens",
            (F.col("n_tokens") - F.size("k")).alias("n_removed"),
        )
    )
    return out


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    chunk_tokens: int = 128,
    overlap: int = 32,
) -> DataFrame:
    """Fixed-size overlapping token-window chunking — the standard
    context-window packing precursor: (doc_id, chunk_id, n_chunk_tokens,
    chunk_text) with stride ``chunk_tokens − overlap``; the last window is
    short rather than padded; empty documents produce no chunks.

    Pure column expressions (split → slice windows → posexplode): the row
    explosion happens executor-side with no shuffle at all — chunks inherit
    the document partitioning."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    step = chunk_tokens - overlap
    txt = F.col(text_col)
    words = F.split(F.trim(txt), r"\s+")
    n = F.size(words)
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil((n - F.lit(overlap)) / F.lit(float(step))),
    )
    windows = F.transform(
        F.sequence(F.lit(0), (n_chunks - 1).cast("int")),
        lambda i: F.slice(words, i * step + 1, chunk_tokens),
    )
    return (
        df.filter(F.length(F.trim(txt)) > 0)
        .select("doc_id", F.posexplode(windows).alias("chunk_id", "toks"))
        .select(
            "doc_id",
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.size("toks").cast("long").alias("n_chunk_tokens"),
            F.array_join("toks", " ").alias("chunk_text"),
        )
    )


# ---------------------------------------------------------------------------
# Shingles, Jaccard, MinHash + LSH
# ---------------------------------------------------------------------------

def shingles(text: F.Column, k: int = 5) -> F.Column:
    """Distinct character k-shingles of lowercased text (JVM-side)."""
    norm = F.lower(F.regexp_replace(text, r"\s+", " "))
    idx = F.sequence(F.lit(1), F.greatest(F.length(norm) - (k - 1), F.lit(1)))
    return F.array_distinct(F.transform(idx, lambda i: norm.substr(i, F.lit(k))))


def shingle_hashes(text: F.Column, k: int = 5) -> F.Column:
    """Distinct xxhash64-hashed k-shingles (array<long>). Hashing before
    de-dup keeps everything fixed-width: set ops on int64 are ~10x cheaper
    than on strings and the Jaccard value is identical modulo 2^-64
    collisions. This is the representation the scale path uses."""
    norm = F.lower(F.regexp_replace(text, r"\s+", " "))
    idx = F.sequence(F.lit(1), F.greatest(F.length(norm) - (k - 1), F.lit(1)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.xxhash64(norm.substr(i, F.lit(k))))
    )


def shingle_table(df: DataFrame, text_col: str = "text", k: int = 5,
                  extra_cols: tuple[str, ...] = ()) -> DataFrame:
    """Materialized (doc_id[, extra], hs: array<long>) hashed-shingle table.

    The ``persist()`` is load-bearing: without a barrier, Catalyst's
    projection collapse re-evaluates the O(len) shingle expression once per
    downstream consumer (e.g. 32x for a 32-hash MinHash signature, or per
    candidate pair in a join) — measured 20-50x slowdowns. With it, shingles
    are computed exactly once per document.

    Low-partition inputs (a table read from one or two parquet files) are
    rebalanced to the cluster's parallelism first: the shingle transform is
    the CPU-heavy step, and inheriting a 2-partition scan serializes it
    (measured 14s -> ~1s at sf0.1 / 32 cores). Inputs already wider than
    the core count keep their partitioning (no shuffle at scale).
    """
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < parallelism:
        df = df.repartition(parallelism)
    return df.select(
        "doc_id", *extra_cols, shingle_hashes(F.col(text_col), k).alias("hs")
    ).persist()


def _jaccard_for_pairs(sh: DataFrame, pairs: DataFrame) -> DataFrame:
    """Exact Jaccard over a prebuilt hashed-shingle table for given
    (doc_a, doc_b) pairs — int64 array intersection, JVM-side."""
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("hs").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("hs").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    return (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                inter
                / F.greatest(F.size("sh_a") + F.size("sh_b") - inter, F.lit(1))
            ).alias("jaccard"),
        )
    )


def ngram_novelty(df: DataFrame, text_col: str = "text", k: int = 5) -> DataFrame:
    """Corpus n-gram novelty — the data-selection signal "how much of
    this document's content exists nowhere else": per document, the
    fraction of its DISTINCT character ``k``-shingles that appear in no
    other document. Boilerplate/templated docs score near 0; genuinely
    new content scores near 1 (the inverse of the duplication signals —
    a selection pipeline keeps high-novelty, drops near-zero).

    Scale shape: one exploded (shingle_hash → doc) projection (int64
    keys), a global document-frequency aggregate on the uniform hash key
    (map-side combined), one join back + a per-doc count — two shuffles
    total, both on uniform keys, no pairs, no collect. The oracle
    replays the same counts over shingle STRINGS (xxhash64 itself is not
    SQL-replayable; collisions perturb counts at 2^-64).

    Returns (doc_id, n_shingles, n_novel, novelty)."""
    sh = df.select(
        "doc_id", F.explode(shingle_hashes(F.col(text_col), k)).alias("h")
    )
    freq = sh.groupBy("h").agg(F.count_distinct("doc_id").alias("_nd"))
    per = (
        sh.join(freq, "h")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(F.when(F.col("_nd") == 1, 1).otherwise(0)).alias("n_novel"),
        )
    )
    return per.select(
        "doc_id",
        "n_shingles",
        "n_novel",
        F.round(F.col("n_novel") / F.col("n_shingles"), 6).alias("novelty"),
    )


def ngram_jaccard(df: DataFrame, pairs: DataFrame, text_col: str = "text", k: int = 5,
                  sh: DataFrame | None = None) -> DataFrame:
    """Exact Jaccard over hashed k-shingle sets for given (doc_a, doc_b)
    pairs. Pass a prebuilt ``sh`` (shingle_table) to share one materialized
    shingle build across pipeline stages; when this function builds its own,
    the result is materialized eagerly so the cache can be released before
    returning (no leaked persists)."""
    if sh is not None:
        return _jaccard_for_pairs(sh, pairs)
    sh = shingle_table(df, text_col, k)
    try:
        return _materialize(_jaccard_for_pairs(sh, pairs))
    finally:
        sh.unpersist()


def _materialize(df: DataFrame) -> DataFrame:
    """Eagerly compute a (small) result so upstream caches can be released;
    the returned DataFrame is rooted at the materialized blocks.

    Caveat (scale): localCheckpoint blocks are NOT replicated — on a
    cluster with executor decommission / dynamic allocation they can be
    lost, and duplicate-heavy corpora can make the "small result"
    assumption fail. The convenience entry points that call this
    (minhash_near_duplicates, jaccard_similarity_join, ...) therefore take
    a prebuilt ``sh`` shingle table: pass one to get the LAZY plan back
    (no eager materialization, caller owns the shingle cache) and sink it
    to durable storage yourself."""
    cached = df.persist()
    out = cached.localCheckpoint(eager=True)
    cached.unpersist(blocking=False)
    return out


def _signatures_from(sh: DataFrame, num_hashes: int) -> DataFrame:
    sig = F.array(
        *[
            F.array_min(F.transform(F.col("hs"), lambda s: F.xxhash64(s, F.lit(i))))
            for i in range(num_hashes)
        ]
    )
    return sh.select("doc_id", sig.alias("sig"))


def minhash_signatures(
    df: DataFrame, text_col: str = "text", num_hashes: int = 32, k: int = 5,
    sh: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, sig: array<long>) MinHash signatures, fully JVM-side:
    sig[i] = min over hashed shingles of xxhash64(h, seed_i). Shingles are
    materialized once (pass ``sh`` to share a build); the num_hashes passes
    run over the cached int64 array."""
    if sh is not None:
        return _signatures_from(sh, num_hashes)
    sh = shingle_table(df, text_col, k)
    try:
        return _materialize(_signatures_from(sh, num_hashes))
    finally:
        sh.unpersist()


def _band_explode(bands: int, rows_per_band: int) -> F.Column:
    """Explode a ``sig`` array column into (band, bucket) rows: bucket =
    xxhash64 of the band's signature slice (shared by the batch LSH join
    and the static band index)."""
    return F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(b).alias("band"),
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            *[
                                F.element_at("sig", b * rows_per_band + r + 1)
                                for r in range(rows_per_band)
                            ],
                        )
                    ).alias("bucket"),
                )
                for b in range(bands)
            ]
        )
    )


def minhash_band_index(
    df: DataFrame, text_col: str = "text", num_hashes: int = 32,
    bands: int = 8, k: int = 5, sh: DataFrame | None = None,
) -> DataFrame:
    """Static LSH band index of a corpus: ``(band, bucket, doc_id, sig)``.

    The persisted/parquet-able face of the banding inside
    :func:`minhash_lsh_candidates` — build it ONCE over the existing
    corpus, then probe it from a different table or a STREAM
    (streaming.streaming_near_dup's stream-static join side). At scale
    write it partitioned/bucketed by (band, bucket) so index probes are
    co-located joins.
    """
    sigs = minhash_signatures(df, text_col, num_hashes, k, sh=sh)
    return sigs.select(
        "doc_id", "sig", _band_explode(bands, num_hashes // bands).alias("bb")
    ).select("bb.band", "bb.bucket", "doc_id", "sig")


def minhash_lsh_candidates(
    sigs: DataFrame, bands: int = 8, rows_per_band: int = 4,
    est_cut: float | None = None, num_hashes: int | None = None,
) -> DataFrame:
    """LSH banding: docs sharing any band hash become candidate pairs.
    One explode + one self-join per-bucket — the web-scale near-dup plan
    (no all-pairs comparison ever materializes).

    With ``est_cut`` set, the signature arrays ride through the band join
    and a matching-component estimate screens pairs INSIDE the join, before
    the distinct — pairs whose estimated Jaccard is below the cut never
    reach the (expensive) exact-verification join, and the screen costs no
    extra shuffle (the alternative — re-joining signatures onto the
    candidate table — shuffles the candidate table twice more)."""
    banded = sigs.select(
        "doc_id", "sig", _band_explode(bands, rows_per_band).alias("bb")
    ).select("doc_id", "sig", "bb.band", "bb.bucket")
    x = banded.alias("x")
    y = banded.alias("y")
    joined = x.join(
        y,
        (F.col("x.band") == F.col("y.band"))
        & (F.col("x.bucket") == F.col("y.bucket"))
        & (F.col("x.doc_id") < F.col("y.doc_id")),
    )
    if est_cut is not None and est_cut > 0.0:
        h = num_hashes if num_hashes is not None else bands * rows_per_band
        match_frac = (
            F.aggregate(
                F.zip_with(
                    F.col("x.sig"), F.col("y.sig"),
                    lambda a, b: F.when(a == b, 1).otherwise(0),
                ),
                F.lit(0),
                lambda acc, v: acc + v,
            )
            / F.lit(float(h))
        )
        joined = joined.filter(match_frac >= est_cut)
    return (
        joined.select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .distinct()
    )


def minhash_near_duplicates(
    df: DataFrame,
    text_col: str = "text",
    threshold: float = 0.7,
    num_hashes: int = 32,
    bands: int = 8,
    k: int = 5,
    sh: DataFrame | None = None,
) -> DataFrame:
    """End-to-end near-dup: MinHash -> LSH candidates -> exact Jaccard filter.

    The shingle table is built ONCE and shared by the signature and
    verification stages (round-1 built it twice — double compute + a leaked
    cache); the (small) verified-pairs result is materialized eagerly so the
    shingle cache is released before returning. Pass a prebuilt ``sh``
    (shingle_table) to instead get the LAZY plan back — nothing is
    materialized or unpersisted, the caller owns the shingle cache and
    sinks the result durably (the right mode on clusters where
    localCheckpoint's non-replicated blocks could be decommissioned).

    Between banding and exact verification sits a signature-estimate
    pre-filter: est(J) = matching-component fraction of the two 32-long
    signatures, computed JVM-side in O(num_hashes) — orders of magnitude
    cheaper than intersecting multi-thousand-element shingle sets. Candidate
    pairs with est < threshold - 2σ (σ = binomial std of the estimator) are
    dropped before the expensive exact join; this trades ≤ ~2% extra recall
    loss at the exact threshold boundary (on top of banding's inherent
    miss rate there) for a 10-100x smaller verify join. Precision is
    unaffected — survivors still pass exact Jaccard."""
    est_cut = max(0.0, threshold - 2.0 * (threshold * (1 - threshold) / num_hashes) ** 0.5)

    def _plan(sh: DataFrame, sigs: DataFrame) -> DataFrame:
        screened = minhash_lsh_candidates(
            sigs, bands, num_hashes // bands, est_cut=est_cut, num_hashes=num_hashes
        )
        return _jaccard_for_pairs(sh, screened).filter(F.col("jaccard") >= threshold)

    if sh is not None:  # lazy mode: caller owns caches and materialization
        return _plan(sh, _signatures_from(sh, num_hashes))
    sh = shingle_table(df, text_col, k)
    try:
        sigs = _signatures_from(sh, num_hashes).persist()
        out = _materialize(_plan(sh, sigs))
        sigs.unpersist()
        return out
    finally:
        sh.unpersist()


def jaccard_similarity_join(
    df: DataFrame,
    text_col: str = "text",
    threshold: float = 0.25,
    k: int = 5,
    extra_cols: tuple[str, ...] = (),
    sh: DataFrame | None = None,
) -> DataFrame:
    """EXACT all-pairs Jaccard join at web scale via prefix filtering
    (AllPairs/PPJoin-style): returns every (doc_a, doc_b, jaccard) with
    jaccard >= threshold — same result set as a cartesian compare, but the
    join is keyed on rare shingles, never all-pairs.

    Plan: order each document's shingles by (global document frequency asc,
    shingle asc); any two docs with J >= t must share a shingle within their
    first |S| - ceil(t*|S|) + 1 shingles under that order (prefix-filter
    lemma), so candidates come from an inverted-index self-join on prefix
    shingles only; exact Jaccard verifies. Candidate generation is
    provably lossless for the threshold, so the output is independent of
    the shingle ordering — any superset of true matches verifies to the
    same set. Worst-case skew is a prefix shingle shared by d docs (d^2
    candidate pairs) — prefix filtering keeps d small by preferring the
    rarest shingles.

    Pass a prebuilt ``sh`` (shingle_table with the same ``extra_cols``) to
    get the LAZY plan back: nothing is persisted or eagerly materialized —
    the caller owns the shingle cache and sinks the result durably (the
    prefix table is then evaluated once per self-join side instead of
    cached; prefer this on clusters where localCheckpoint's non-replicated
    blocks could be decommissioned)."""
    lazy = sh is not None
    if sh is None:
        sh = shingle_table(df, text_col, k, extra_cols=extra_cols)
    try:
        ex = sh.select("doc_id", F.explode("hs").alias("s"))
        freq = ex.groupBy("s").agg(F.count("*").alias("df"))
        w = Window.partitionBy("doc_id").orderBy("df", "s")
        prefix_len = F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz")) + 1
        pref = (
            ex.join(freq, "s")
            .withColumn("rn", F.row_number().over(w))
            .join(sh.select("doc_id", F.size("hs").alias("sz")), "doc_id")
            .filter(F.col("rn") <= prefix_len)
            .select("doc_id", "s")
        )
        if not lazy:
            pref = pref.persist()
        a, b = pref.alias("a"), pref.alias("b")
        cand = (
            a.join(
                b,
                (F.col("a.s") == F.col("b.s"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
            .distinct()
        )
        verified = _jaccard_for_pairs(sh.select("doc_id", "hs"), cand).filter(
            F.col("jaccard") >= threshold
        )
        if extra_cols:
            for c in extra_cols:
                verified = (
                    verified.join(
                        sh.select(F.col("doc_id").alias("doc_a"),
                                  F.col(c).alias(f"{c}_a")),
                        "doc_a",
                    )
                    .join(
                        sh.select(F.col("doc_id").alias("doc_b"),
                                  F.col(c).alias(f"{c}_b")),
                        "doc_b",
                    )
                )
        if lazy:
            return verified
        out = _materialize(verified)
        pref.unpersist()
        return out
    finally:
        if not lazy:
            sh.unpersist()


def simhash(df: DataFrame, text_col: str = "text", bits: int = 64) -> DataFrame:
    """64-bit SimHash over word tokens. Token hashing stays JVM-side
    (deterministic xxhash64 per token via ``transform``); only the bit
    voting/packing is a pandas UDF over the hash arrays (pure NumPy, no
    Python ``hash()`` — that is process-seed dependent and would break
    determinism across executors)."""
    tok_hashes = F.transform(
        F.filter(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda t: t != ""),
        lambda t: F.xxhash64(t),
    )

    @F.pandas_udf(T.LongType())
    def _pack(hashes: pd.Series) -> pd.Series:
        out = np.zeros(len(hashes), dtype=np.int64)
        shifts = np.arange(bits, dtype=np.uint64)
        for i, hs in enumerate(hashes):
            if hs is None or len(hs) == 0:
                continue
            h = np.asarray(hs, dtype=np.int64).view(np.uint64)
            bitcols = ((h[:, None] >> shifts) & np.uint64(1)).astype(np.int64)
            votes = bitcols.sum(0) * 2 - len(h)
            sig = ((votes > 0).astype(np.uint64) << shifts).sum(dtype=np.uint64)
            out[i] = np.array(sig, dtype=np.uint64).view(np.int64).item()
        return pd.Series(out)

    return df.select("doc_id", _pack(tok_hashes).alias("simhash"))


def simhash_near_duplicates(
    df: DataFrame, text_col: str = "text", max_hamming: int = 3,
    num_chunks: int | None = None,
) -> DataFrame:
    """Near-dups by SimHash: band the 64 bits into ``num_chunks`` nearly
    equal chunks, bucket-join docs sharing any exact chunk, verify hamming
    distance.

    Banding completeness is pigeonhole: two hashes within hamming ``h``
    differ in at most h chunks, so with chunks >= h + 1 at least one chunk
    matches exactly — the chunk count is therefore DERIVED from the
    requested bound (min(64, max_hamming + 1)); an explicit ``num_chunks``
    below that raises rather than silently dropping recall (round-2 shipped
    a fixed 4x16 split whose guarantee only held for h <= 3). Tradeoff at
    scale: large h means narrow chunks (64/(h+1) bits), whose buckets are
    coarser and generate more candidates — the verify stage keeps precision
    exact either way; prefer small h or a second SimHash seed when candidate
    volume matters."""
    if num_chunks is None:
        num_chunks = min(64, max_hamming + 1)
    if num_chunks < min(64, max_hamming + 1):
        raise ValueError(
            f"num_chunks={num_chunks} cannot guarantee candidate generation "
            f"for max_hamming={max_hamming}; need >= {min(64, max_hamming + 1)}"
        )
    bounds = [(i * 64) // num_chunks for i in range(num_chunks + 1)]

    def _chunk_val(c: int) -> F.Column:
        start, width = bounds[c], bounds[c + 1] - bounds[c]
        shifted = F.shiftrightunsigned("simhash", start)
        if width >= 64:
            return shifted
        return shifted.bitwiseAND(F.lit((1 << width) - 1))

    sh = simhash(df, text_col)
    chunks = sh.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(c).alias("chunk"), _chunk_val(c).alias("val"))
                    for c in range(num_chunks)
                ]
            )
        ).alias("cc"),
    ).select("doc_id", "simhash", "cc.chunk", "cc.val")
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("ha"),
            F.col("b.simhash").alias("hb"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return cand.select("doc_a", "doc_b", hamming.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )


# ---------------------------------------------------------------------------
# Similarity search (embeddings)
# ---------------------------------------------------------------------------

def _dot(a: F.Column, b: F.Column) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _norm(a: F.Column) -> F.Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_topk_bruteforce(
    vectors: DataFrame, queries: DataFrame, top_k: int = 10
) -> DataFrame:
    """Exact cosine top-k: broadcast the (small) query set against all
    vectors; dot products are JVM-side higher-order functions (no Python).
    (query_id, rank, neighbor_id, score). The baseline the ANN variants are
    judged against."""
    v = vectors.select(
        F.col("vec_id").alias("neighbor_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    q = queries.select(
        F.col("vec_id").alias("query_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("q"),
    )
    scored = F.broadcast(q).crossJoin(v).filter(F.col("query_id") != F.col("neighbor_id"))
    scored = scored.select(
        "query_id",
        "neighbor_id",
        (_dot(F.col("q"), F.col("v")) / (_norm(F.col("q")) * _norm(F.col("v")))).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("query_id", "rank", "neighbor_id", "score")
    )


def hard_negatives(
    vectors: DataFrame,
    queries: DataFrame,
    top_k: int = 5,
    label_col: str = "label",
) -> DataFrame:
    """Hard-negative mining for contrastive training: for each query
    vector, the ``top_k`` HIGHEST-cosine vectors with a DIFFERENT label —
    the near-misses a contrastive loss learns the most from (in-batch
    random negatives are trivially separable; the hard ones live at the
    decision boundary). Returns (query_id, rank, neighbor_id, score).

    Plan shape = :func:`cosine_topk_bruteforce` with the cross-label
    predicate pushed into the scoring join (queries broadcast, JVM dot
    products, per-query window top-k). For corpus-scale query sets swap
    the broadcast crossJoin for :func:`ivf_topk` candidates + this
    filter; the semantics stay the same — this is the exact baseline
    (gate face)."""
    v = vectors.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col(label_col).alias("_nl"),
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    q = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col(label_col).alias("_ql"),
        F.transform("embedding", lambda x: x.cast("double")).alias("q"),
    )
    scored = (
        F.broadcast(q)
        .crossJoin(v)
        .filter(F.col("_ql") != F.col("_nl"))
        .select(
            "query_id", "neighbor_id",
            (_dot(F.col("q"), F.col("v"))
             / (_norm(F.col("q")) * _norm(F.col("v")))).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("query_id", "rank", "neighbor_id", "score")
    )


def lsh_assign_buckets(
    vectors: DataFrame,
    num_planes: int = 8,
    num_tables: int = 4,
    seed: int = 42,
    dim: int | None = None,
    plane_source: str = "gaussian",
) -> DataFrame:
    """Random-hyperplane LSH, multi-table: each vector gets ``num_tables``
    sign-bucket ids (one per independent set of ``num_planes`` hyperplanes).
    Output: one row per (vec_id, table, bucket). Vectorized pandas UDF —
    one matmul per Arrow batch.

    ``plane_source``: 'gaussian' (seeded NumPy standard normals — the
    default production hyperplanes) or 'sha' — ±1 signs from the parity
    of ``sha256('lsh{seed}:{i}:{j}')``, the :func:`random_projection`
    deterministic-hash contract. Sign planes are an equally valid
    hyperplane family (Achlioptas 2003) with one extra property: a SQL
    oracle can replay them bit-for-bit, which upgrades the LSH ANN path
    from rows-only to fully value-gated (see lsh_recall_gate)."""
    if dim is None:
        dim = len(vectors.select("embedding").first()[0])
    if plane_source == "sha":
        import hashlib

        def _sgn(i: int, j: int) -> float:
            h = hashlib.sha256(f"lsh{seed}:{i}:{j}".encode()).hexdigest()
            return 1.0 if int(h[:15], 16) % 2 == 0 else -1.0

        planes = np.array(
            [[_sgn(i, j) for j in range(num_planes * num_tables)]
             for i in range(dim)],
            dtype=np.float64,
        )
    elif plane_source == "gaussian":
        rng = np.random.default_rng(seed)
        planes = rng.standard_normal((dim, num_planes * num_tables))
    else:
        raise ValueError(
            f"lsh_assign_buckets: unknown plane_source={plane_source!r}"
        )
    weights = 1 << np.arange(num_planes)

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def buckets(emb: pd.Series) -> pd.Series:
        m = np.stack(emb.to_numpy()).astype(np.float64)
        signs = (m @ planes) > 0  # (batch, planes*tables)
        signs = signs.reshape(len(m), num_tables, num_planes)
        vals = (signs * weights).sum(2).astype(np.int32)
        return pd.Series(list(vals))

    return (
        vectors.withColumn("_b", buckets(F.col("embedding")))
        .select("*", F.posexplode("_b").alias("table", "bucket"))
        .drop("_b")
    )


def random_projection(
    vectors: DataFrame,
    out_dim: int = 16,
    in_dim: int | None = None,
    salt: str = "rp",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Johnson–Lindenstrauss sign random projection — compress embeddings
    to ``out_dim`` dims with pairwise distances preserved in expectation
    (Achlioptas 2003's ±1 database-friendly projection):

        p_j = (1/√out_dim) · Σ_i v_i · sign(i, j)

    with ``sign(i, j) = ±1`` from the parity of
    ``sha256(salt ':' i ':' j)`` — the repo's deterministic-hash contract,
    so unlike the seeded-RNG LSH hyperplanes this projection is replayable
    bit-for-bit by the SQL oracle (and identical on any executor count).
    The cheap front-end for dedup/ANN at 100 TB: project once, bucket or
    scan in the small space, verify survivors in the original space.

    Returns ``(id_col, p0..p{out_dim-1})``. Scale shape: the sign matrix
    folds into the plan as in_dim×out_dim LITERALS (a few KB — never a
    join side), each output dim one zip_with/aggregate fold — a map-only
    pass, zero shuffle, whole-stage codegen. ``in_dim`` is read from one
    row when not given (setup-time only).
    """
    import hashlib
    import math

    if in_dim is None:
        row = vectors.select(vec_col).first()
        if row is None:
            raise ValueError("random_projection on an empty DataFrame needs in_dim")
        in_dim = len(row[0])

    def _sign(i: int, j: int) -> float:
        h = hashlib.sha256(f"{salt}:{i}:{j}".encode()).hexdigest()
        return 1.0 if int(h[:15], 16) % 2 == 0 else -1.0

    scale = 1.0 / math.sqrt(float(out_dim))
    cols = []
    for j in range(out_dim):
        signs = F.array(*[F.lit(_sign(i, j)) for i in range(in_dim)])
        dot = F.aggregate(
            F.zip_with(F.col(vec_col), signs, lambda a, b: a.cast("double") * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        cols.append((dot * scale).alias(f"p{j}"))
    return vectors.select(id_col, *cols)


def cosine_topk_lsh(
    vectors: DataFrame,
    queries: DataFrame,
    top_k: int = 10,
    num_planes: int = 8,
    num_tables: int = 4,
    seed: int = 42,
    broadcast_queries: bool = True,
    plane_source: str = "gaussian",
) -> DataFrame:
    """Approximate top-k: candidates restricted to vectors sharing any LSH
    table bucket with the query (bucket joins instead of crossJoin) — the
    100 TB-scale path. Multi-table union keeps recall high; recall is
    tested against the brute-force baseline in tests.
    ``plane_source='sha'`` swaps in the oracle-replayable sign planes
    (see :func:`lsh_assign_buckets`).

    ``broadcast_queries=True`` fits the search-service shape (small query
    set vs big corpus). When the query set IS the corpus (self-kNN, e.g.
    :func:`knn_graph`), pass False: the bucket join and the scoring join
    run as plain shuffle joins on uniform (table, bucket) / id keys
    instead of shipping the whole corpus to every executor."""
    maybe_bc = F.broadcast if broadcast_queries else (lambda df: df)
    vb = lsh_assign_buckets(vectors, num_planes, num_tables, seed,
                            plane_source=plane_source)
    qb = lsh_assign_buckets(queries, num_planes, num_tables, seed,
                            plane_source=plane_source)
    v = vb.select(
        "table", "bucket", F.col("vec_id").alias("neighbor_id"), "embedding"
    )
    q = qb.select("table", "bucket", F.col("vec_id").alias("query_id"),
                  F.col("embedding").alias("q_emb"))
    cand = (
        maybe_bc(q.drop("q_emb"))
        .join(v.select("table", "bucket", "neighbor_id"), ["table", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    ve = vectors.select(
        F.col("vec_id").alias("neighbor_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    qe = queries.select(
        F.col("vec_id").alias("query_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("q"),
    )
    scored = (
        cand.join(maybe_bc(qe), "query_id")
        .join(ve, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            (_dot(F.col("q"), F.col("v")) / (_norm(F.col("q")) * _norm(F.col("v")))).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("query_id", "rank", "neighbor_id", "score")
    )


def embedding_near_duplicates(
    vectors: DataFrame,
    threshold: float = 0.9,
    num_planes: int = 12,
    num_tables: int = 6,
    seed: int = 42,
    plane_source: str = "gaussian",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: random-hyperplane LSH buckets
    generate candidates (self-join within (table, bucket) — never
    all-pairs), exact cosine verifies. Output (vec_id_a, vec_id_b, cosine)
    with cosine >= threshold; precision is exact by construction, recall is
    the multi-table LSH recall (tested against brute force). For hamming
    distance h between sign-sketches, P(same bucket) = (1-h/pi)^planes per
    table; more tables raise recall, more planes cut candidates.
    ``plane_source='sha'`` swaps in the oracle-replayable sign planes
    (:func:`lsh_assign_buckets`) — the whole pipeline (buckets,
    candidate self-join, cosine verify, threshold) then sits under a
    full SQL value gate (emb_neardup_sha)."""
    vb = lsh_assign_buckets(vectors, num_planes, num_tables, seed,
                            plane_source=plane_source)
    a = vb.select("table", "bucket", F.col("vec_id").alias("vec_id_a"))
    b = vb.select("table", "bucket", F.col("vec_id").alias("vec_id_b"))
    cand = (
        a.join(b, ["table", "bucket"])
        .filter(F.col("vec_id_a") < F.col("vec_id_b"))
        .select("vec_id_a", "vec_id_b")
        .distinct()
    )
    ve = vectors.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    scored = (
        cand.join(ve.select(F.col("vec_id").alias("vec_id_a"),
                            F.col("v").alias("va")), "vec_id_a")
        .join(ve.select(F.col("vec_id").alias("vec_id_b"),
                        F.col("v").alias("vb")), "vec_id_b")
        .select(
            "vec_id_a",
            "vec_id_b",
            (_dot(F.col("va"), F.col("vb"))
             / (_norm(F.col("va")) * _norm(F.col("vb")))).alias("cosine"),
        )
    )
    return scored.filter(F.col("cosine") >= threshold)


def semdedup(
    vectors: DataFrame,
    n_clusters: int = 16,
    threshold: float = 0.95,
    seed: int = 42,
    partitioner: str = "kmeans",
) -> DataFrame:
    """SemDeDup (Abbas et al., arXiv:2303.09540): semantic deduplication —
    k-means-cluster the embedding space, then WITHIN each cluster drop
    every vector that has an earlier (lower vec_id) cluster-mate with
    cosine ≥ threshold. Deterministic keep contract:

        keep(v)   ⇔  ∄ u < v in cluster(v) with cosine(u, v) ≥ threshold
        dup_of(v) =  min such u;  max_cosine(v) = max cosine over such u

    Returns (vec_id, centroid_id, keep, dup_of, max_cosine); dup_of /
    max_cosine are NULL for kept rows. Cosines on dropped rows are EXACT
    (computed on the candidate pairs, not estimated), so precision is
    exact by construction; cross-cluster near-dups are the documented
    approximation (recall-tested against the exact face in pytest).

    ``n_clusters=1`` bypasses the k-means fit (a single centroid is
    degenerate; Spark ML KMeans requires k > 1) and runs the identical
    downstream pair/keep plan over ALL pairs — the exact, fully
    SQL-expressible face that gates the whole dedup logic under the
    DuckDB oracle, mirroring ivf_topk's nprobe = n_centroids trick; the
    k-means assignment itself is gated by ann_ivf_top5.

    ``partitioner``: 'kmeans' (pyspark.ml k-means|| — the production
    quantizer) or 'sha' — the space partition is the single-table
    sha-sign hyperplane bucketing of :func:`lsh_assign_buckets`
    (``plane_source='sha'``, ceil(log2(n_clusters)) planes), a valid
    coarse quantizer in its own right (random-hyperplane space
    partitioning, Charikar 2002) whose assignment a SQL oracle replays
    bit-for-bit. That upgrades the CLUSTERED semdedup face — partition →
    within-partition candidate pairs → keep contract — from rows-only to
    fully value-gated (semdedup_sha); only the k-means fit itself stays
    outside the oracle, and that is gated separately (ann_ivf_top5 +
    semdedup_containment).

    Scale: candidate work is Σ_c |c|² — pick n_clusters ≈ N / target
    cluster width so per-cluster self-joins (shuffle on centroid_id)
    stay bounded; at 100 TB, recurse or sub-sample oversized clusters.
    The k-means fit is pyspark.ml (k-means||, distributed).
    """
    if n_clusters == 1:
        assigned = vectors.withColumn("centroid_id", F.lit(0))
    elif partitioner == "sha":
        nb = max(1, (n_clusters - 1).bit_length())
        assigned = (
            lsh_assign_buckets(
                vectors, num_planes=nb, num_tables=1, seed=seed,
                plane_source="sha",
            )
            .withColumn("centroid_id", F.col("bucket"))
            .drop("table", "bucket")
        )
    elif partitioner == "kmeans":
        assigned, _ = ivf_index(vectors, n_centroids=n_clusters, seed=seed)
    else:
        raise ValueError(f"semdedup: unknown partitioner={partitioner!r}")
    ve = assigned.select(
        "vec_id", "centroid_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    a = ve.select(
        "centroid_id", F.col("vec_id").alias("vec_id_a"), F.col("v").alias("va")
    )
    b = ve.select(
        "centroid_id", F.col("vec_id").alias("vec_id_b"), F.col("v").alias("vb")
    )
    dropped = (
        a.join(b, "centroid_id")
        .filter(F.col("vec_id_a") < F.col("vec_id_b"))
        .select(
            "vec_id_a", "vec_id_b",
            (_dot(F.col("va"), F.col("vb"))
             / (_norm(F.col("va")) * _norm(F.col("vb")))).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
        .groupBy(F.col("vec_id_b").alias("vec_id"))
        .agg(F.min("vec_id_a").alias("dup_of"), F.max("cosine").alias("max_cosine"))
    )
    return (
        assigned.select("vec_id", "centroid_id")
        .join(dropped, "vec_id", "left")
        .select(
            "vec_id", "centroid_id",
            F.col("dup_of").isNull().alias("keep"),
            "dup_of", "max_cosine",
        )
    )


def ivf_index(
    vectors: DataFrame, n_centroids: int = 16, seed: int = 42
) -> tuple[DataFrame, np.ndarray]:
    """IVF coarse quantizer: distributed k-means (pyspark.ml KMeans — the
    scale path; k-means|| init, deterministic under a fixed seed) clusters
    the embeddings; every vector is assigned to its nearest centroid.
    Returns (assigned = vectors + centroid_id, centroids ndarray [k, dim]).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = vectors.withColumn("_feat", array_to_vector(
        F.transform("embedding", lambda x: x.cast("double"))
    ))
    model = KMeans(k=n_centroids, seed=seed, featuresCol="_feat").fit(feat)
    centroids = np.stack([np.asarray(c, dtype=np.float64) for c in model.clusterCenters()])
    assigned = (
        model.transform(feat)
        .withColumnRenamed("prediction", "centroid_id")
        .drop("_feat")
    )
    return assigned, centroids


def kmeans_assign_violations(
    vectors: DataFrame, n_centroids: int = 8, seed: int = 42
) -> DataFrame:
    """Assignment-optimality check of the IVF coarse quantizer: re-derives
    each vector's argmin-distance centroid in one Arrow-batched NumPy
    kernel (independent of pyspark.ml's transform) and returns the rows
    whose assignment disagrees — EMPTY when the fit is consistent. The
    engine-side gate for everything built on ivf_index/semdedup."""
    assigned, cents = ivf_index(vectors, n_centroids=n_centroids, seed=seed)

    @F.pandas_udf(T.IntegerType())
    def argmin_c(e: pd.Series) -> pd.Series:
        m = np.stack(e.to_numpy()).astype(np.float64)
        d = ((m[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
        return pd.Series(np.argmin(d, axis=1).astype(np.int32))

    return (
        assigned.withColumn("_best", argmin_c(F.col("embedding")))
        .filter(F.col("_best") != F.col("centroid_id"))
        .select("vec_id", "centroid_id", F.col("_best").alias("best"))
    )


def ivf_topk(
    assigned: DataFrame,
    centroids: np.ndarray,
    queries: DataFrame,
    top_k: int = 10,
    nprobe: int = 4,
    broadcast_queries: bool = True,
) -> DataFrame:
    """IVF search: each query probes its ``nprobe`` nearest centroids (by
    cosine, computed in one NumPy matmul per Arrow batch) and scores only
    vectors assigned to those centroids — candidate work is
    ~nprobe/n_centroids of brute force, the inverted-file ANN layout.
    Output (query_id, rank, neighbor_id, score).

    ``broadcast_queries=False`` for self-kNN (query set == corpus): the
    probe join becomes a shuffle join on centroid_id instead of shipping
    every query row to every executor."""
    cn = centroids / np.maximum(
        np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12
    )

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def probe(emb: pd.Series) -> pd.Series:
        m = np.stack(emb.to_numpy()).astype(np.float64)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        sims = m @ cn.T  # (batch, k)
        order = np.argsort(-sims, axis=1)[:, :nprobe].astype(np.int32)
        return pd.Series(list(order))

    q = queries.select(
        F.col("vec_id").alias("query_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("q"),
        F.explode(probe(F.col("embedding"))).alias("centroid_id"),
    )
    v = assigned.select(
        "centroid_id",
        F.col("vec_id").alias("neighbor_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    scored = (
        (F.broadcast(q) if broadcast_queries else q)
        .join(v, "centroid_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (_dot(F.col("q"), F.col("v"))
             / (_norm(F.col("q")) * _norm(F.col("v")))).alias("score"),
        )
        .groupBy("query_id", "neighbor_id")
        .agg(F.max("score").alias("score"))  # dedup multi-probe hits
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("query_id", "rank", "neighbor_id", "score")
    )


def winnow_fingerprints(
    df: DataFrame, text_col: str = "text", k: int = 8, window: int = 4
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken): hash
    every k-gram (rolling over the normalized text), then keep the minimum
    hash of each ``window`` consecutive k-grams — the classic local
    fingerprinting guarantee (any shared substring of length >= k+window-1
    yields a shared fingerprint). Gram hashing is a JVM column expression;
    the sliding-window min is an Arrow-batched NumPy kernel — expressing it
    as nested transform(slice(grams, i, w)) re-evaluates the WHOLE inner
    gram array per outer element (Catalyst does not CSE an array-valued
    subexpression into a lambda), which is O(len^2) and measured as a hang
    at 500 docs. Output: (doc_id, fps array<long>, n_fps)."""
    norm = F.lower(F.regexp_replace(F.col(text_col), r"\s+", " "))
    n_grams = F.greatest(F.length(norm) - (k - 1), F.lit(1))
    grams = F.transform(
        F.sequence(F.lit(1), n_grams), lambda i: F.xxhash64(norm.substr(i, F.lit(k)))
    )

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _winnow(gr: pd.Series) -> pd.Series:
        out = []
        for g in gr:
            a = np.asarray(g, dtype=np.int64)
            if len(a) <= window:
                mins = np.array([a.min()], dtype=np.int64)
            else:
                mins = np.lib.stride_tricks.sliding_window_view(a, window).min(axis=1)
            out.append(np.unique(mins))
        return pd.Series(out)

    parallelism = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < parallelism:
        df = df.repartition(parallelism)
    return df.select("doc_id", _winnow(grams).alias("fps")).select(
        "doc_id", "fps", F.size("fps").cast("long").alias("n_fps")
    )


# ---------------------------------------------------------------------------
# Multimodal plumbing (decode stubbed — libs not in container)
# ---------------------------------------------------------------------------

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
    ]
)


def extract_media_features(media: DataFrame, feature_dim: int = 8, real_decode: bool = False) -> DataFrame:
    """Spark-side plumbing for binary media columns: Arrow-batched
    mapInPandas over (media_id, kind, payload).

    ``real_decode=False`` (default): a deterministic fake decode
    (byte-histogram features) — the partitioning, batching and schema are
    production-shaped regardless of the codec.

    ``real_decode=True``: per-kind decoders resolved at RUNTIME on the
    executors — images via Pillow (grayscale pixel histogram), audio via
    the stdlib ``wave`` reader (normalized |amplitude| histogram of 16-bit
    PCM), video via PyAV (up to 8 sampled frames, grayscale pixel
    histogram averaged across frames). A kind whose decoder library is
    absent raises NotImplementedError naming the missing dependency.
    Decoders import once per Arrow batch, never per row."""

    def _fake(payload: bytes) -> np.ndarray:
        arr = np.frombuffer(payload, dtype=np.uint8)
        if len(arr) == 0:
            return np.zeros(feature_dim, dtype=np.float32)
        hist, _ = np.histogram(arr, bins=feature_dim, range=(0, 256))
        return (hist / max(len(arr), 1)).astype(np.float32)

    def _real(payload: bytes, kind: str, pil_image, av_mod) -> np.ndarray:
        import io

        if kind == "image":
            if pil_image is None:
                raise NotImplementedError(
                    "real image decoding requires Pillow (pip install pillow)"
                )
            px = np.asarray(pil_image.open(io.BytesIO(payload)).convert("L"))
            hist, _ = np.histogram(px, bins=feature_dim, range=(0, 256))
            return (hist / max(px.size, 1)).astype(np.float32)
        if kind == "audio":
            import wave

            with wave.open(io.BytesIO(payload), "rb") as wf:
                raw = wf.readframes(wf.getnframes())
            samples = np.abs(np.frombuffer(raw, dtype=np.int16).astype(np.float64))
            if len(samples) == 0:
                return np.zeros(feature_dim, dtype=np.float32)
            hist, _ = np.histogram(samples, bins=feature_dim, range=(0, 32768))
            return (hist / len(samples)).astype(np.float32)
        if kind == "video":
            if av_mod is None:
                raise NotImplementedError(
                    "real video decoding requires PyAV (pip install av)"
                )
            acc = np.zeros(feature_dim, dtype=np.float64)
            n_frames = 0
            with av_mod.open(io.BytesIO(payload)) as container:
                for frame in container.decode(video=0):
                    px = frame.to_ndarray(format="gray")
                    hist, _ = np.histogram(px, bins=feature_dim, range=(0, 256))
                    acc += hist / max(px.size, 1)
                    n_frames += 1
                    if n_frames >= 8:  # frame-sample cap
                        break
            if n_frames == 0:
                return np.zeros(feature_dim, dtype=np.float32)
            return (acc / n_frames).astype(np.float32)
        raise NotImplementedError(
            f"real decoding of kind={kind!r}: no decoder registered"
        )

    def run(batches):
        pil_image = None
        av_mod = None
        if real_decode:
            try:
                from PIL import Image as pil_image  # noqa: N813
            except ImportError:
                pil_image = None
            try:
                import av as av_mod  # noqa: N813
            except ImportError:
                av_mod = None
        for pdf in batches:
            if real_decode:
                feats = [
                    _real(p, k, pil_image, av_mod)
                    for p, k in zip(pdf["payload"], pdf["kind"])
                ]
            else:
                feats = [_fake(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# Lexical relevance: BM25 ranking and tf-idf keyword extraction
# ---------------------------------------------------------------------------

_WORD_SPLIT = "[^a-z0-9]+"


def _terms(df: DataFrame, text_col: str) -> DataFrame:
    """(doc_id, term) rows — lowercase alphanumeric word tokenization,
    identical on the DuckDB oracle side (string_split_regex)."""
    return (
        df.select(
            "doc_id",
            F.explode(F.split(F.lower(F.col(text_col)), _WORD_SPLIT)).alias("term"),
        )
        .where(F.col("term") != "")
    )


def bm25_rank(
    df: DataFrame,
    query: str,
    k1: float = 1.2,
    b: float = 0.75,
    topk: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """Top-``topk`` documents for ``query`` by Okapi BM25:

        score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))
        idf(t)   = ln(1 + (N − df_t + 0.5)/(df_t + 0.5))

    Output (doc_id, bm25) with bm25 rounded to 6 decimals; deterministic
    (bm25 desc, doc_id) order.

    Scale: ONE shuffle total. Per-document term frequencies for the q
    query terms are conditional aggregates in a single ``groupBy(doc_id)``
    pass over the exploded tokens (no (doc, term) key space, no join),
    which also yields dl; the corpus constants (N, avgdl, per-term df)
    reduce from that table in a second tiny agg — a scalar driver fetch at
    setup, never per-row. Works for query lengths up to a few hundred
    terms (one aggregate column each); document search over a 100 TB
    corpus shuffles only doc_id-keyed partial aggregates.
    """
    import re as _re

    terms = sorted({t for t in _re.split(_WORD_SPLIT, query.lower()) if t})
    if not terms:
        raise ValueError("query has no alphanumeric terms")
    tok = _terms(df, text_col)
    per_doc = tok.groupBy("doc_id").agg(
        F.count("*").alias("dl"),
        *[
            F.sum(F.when(F.col("term") == t, 1).otherwise(0)).alias(f"tf_{i}")
            for i, t in enumerate(terms)
        ],
    )
    stats = per_doc.agg(
        F.count("*").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(terms))
        ],
    ).first()
    n_docs, avgdl = stats.n_docs, stats.avgdl
    score = F.lit(0.0)
    for i in range(len(terms)):
        dfi = stats[f"df_{i}"]
        idf = float(np.log1p((n_docs - dfi + 0.5) / (dfi + 0.5)))
        tf = F.col(f"tf_{i}").cast("double")
        score = score + F.lit(idf) * tf * (k1 + 1) / (
            tf + k1 * (1 - b + b * F.col("dl") / F.lit(avgdl))
        )
    return (
        per_doc.select("doc_id", F.round(score, 6).alias("bm25"))
        .where(F.col("bm25") > 0)
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(topk)
    )


def tfidf_top_terms(
    df: DataFrame, per_doc_k: int = 3, text_col: str = "text"
) -> DataFrame:
    """Per-document keyword extraction: the ``per_doc_k`` highest-tf-idf
    terms of each document, smooth-idf (sklearn convention):

        tfidf = tf · (ln((N + 1)/(df_t + 1)) + 1)

    Output (doc_id, term, tf, tfidf, rank), tfidf rounded to 6 decimals,
    ties broken by term ascending.

    Scale: tf is one (doc_id, term) aggregation (partial map-side combine
    absorbs within-doc repeats); document frequency is one more agg over
    that table keyed by term alone — the Zipf head (stop words) is a
    SUM-shaped agg, not a join fan-out — then a broadcast-sized? no: a
    shuffle join back on term where AQE's skew split handles the head; the
    per-doc top-k is a window over doc_id partitions (uniform).
    """
    tok = _terms(df, text_col)
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dft = tf.groupBy("term").agg(F.count("*").alias("df_t"))
    n_docs = df.count()
    scored = tf.join(dft, "term").select(
        "doc_id",
        "term",
        "tf",
        F.round(
            F.col("tf")
            * (F.log((F.lit(float(n_docs + 1))) / (F.col("df_t") + 1)) + 1),
            6,
        ).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= per_doc_k)
        .select("doc_id", "term", F.col("tf").cast("long").alias("tf"), "tfidf",
                F.col("rank").cast("int").alias("rank"))
    )


# ---------------------------------------------------------------------------
# HTML boilerplate extraction (crawl -> text, the step before every other
# operator in this module when the corpus is a web crawl)

# fixed entity set, unescaped in THIS order (&amp; last, or already-unescaped
# ampersands would double-expand); each entity is regex-safe as a literal
_HTML_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&copy;", "©"),
    ("&amp;", "&"),
]


def html_extract(df: DataFrame, html_col: str = "html") -> DataFrame:
    """Deterministic regex HTML-to-text: drop <script>/<style> blocks and
    comments, turn block-level tags into breaks, strip remaining tags,
    unescape the fixed entity set, collapse whitespace. Map-only column
    expressions — one whole-stage-codegen span, zero shuffles, so a 100 TB
    crawl cleans at scan throughput.

    Every pattern is RE2-compatible (NO backreferences — script and style
    need separate patterns) so the DuckDB oracle replays the identical
    chain; the operator is value-gated end to end rather than spot-tested.
    A real crawl pipeline would swap in trafilatura-grade extraction per
    partition; this is the declarative, oracle-checkable core (tag/entity
    semantics), not a DOM parser.

    Returns the input columns minus ``html_col`` plus ``clean_text``.
    """
    c = F.col(html_col)
    c = F.regexp_replace(c, r"(?is)<script\b[^>]*>.*?</script\s*>", " ")
    c = F.regexp_replace(c, r"(?is)<style\b[^>]*>.*?</style\s*>", " ")
    c = F.regexp_replace(c, r"(?s)<!--.*?-->", " ")
    c = F.regexp_replace(
        c, r"(?i)</?(br|p|div|h[1-6]|li|tr|td|th|table|ul|ol|blockquote)\b[^>]*>",
        "\n",
    )
    c = F.regexp_replace(c, r"<[^>]*>", " ")
    for ent, ch in _HTML_ENTITIES:
        c = F.regexp_replace(c, ent, ch)
    c = F.trim(F.regexp_replace(c, r"\s+", " "))
    keep = [col for col in df.columns if col != html_col]
    return df.select(*keep, c.alias("clean_text"))


def html_extract_sql(html_expr: str) -> str:
    """The DuckDB expression replaying :func:`html_extract` on
    ``html_expr`` — kept NEXT TO the Spark chain so the two stay in
    lockstep."""
    c = html_expr
    c = rf"regexp_replace({c}, '(?is)<script\b[^>]*>.*?</script\s*>', ' ', 'g')"
    c = rf"regexp_replace({c}, '(?is)<style\b[^>]*>.*?</style\s*>', ' ', 'g')"
    c = rf"regexp_replace({c}, '(?s)<!--.*?-->', ' ', 'g')"
    c = (
        rf"regexp_replace({c}, '(?i)</?(br|p|div|h[1-6]|li|tr|td|th|table"
        rf"|ul|ol|blockquote)\b[^>]*>', chr(10), 'g')"
    )
    c = rf"regexp_replace({c}, '<[^>]*>', ' ', 'g')"
    for ent, ch in _HTML_ENTITIES:
        lit = ch.replace("'", "''")
        c = f"regexp_replace({c}, '{ent}', '{lit}', 'g')"
    return rf"trim(regexp_replace({c}, '\s+', ' ', 'g'))"


def knn_graph(
    vectors: DataFrame,
    k: int = 10,
    mutual: bool = True,
    candidates: str = "exact",
    **cand_kw,
) -> DataFrame:
    """k-NN cosine similarity graph over ALL vectors — the
    similarity-graph construction step of clustering / UMAP / label-prop
    pipelines: directed edges from every vector to its top-``k`` cosine
    neighbors, optionally reduced to the MUTUAL graph ((a, b) kept, a < b,
    only when each end ranks the other inside its own top-k — the
    standard noise-robust reduction; hubs that everyone points at but
    that point back at almost no one lose their spurious edges).

    ``candidates`` selects the neighbor-generation strategy — all three
    share the (query_id, rank, neighbor_id) shape, so the mutual
    reduction and everything downstream are identical:

    * ``"exact"`` — O(n²) dot products (:func:`cosine_topk_bruteforce`);
      the oracle face, and fine up to ~10^5 vectors.
    * ``"lsh"`` — random-hyperplane bucket self-join
      (:func:`cosine_topk_lsh` with shuffle joins, no query broadcast);
      ``cand_kw``: num_planes, num_tables, seed. The 100 TB path.
    * ``"ivf"`` — k-means inverted lists (:func:`ivf_index` +
      :func:`ivf_topk`, shuffle probe join); ``cand_kw``: n_centroids,
      nprobe, seed. The 100 TB path when a trained quantizer is wanted.

    Approximate faces are recall-gated against the exact face in pytest.
    Returns (a long, b long) when ``mutual`` else
    (query_id, neighbor_id, rank)."""
    if candidates == "exact":
        nn = cosine_topk_bruteforce(vectors, vectors, k)
    elif candidates == "lsh":
        nn = cosine_topk_lsh(
            vectors, vectors, top_k=k, broadcast_queries=False, **cand_kw
        )
    elif candidates == "ivf":
        assigned, cents = ivf_index(
            vectors,
            n_centroids=cand_kw.pop("n_centroids", 16),
            seed=cand_kw.pop("seed", 42),
        )
        nn = ivf_topk(
            assigned, cents, vectors, top_k=k,
            broadcast_queries=False, **cand_kw,
        )
    else:
        raise ValueError(
            f"knn_graph: unknown candidates={candidates!r} "
            "(expected 'exact', 'lsh', or 'ivf')"
        )
    if not mutual:
        return nn.select("query_id", "neighbor_id", "rank")
    d = nn.select(F.col("query_id").alias("a"), F.col("neighbor_id").alias("b"))
    rev = d.select(F.col("b").alias("a"), F.col("a").alias("b"))
    return d.join(rev, ["a", "b"]).filter(F.col("a") < F.col("b"))


def semantic_communities(
    vectors: DataFrame,
    k: int = 10,
    max_iter: int = 50,
    candidates: str = "exact",
    **cand_kw,
) -> DataFrame:
    """Semantic clustering as GRAPH community detection — the composition
    this engine exists for: the mutual k-NN cosine graph
    (:func:`knn_graph`) feeds the repo's own GIM-V HashMin connected
    components, so document embeddings cluster through the exact same
    skew-aware iterative machinery as the link graph. Vectors with no
    mutual neighbor are singleton clusters (cluster = own id). Returns
    (vec_id, cluster) with cluster = min vec_id of the component.

    ``candidates`` / ``cand_kw`` pass through to :func:`knn_graph`:
    'exact' is the oracle face; 'lsh' / 'ivf' are the corpus-scale
    candidate generators (a parameter, not a code edit)."""
    from flexgraph_spark import algorithms

    g = knn_graph(vectors, k=k, mutual=True, candidates=candidates, **cand_kw)
    res = algorithms.connected_components(
        g.select(F.col("a").alias("src"), F.col("b").alias("dst")),
        max_iter=max_iter,
    )
    labels = res.state.select(
        F.col("vertex").alias("vec_id"),
        F.col("value").cast("long").alias("cluster"),
    )
    return (
        vectors.select("vec_id")
        .join(labels, "vec_id", "left")
        .select(
            "vec_id",
            F.coalesce("cluster", F.col("vec_id")).cast("long").alias("cluster"),
        )
    )


def group_overlap(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    min_jaccard: float = 0.5,
    max_sha_freq: int | None = 1000,
) -> DataFrame:
    """Fork/mirror detection across document collections (repos, crawls,
    dumps): which pairs of groups share a large fraction of identical
    documents?

    Each group is fingerprinted as its set of distinct content sha256s;
    pairs are scored with Jaccard = |shared| / |union| and containment =
    |shared| / min(|A|, |B|) and kept when Jaccard >= ``min_jaccard``.
    Returns (group_a, group_b, shared, n_a, n_b, jaccard, containment)
    with group_a < group_b.

    Scale shape — inverted index on the sha, never group-pairs:
      * one distinct (group, sha) projection (uniform 256-bit shuffle keys);
      * shas occurring in more than ``max_sha_freq`` groups are dropped
        BEFORE pairing (ubiquitous boilerplate — the CCNet top-paragraph
        move), which bounds per-sha pair fanout at max_sha_freq^2 and makes
        the candidate volume sum-of-squares over rare shas, not |G|^2;
        sizes are computed on the same capped universe so the scores are
        the exact Jaccard/containment of the rare-sha fingerprint sets;
      * pair counting is a self-join keyed on the sha followed by a
        (group_a, group_b) count — both shuffles on uniform keys.
    At 10^8 repos x 10^4 files this is the standard fork-graph plan; the
    all-pairs alternative is infeasible and never constructed.
    """
    s = df.select(
        F.col(group_col).cast("string").alias("g"),
        F.sha2(F.col(text_col), 256).alias("h"),
    ).distinct()
    if max_sha_freq is not None:
        rare = (
            s.groupBy("h")
            .agg(F.count("*").alias("_f"))
            .filter(F.col("_f") <= max_sha_freq)
            .select("h")
        )
        s = s.join(rare, "h")
    s = s.persist()
    sizes = s.groupBy("g").agg(F.count("*").alias("n"))
    a = s.select(F.col("g").alias("group_a"), "h")
    b = s.select(F.col("g").alias("group_b"), "h")
    pairs = (
        a.join(b, "h")
        .filter(F.col("group_a") < F.col("group_b"))
        .groupBy("group_a", "group_b")
        .agg(F.count("*").alias("shared"))
    )
    out = (
        pairs.join(sizes.withColumnRenamed("g", "group_a")
                   .withColumnRenamed("n", "n_a"), "group_a")
        .join(sizes.withColumnRenamed("g", "group_b")
              .withColumnRenamed("n", "n_b"), "group_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("shared")
                / (F.col("n_a") + F.col("n_b") - F.col("shared")), 6
            ),
        )
        .withColumn(
            "containment",
            F.round(F.col("shared") / F.least("n_a", "n_b"), 6),
        )
        .filter(F.col("jaccard") >= min_jaccard)
        .select("group_a", "group_b", "shared", "n_a", "n_b",
                "jaccard", "containment")
    )
    return out


def quantize_int8(
    vectors: DataFrame, embedding_col: str = "embedding"
) -> tuple[DataFrame, float]:
    """Symmetric int8 scalar quantization of an embedding column — the
    4x memory/shuffle reduction that makes a 100 TB vector scan fit the
    cluster (float32 64-dim -> 64 bytes/vector).

    One pass computes the global scale m = max |x| over the dataset; each
    component maps to clamp(floor(x * 127 / m + 0.5), -127, 127) — floor
    (+0.5) instead of round() so a SQL oracle replays the quantization
    bit-for-bit (no round-half-to-even ambiguity across engines). Returns
    (vectors + qvec array<long>, m). All column expressions, no Python.
    """
    m = vectors.agg(
        F.max(
            F.array_max(F.transform(embedding_col, lambda x: F.abs(x.cast("double"))))
        )
    ).collect()[0][0]
    m = float(m) if m else 1.0
    qc = F.transform(
        embedding_col,
        lambda x: F.greatest(
            F.lit(-127.0),
            F.least(F.lit(127.0), F.floor(x.cast("double") * 127.0 / m + 0.5)),
        ).cast("long"),
    )
    return vectors.withColumn("qvec", qc), m


def ann_topk_int8(
    vectors: DataFrame, queries: DataFrame, top_k: int = 10
) -> DataFrame:
    """Cosine top-k over int8-quantized vectors: exact arithmetic on the
    quantized representation (integer dot products are exact in doubles up
    to 2^53), so unlike the LSH/IVF paths the whole operator is
    deterministic and SQL-replayable — quantization is the ONLY
    approximation, and the oracle gates it end-to-end. Same plan shape as
    cosine_topk_bruteforce (broadcast queries, JVM fold, per-query k-heap
    window); compose with ivf_index for the sublinear path.
    (query_id, rank, neighbor_id, score)."""
    qv, _ = quantize_int8(vectors)
    v = qv.select(F.col("vec_id").alias("neighbor_id"), F.col("qvec").alias("v"))
    q = qv.join(queries.select("vec_id"), "vec_id").select(
        F.col("vec_id").alias("query_id"), F.col("qvec").alias("q")
    )
    scored = (
        F.broadcast(q)
        .crossJoin(v)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                _dot(F.col("q"), F.col("v"))
                / (_norm(F.col("q")) * _norm(F.col("v")))
            ).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("query_id", "rank", "neighbor_id", "score")
    )


def pq_index(
    vectors: DataFrame,
    m_subspaces: int = 8,
    n_centroids: int = 16,
    seed: int = 42,
    embedding_col: str = "embedding",
) -> tuple[DataFrame, np.ndarray]:
    """Product quantization (Jegou et al., PAMI 2011): split the embedding
    into ``m_subspaces`` contiguous sub-vectors, k-means each subspace
    (pyspark.ml KMeans — distributed, k-means|| init, deterministic under
    the seed), and encode every vector as ``m`` centroid ids — 64-dim
    float32 compresses to m bytes/vector (8 here), the layout that lets a
    100 TB vector corpus live in cluster RAM.

    Returns (codes = vectors + ``codes array<int>``, codebooks ndarray
    [m, k, sub_dim]). The m fits run over the same cached projection;
    encoding is ONE Arrow-batched pass doing m argmin matmuls per batch
    (no per-subspace joins). Assignment optimality is gated by
    ``pq_assign_violations``; the ADC lookup machinery by
    ``pq_adc_violations``.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    dim_row = vectors.select(F.size(embedding_col).alias("d")).first()
    dim = dim_row["d"]
    if dim % m_subspaces != 0:
        raise ValueError(f"dim {dim} not divisible by m={m_subspaces}")
    sub = dim // m_subspaces
    feat = vectors.select(
        "vec_id",
        F.transform(embedding_col, lambda x: x.cast("double")).alias("e"),
    ).persist()
    books = []
    for j in range(m_subspaces):
        fj = feat.withColumn(
            "_feat", array_to_vector(F.slice("e", j * sub + 1, sub))
        )
        model = KMeans(k=n_centroids, seed=seed + j, featuresCol="_feat").fit(fj)
        books.append(
            np.stack([np.asarray(c, dtype=np.float64) for c in model.clusterCenters()])
        )
    codebooks = np.stack(books)  # [m, k, sub]

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def encode(e: pd.Series) -> pd.Series:
        mat = np.stack(e.to_numpy()).astype(np.float64)  # (b, dim)
        codes = np.empty((mat.shape[0], m_subspaces), dtype=np.int32)
        for j in range(m_subspaces):
            x = mat[:, j * sub:(j + 1) * sub]  # (b, sub)
            # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2 ; ||x||^2 constant in argmin
            d = -2.0 * (x @ codebooks[j].T) + (codebooks[j] ** 2).sum(1)[None, :]
            codes[:, j] = np.argmin(d, axis=1)
        return pd.Series(list(codes))

    codes_df = feat.select("vec_id", encode(F.col("e")).alias("codes"))
    return codes_df, codebooks


def pq_assign_violations(
    vectors: DataFrame, m_subspaces: int = 8, n_centroids: int = 16,
    seed: int = 42, index=None,
) -> DataFrame:
    """Assignment-optimality gate for pq_index: re-derives each subspace
    code as the exact argmin over FULL squared distances (independent of
    the matmul shortcut in encode, which drops the ||x||^2 term) and
    returns disagreeing (vec_id, subspace) rows — EMPTY when consistent."""
    codes, books = index or pq_index(vectors, m_subspaces, n_centroids, seed)
    dim = books.shape[0] * books.shape[2]
    sub = books.shape[2]
    joined = vectors.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("e")
    ).join(codes, "vec_id")

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def best(e: pd.Series) -> pd.Series:
        mat = np.stack(e.to_numpy()).astype(np.float64)
        out = np.empty((mat.shape[0], books.shape[0]), dtype=np.int32)
        for j in range(books.shape[0]):
            x = mat[:, j * sub:(j + 1) * sub]
            d = ((x[:, None, :] - books[j][None, :, :]) ** 2).sum(-1)
            out[:, j] = np.argmin(d, axis=1)
        return pd.Series(list(out))

    return (
        joined.withColumn("_best", best(F.col("e")))
        .select(
            "vec_id",
            F.posexplode(F.zip_with("codes", "_best", lambda a, b: a != b))
            .alias("subspace", "bad"),
        )
        .filter("bad")
        .select("vec_id", "subspace")
    )


def pq_adc_violations(
    vectors: DataFrame, m_subspaces: int = 8, n_centroids: int = 16,
    seed: int = 42, n_queries: int = 3, tol: float = 1e-9, index=None,
) -> DataFrame:
    """ADC-identity gate: the asymmetric distance computed by table
    lookups (sum over subspaces of the per-subspace distance table entry
    at the vector's code) must equal ||q - decode(codes)||^2 computed
    directly from the reconstructed vector. Violating (query_id, vec_id)
    rows — EMPTY when the lookup machinery is correct."""
    codes, books = index or pq_index(vectors, m_subspaces, n_centroids, seed)
    sub = books.shape[2]
    qs = [
        (r["vec_id"], np.asarray(r["e"], dtype=np.float64))
        for r in vectors.select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("e"),
        ).filter(F.col("vec_id") < n_queries).collect()
    ]

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def bad_queries(c: pd.Series) -> pd.Series:
        codes_mat = np.stack(c.to_numpy()).astype(np.int64)  # (b, m)
        recon = np.concatenate(
            [books[j][codes_mat[:, j]] for j in range(books.shape[0])], axis=1
        )  # (b, dim)
        out = []
        for i in range(codes_mat.shape[0]):
            bad = []
            for qid, q in qs:
                # table path: per-subspace tables built from q
                adc = 0.0
                for j in range(books.shape[0]):
                    tbl = ((q[j * sub:(j + 1) * sub][None, :] - books[j]) ** 2).sum(1)
                    adc += tbl[codes_mat[i, j]]
                direct = float(((q - recon[i]) ** 2).sum())
                if abs(adc - direct) > tol:
                    bad.append(qid)
            out.append(bad)
        return pd.Series(out)

    return (
        codes.withColumn("_bad", bad_queries(F.col("codes")))
        .select("vec_id", F.explode("_bad").alias("query_id"))
        .select("query_id", "vec_id")
    )


def pq_topk(
    codes: DataFrame,
    codebooks: np.ndarray,
    queries: DataFrame,
    top_k: int = 10,
) -> DataFrame:
    """PQ ANN search via asymmetric distance computation: per query, an
    [m, k] distance table is built once driver-side (m*k floats — tiny)
    and broadcast; each Arrow batch of codes scores ALL queries with one
    fancy-indexing gather + sum per subspace — O(m) byte lookups per
    (query, vector), no float reconstruction, the PQ scan layout. L2
    distances, smaller = closer. Compose with ivf_index to restrict the
    scan to probed lists at scale. (query_id, rank, neighbor_id, dist)."""
    m, k, sub = codebooks.shape
    qrows = [
        (r["vec_id"], np.asarray(r["e"], dtype=np.float64))
        for r in queries.select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("e"),
        ).collect()
    ]
    qids = np.array([q[0] for q in qrows], dtype=np.int64)
    tables = np.stack(
        [
            np.stack(
                [
                    ((q[j * sub:(j + 1) * sub][None, :] - codebooks[j]) ** 2).sum(1)
                    for j in range(m)
                ]
            )
            for _, q in qrows
        ]
    )  # [nq, m, k]

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def adc(c: pd.Series) -> pd.Series:
        cm = np.stack(c.to_numpy()).astype(np.int64)  # (b, m)
        # dists[b, q] = sum_j tables[q, j, cm[b, j]]
        d = np.zeros((cm.shape[0], tables.shape[0]))
        for j in range(m):
            d += tables[:, j, :][:, cm[:, j]].T  # (b, nq)
        return pd.Series(list(d))

    qid_arr = F.array(*[F.lit(int(x)) for x in qids])
    scored = (
        codes.withColumn("_d", adc(F.col("codes")))
        .select(
            F.col("vec_id").alias("neighbor_id"),
            F.explode(F.arrays_zip(qid_arr.alias("query_id"), F.col("_d").alias("dist"))).alias("z"),
        )
        .select(
            F.col("z.query_id").cast("long").alias("query_id"),
            "neighbor_id",
            F.col("z.dist").alias("dist"),
        )
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("dist"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("query_id", "rank", "neighbor_id", "dist")
    )


TRACKING_PARAMS = (
    "utm_source|utm_medium|utm_campaign|utm_term|utm_content|gclid|fbclid|"
    "ref|mc_cid|mc_eid"
)


def canonicalize_urls(df: DataFrame, url_col: str = "url") -> DataFrame:
    """URL canonicalization for crawl dedup — the normalization that makes
    "the same page" one shuffle key: lowercase scheme+host, strip a
    default port, drop fragments, strip tracking query parameters
    (utm_*, gclid, fbclid, ...), sort the surviving query params, drop a
    trailing slash on the path. Pure column expressions (regexp + split +
    array ops), no UDFs; dedup then groups on ``canonical``.

    Returns the input plus a ``canonical`` column. The transform is
    deliberately conservative (no %-decoding, no www-stripping — those
    change identity for some sites); extend the regex table per policy.
    """
    # scheme://host[:port][/path][?query][#fragment]
    scheme = F.lower(F.regexp_extract(url_col, r"^([A-Za-z][A-Za-z0-9+.-]*):", 1))
    host = F.lower(F.regexp_extract(url_col, r"^[^:]+://([^/?#:]+)", 1))
    port = F.regexp_extract(url_col, r"^[^:]+://[^/?#:]+:(\d+)", 1)
    path = F.regexp_extract(url_col, r"^[^:]+://[^/?#]+([^?#]*)", 1)
    query = F.regexp_extract(url_col, r"\?([^#]*)", 1)
    keep_port = F.when(
        (port == "")
        | ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443")),
        F.lit(""),
    ).otherwise(F.concat(F.lit(":"), port))
    clean_path = F.when(
        (F.length(path) > 1) & path.endswith("/"),
        F.expr(f"substring({'_p'}, 1, length({'_p'}) - 1)"),
    ).otherwise(F.col("_p"))
    params = F.filter(
        F.split(query, "&"),
        lambda kv: (kv != "")
        & ~F.regexp_extract(kv, r"^([^=]+)", 1).rlike(f"^(?i)({TRACKING_PARAMS})$"),
    )
    canon_q = F.array_join(F.array_sort(params), "&")
    out = (
        df.withColumn("_p", path)
        .withColumn("_cp", clean_path)
        .withColumn("_q", canon_q)
        .withColumn(
            "canonical",
            F.concat(
                scheme, F.lit("://"), host, keep_port, F.col("_cp"),
                F.when(F.col("_q") != "", F.concat(F.lit("?"), F.col("_q")))
                .otherwise(F.lit("")),
            ),
        )
        .drop("_p", "_cp", "_q")
    )
    return out


def compression_ratio(
    df: DataFrame, text_col: str = "text", level: int = 6
) -> DataFrame:
    """Deflate compression ratio per document — the cheap
    redundancy/quality signal (Gopher/RefinedWeb-style: boilerplate and
    generated spam compress far better than natural prose; near-random
    strings barely compress). ratio = deflate_bytes / utf8_bytes, lower
    = more redundant. Arrow-batched pandas UDF (zlib is stdlib; one
    Python call per document, vectorized transfer — the decode-style
    plumbing, not a JVM expression, so this is the documented Python
    island). Empty docs get ratio 0. Returns input + (n_bytes, ratio).
    """
    import zlib

    @F.pandas_udf("struct<n_bytes: long, ratio: double>")
    def _comp(texts: pd.Series) -> pd.DataFrame:
        n, r = [], []
        for t in texts:
            b = (t or "").encode("utf-8")
            n.append(len(b))
            r.append(len(zlib.compress(b, level)) / len(b) if b else 0.0)
        return pd.DataFrame({"n_bytes": n, "ratio": r})

    return df.withColumn("_c", _comp(F.col(text_col))).select(
        "*", F.col("_c.n_bytes").alias("n_bytes"),
        F.round(F.col("_c.ratio"), 6).alias("ratio"),
    ).drop("_c")


def _char_grams(text: F.Column, k: int) -> F.Column:
    """ALL character k-grams (with multiplicity — unlike ``shingles``,
    which dedups) of lowercased whitespace-collapsed text."""
    norm = F.lower(F.regexp_replace(text, r"\s+", " "))
    idx = F.sequence(F.lit(1), F.greatest(F.length(norm) - (k - 1), F.lit(1)))
    return F.transform(idx, lambda i: norm.substr(i, F.lit(k)))


def language_profiles(
    df: DataFrame,
    text_col: str = "text",
    lang_col: str = "lang",
    top_k: int = 100,
    k: int = 3,
) -> DataFrame:
    """Cavnar-Trenkle language profiles: per language, the ``top_k`` most
    frequent character ``k``-grams ranked 1..top_k (ties broken
    lexicographically so the profile is deterministic and
    SQL-replayable). Returns (lang, gram, rank) — langs x top_k rows, a
    broadcastable model trained with one groupBy over the labeled
    corpus."""
    grams = df.select(
        F.col(lang_col).alias("lang"),
        F.explode(_char_grams(F.col(text_col), k)).alias("gram"),
    )
    counts = grams.groupBy("lang", "gram").agg(F.count("*").alias("c"))
    w = Window.partitionBy("lang").orderBy(F.desc("c"), F.asc("gram"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("lang", "gram", "rank")
    )


def classify_language(
    df: DataFrame,
    profiles: DataFrame,
    text_col: str = "text",
    top_k: int = 100,
    k: int = 3,
) -> DataFrame:
    """Cavnar-Trenkle out-of-place classification: rank each document's
    own top-``top_k`` ``k``-grams, score each candidate language as
    sum(|doc_rank - profile_rank|) with a ``top_k`` penalty for grams
    missing from the profile, predict the argmin (ties -> lowest lang).
    Returns (doc_id, pred_lang, distance).

    Scale shape: the profile table (langs x top_k rows) broadcasts; the
    document side is one gram count + one per-doc window + one broadcast
    join + one argmin window — no shuffle keyed on anything bigger than
    doc_id. The classic n-gram LID, strictly stronger than the stopword
    scorer (textops.language_id) on short or stopword-free text."""
    grams = df.select(
        "doc_id", F.explode(_char_grams(F.col(text_col), k)).alias("gram")
    )
    counts = grams.groupBy("doc_id", "gram").agg(F.count("*").alias("c"))
    dw = Window.partitionBy("doc_id").orderBy(F.desc("c"), F.asc("gram"))
    doc_top = (
        counts.withColumn("drank", F.row_number().over(dw))
        .filter(F.col("drank") <= top_k)
        .select("doc_id", "gram", "drank")
    )
    langs = profiles.select("lang").distinct()
    scored = (
        doc_top.crossJoin(F.broadcast(langs))
        .join(
            F.broadcast(profiles).withColumnRenamed("rank", "prank"),
            ["lang", "gram"],
            "left",
        )
        .groupBy("doc_id", "lang")
        .agg(
            F.sum(
                F.coalesce(
                    F.abs(F.col("drank") - F.col("prank")), F.lit(top_k)
                )
            ).alias("distance")
        )
    )
    aw = Window.partitionBy("doc_id").orderBy(F.asc("distance"), F.asc("lang"))
    return (
        scored.withColumn("_rn", F.row_number().over(aw))
        .filter(F.col("_rn") == 1)
        .select("doc_id", F.col("lang").alias("pred_lang"), "distance")
    )


def group_overlap_minhash(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    min_jaccard: float = 0.5,
    num_hashes: int = 64,
    bands: int = 16,
    max_sha_freq: int | None = 1000,
) -> DataFrame:
    """Scale face of :func:`group_overlap` for when collections are too
    numerous for even the frequency-capped inverted index: MinHash the
    per-collection member-sha SET (one int64 key per distinct member),
    LSH-band the signatures so only bucket-colliding collection pairs
    ever meet, then EXACT-verify the survivors with the same inverted
    shared-count join restricted to candidates. Output and semantics
    match group_overlap (pairs with exact Jaccard >= min_jaccard over
    the capped universe); recall is the banding's (r,b) S-curve —
    pytest-checked against the exact operator. Never all-pairs.
    """
    members = df.select(
        F.col(group_col).cast("string").alias("g"),
        F.xxhash64(F.sha2(F.col(text_col), 256)).alias("m"),
    ).distinct()
    if max_sha_freq is not None:
        rare = (
            members.groupBy("m").agg(F.count("*").alias("_f"))
            .filter(F.col("_f") <= max_sha_freq).select("m")
        )
        members = members.join(rare, "m")
    members = members.persist()
    # signature WITHOUT materializing the member set: num_hashes min
    # aggregates in ONE groupBy (map-side partial agg) — a 10^8-member
    # collection never becomes a 10^8-element array row
    sigs = (
        members.groupBy("g")
        .agg(*[
            F.min(F.xxhash64("m", F.lit(i))).alias(f"_s{i}")
            for i in range(num_hashes)
        ])
        .select(
            F.col("g").alias("doc_id"),
            F.array(*[F.col(f"_s{i}") for i in range(num_hashes)]).alias("sig"),
        )
    )
    rows_per_band = num_hashes // bands
    bb = sigs.select(
        F.col("doc_id").alias("g"),
        _band_explode(bands, rows_per_band).alias("bb"),
    ).select("g", "bb.band", "bb.bucket")
    cand = (
        bb.alias("x")
        .join(bb.alias("y"), ["band", "bucket"])
        .filter(F.col("x.g") < F.col("y.g"))
        .select(F.col("x.g").alias("group_a"), F.col("y.g").alias("group_b"))
        .distinct()
    )
    # exact verify on candidates only: shared member counts + sizes
    sizes = members.groupBy("g").agg(F.count("*").alias("n"))
    a = members.select(F.col("g").alias("group_a"), "m")
    b = members.select(F.col("g").alias("group_b"), "m")
    shared = (
        a.join(b, "m")
        .join(cand, ["group_a", "group_b"])  # semi-restrict to candidates
        .groupBy("group_a", "group_b")
        .agg(F.count("*").alias("shared"))
    )
    out = (
        shared.join(sizes.withColumnRenamed("g", "group_a")
                    .withColumnRenamed("n", "n_a"), "group_a")
        .join(sizes.withColumnRenamed("g", "group_b")
              .withColumnRenamed("n", "n_b"), "group_b")
        .withColumn(
            "jaccard",
            F.round(F.col("shared")
                    / (F.col("n_a") + F.col("n_b") - F.col("shared")), 6),
        )
        .withColumn("containment",
                    F.round(F.col("shared") / F.least("n_a", "n_b"), 6))
        .filter(F.col("jaccard") >= min_jaccard)
        .select("group_a", "group_b", "shared", "n_a", "n_b",
                "jaccard", "containment")
    )
    return out
