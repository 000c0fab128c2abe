"""Corpus-level pipeline operators: dedup clustering, decontamination,
deterministic sampling, vocabulary building.

These compose the dedup/graph primitives into the end-to-end shapes an
LLM-training-data pipeline runs over a whole corpus:

- :func:`dedup_clusters` — near-duplicate PAIRS are only half the dedup
  story; production dedup keeps ONE representative per transitive cluster.
  The pair graph feeds the repo's own GIM-V connected-components engine
  (HashMin), so the canonical-document assignment is the min doc_id of each
  component — exactly what the reference's CC computes over link graphs
  (reference: flexgraph CCComputation semantics), re-aimed at the dedup
  graph.
- :func:`ngram_decontaminate` — eval-set contamination check: flag every
  training document sharing >= ``min_shared`` k-gram shingles with any
  held-out document (the GPT-3/PaLM n-gram collision rule).
- :func:`deterministic_sample` — hash-threshold sampling, per-stratum
  rates. sha256(salt || id) is uniform on [0, 2^32) in its first 8 hex
  digits, so ``u < rate`` keeps an exact, reproducible, cluster-stable
  subset: no RNG state, no sampleBy approximation, rerunnable on any
  executor count with identical output.
- :func:`top_ngrams` — corpus-wide word-n-gram frequencies (vocabulary /
  stop-list building). One explode + one count shuffle; the n-gram key
  space is Zipfian but the partial aggregation (map-side combine) absorbs
  the head before the shuffle.

All four are pure DataFrame plans (no Python UDFs) and each has an exact
DuckDB oracle in ``__spark_entry__.oracle_sql``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from flexgraph_spark import algorithms
from flexgraph_spark.textops import jaccard_similarity_join, shingles, shingle_hashes


# ---------------------------------------------------------------------------
# Transitive dedup clustering
# ---------------------------------------------------------------------------

def dedup_clusters(
    df: DataFrame,
    text_col: str = "text",
    threshold: float = 0.25,
    k: int = 5,
    max_iter: int = 50,
    pairs: DataFrame | None = None,
) -> DataFrame:
    """Assign every document to a near-duplicate cluster; returns
    ``(doc_id, cluster_id, is_canonical)`` where ``cluster_id`` is the min
    doc_id of the transitive closure of the >= ``threshold`` Jaccard
    near-dup relation (singletons are their own cluster).

    Scale shape: the pair graph holds only near-duplicate edges — orders of
    magnitude smaller than the corpus — so CC on it converges in a few
    supersteps over a small DataFrame; the corpus only pays one
    prefix-filtered similarity join (never all-pairs) plus one final
    doc_id-keyed left join against the (small) component table. Pass a
    prebuilt ``pairs`` (doc_a, doc_b) to reuse an existing near-dup result
    instead of recomputing the join.
    """
    if pairs is None:
        pairs = jaccard_similarity_join(df, text_col, threshold=threshold, k=k)
    edges = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    cc = algorithms.connected_components(edges, max_iter=max_iter)
    comp = cc.state.select(
        F.col("vertex").alias("doc_id"), F.col("value").cast("long").alias("cluster_id")
    )
    out = (
        df.select("doc_id")
        .join(comp, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("cluster_id", "doc_id").alias("cluster_id"),
        )
    )
    return out.withColumn("is_canonical", (F.col("doc_id") == F.col("cluster_id")))


def dedup_keep_best(
    df: DataFrame,
    text_col: str = "text",
    threshold: float = 0.25,
    k: int = 5,
    pairs: DataFrame | None = None,
    score: F.Column | None = None,
) -> DataFrame:
    """Near-dup dedup with QUALITY-AWARE canonical selection: cluster via
    :func:`dedup_clusters`, then keep the best-scoring document per
    cluster instead of the arbitrary min-doc_id representative —
    production dedup keeps the longest/cleanest copy, not the first one
    crawled. Returns ``(doc_id, cluster_id, keep)``.

    ``score`` defaults to document length (deterministic, SQL-exact);
    ties break on lowest doc_id. Scale shape: the cluster assignment is
    the CC-on-pair-graph plan of dedup_clusters, and the winner pick is
    one ``row_number`` window PARTITIONED BY cluster_id — shuffles on the
    cluster key only, no global sort.
    """
    from pyspark.sql import Window

    clusters = dedup_clusters(
        df, text_col, threshold=threshold, k=k, pairs=pairs
    ).select("doc_id", "cluster_id")
    s = score if score is not None else F.length(F.col(text_col)).cast("long")
    scored = df.select("doc_id", s.alias("_score"))
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("_score"), F.asc("doc_id")
    )
    return (
        clusters.join(scored, "doc_id")
        .withColumn("keep", F.row_number().over(w) == 1)
        .select("doc_id", "cluster_id", "keep")
    )


def perplexity_buckets(
    df: DataFrame,
    n_buckets: int = 10,
    text_col: str = "text",
    lm_counts: DataFrame | None = None,
    exact: bool = True,
) -> DataFrame:
    """CCNet-style perplexity bucketing: score every document with the
    unigram LM (:func:`unigram_logprob`), then split the corpus into
    ``n_buckets`` equal-frequency quality tiers. Returns
    ``(doc_id, ppl_r, bucket)`` with bucket 1 = lowest perplexity (most
    fluent); empty documents (NULL perplexity) land in the last bucket.

    ``exact=True`` is the oracle face: ntile over the total order
    (round(ppl,4), doc_id) — deterministic and SQL-identical, but the
    global window is a single-partition sort, fine at validation scale
    only. ``exact=False`` is the 100 TB path: bucket boundaries from
    ``approxQuantile`` (one distributed pass, 1e-3 relative error) applied
    as a broadcast when-chain — no global sort, same schema, boundaries
    approximate instead of exact-frequency.
    """
    from pyspark.sql import Window

    lp = unigram_logprob(df, text_col, lm_counts)
    scored = lp.select("doc_id", F.round("ppl", 4).alias("ppl_r"))
    if exact:
        w = Window.orderBy(F.col("ppl_r").asc_nulls_last(), F.col("doc_id"))
        return scored.withColumn("bucket", F.ntile(n_buckets).over(w))
    non_null = scored.filter(F.col("ppl_r").isNotNull())
    cuts = non_null.approxQuantile(
        "ppl_r", [i / n_buckets for i in range(1, n_buckets)], 1e-3
    )
    bucket = F.lit(n_buckets)
    for i in range(n_buckets - 1, 0, -1):
        bucket = F.when(F.col("ppl_r") <= cuts[i - 1], i).otherwise(bucket)
    bucket = F.when(F.col("ppl_r").isNull(), n_buckets).otherwise(bucket)
    return scored.withColumn("bucket", bucket)


# ---------------------------------------------------------------------------
# Decontamination vs a held-out set
# ---------------------------------------------------------------------------

def ngram_decontaminate(
    train: DataFrame,
    held_out: DataFrame,
    text_col: str = "text",
    k: int = 13,
    min_shared: int = 1,
    hashed: bool = True,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Contamination report: ``(doc_id, n_shared)`` for every training
    document sharing >= ``min_shared`` distinct character-``k``-shingles
    with ANY held-out document (GPT-3 appendix-C style n-gram overlap,
    shingles instead of word grams so the rule is tokenizer-free).

    Scale shape: the held-out side is the distinct UNION of its shingles —
    one set for the whole eval corpus, typically millions of grams vs the
    training side's trillions — broadcast when ``broadcast_eval`` (the
    standard case: eval sets are tiny), else a shuffle semi-join on the
    gram key. ``hashed=True`` (the scale path) joins on xxhash64'd grams
    (fixed-width int64 keys); ``hashed=False`` joins on gram strings and is
    bit-exactly reproducible in ANSI SQL for the oracle gate.
    """
    gram = shingle_hashes if hashed else shingles
    t = train.select("doc_id", F.explode(gram(F.col(text_col), k)).alias("g"))
    e = held_out.select(F.explode(gram(F.col(text_col), k)).alias("g")).distinct()
    if broadcast_eval:
        e = F.broadcast(e)
    return (
        t.join(e, "g")
        .groupBy("doc_id")
        .agg(F.count_distinct("g").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


# ---------------------------------------------------------------------------
# Deterministic hash-threshold sampling
# ---------------------------------------------------------------------------

def _hash_u(id_col: F.Column, salt: str) -> F.Column:
    """Uniform [0,1) from the first 32 bits of sha256(salt:id)."""
    h = F.sha2(F.concat(F.lit(salt + ":"), id_col.cast("string")), 256)
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("double") / F.lit(4294967296.0)

def deterministic_sample(
    df: DataFrame,
    rates: dict[str, float],
    default_rate: float = 0.0,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "fgx",
) -> DataFrame:
    """Exact, reproducible stratified sample: keep a row iff
    ``u(id) < rates[stratum]`` where ``u`` is the uniform [0,1) value of
    sha256(salt:id)'s first 32 bits.

    Unlike ``df.sampleBy`` (per-partition RNG: resample on any repartition,
    approximate fractions), the kept set is a pure function of (id, salt,
    rates) — identical on 1 core or 1000 executors, stable across reruns
    and engine versions, and auditable row-by-row in SQL. Narrow plan: one
    sha256 + compare per row, no shuffle, fully pushed into the scan stage.
    """
    u = _hash_u(F.col(id_col), salt)
    rate = F.lit(float(default_rate))
    for stratum, r in sorted(rates.items()):
        rate = F.when(F.col(stratum_col) == stratum, F.lit(float(r))).otherwise(rate)
    return df.withColumn("_u", u).filter(F.col("_u") < rate).drop("_u")


def deterministic_sample_exact(
    df: DataFrame,
    k: int,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "fgx",
) -> DataFrame:
    """Exact-size reproducible stratified sample: the ``k``
    LOWEST-hash rows of each stratum (sha256(salt:id) order, id
    tie-break) — the fixed-size eval/holdout-set builder that
    :func:`deterministic_sample`'s rate form can't guarantee (a rate
    keeps a binomially-varying count). Same auditability contract: the
    kept set is a pure function of (ids, salt, k), identical at any
    parallelism, re-derivable row-by-row in SQL. Strata smaller than k
    are kept whole.

    Scale shape: one hash per row + one per-stratum top-k (window rank
    over the stratum shuffle — bounded state per stratum, no global
    sort). Adds a ``pick`` column (1..k rank within the stratum).
    """
    from pyspark.sql import Window

    u = _hash_u(F.col(id_col), salt)
    w = Window.partitionBy(stratum_col).orderBy(F.col("_u"), F.col(id_col))
    return (
        df.withColumn("_u", u)
        .withColumn("pick", F.row_number().over(w))
        .filter(F.col("pick") <= int(k))
        .drop("_u")
    )


# ---------------------------------------------------------------------------
# Vocabulary / n-gram frequencies
# ---------------------------------------------------------------------------

def top_ngrams(
    df: DataFrame,
    n: int = 2,
    topk: int = 50,
    text_col: str = "text",
    min_count: int = 2,
) -> DataFrame:
    """Top-``topk`` word ``n``-grams by document frequency-weighted count:
    ``(ngram, cnt)``, ties broken by ngram ascending (deterministic).

    Tokenization: lowercase, split on whitespace runs. Per-document grams
    are NOT de-duplicated (corpus term frequency, the vocabulary-building
    count). The explode fans each doc into len-n+1 rows, partial
    aggregation combines the Zipf head map-side, and the final top-k is a
    single ordered limit — Spark executes it as per-partition TakeOrdered
    then a driver merge of k-row heaps, no global sort materialization.
    """
    norm = F.lower(F.regexp_replace(F.col(text_col), r"\s+", " "))
    toks = F.split(F.trim(norm), " ")
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1)))
    grams = F.when(
        F.size(toks) >= n,
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n))),
    ).otherwise(F.array().cast("array<string>"))
    return (
        df.select(F.explode(grams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= min_count)
        .orderBy(F.col("cnt").desc(), F.col("ngram"))
        .limit(topk)
    )


def collocations(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
) -> DataFrame:
    """Pointwise mutual information of adjacent word pairs (collocation
    mining for tokenizer/vocabulary construction):
    ``(w1, w2, n_ab, pmi)`` for every bigram with ``n_ab >= min_count``,
    ``pmi = ln((n_ab/B) / ((n_a/T)·(n_b/T)))`` over corpus totals T
    (tokens) and B (bigrams).

    Pure counting + one log — three count shuffles (unigrams, bigrams,
    totals ride on the same aggregates) and two broadcast-sized joins of
    the bigram table against the unigram counts; the min_count filter
    prunes the Zipf tail before the joins. Output is filtered only by the
    integer count, so the result SET is exact and engine-independent; the
    pmi value is deterministic double math (rounded by callers for
    cross-engine comparison).
    """
    norm = F.lower(F.regexp_replace(F.col(text_col), r"\s+", " "))
    toks = F.split(F.trim(norm), " ")
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - 1, F.lit(1)))
    grams = F.when(
        F.size(toks) >= 2,
        F.transform(idx, lambda i: F.struct(
            F.element_at(toks, i).alias("w1"),
            F.element_at(toks, i + 1).alias("w2"),
        )),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))

    uni = (
        df.select(F.explode(toks).alias("w"))
        .groupBy("w").agg(F.count("*").alias("n_w"))
    )
    total_t = uni.agg(F.sum("n_w").alias("t"))
    bi = (
        df.select(F.explode(grams).alias("g"))
        .select("g.w1", "g.w2")
        .groupBy("w1", "w2").agg(F.count("*").alias("n_ab"))
    )
    total_b = bi.agg(F.sum("n_ab").alias("b"))
    out = (
        bi.filter(F.col("n_ab") >= min_count)
        .join(F.broadcast(uni.withColumnRenamed("w", "w1")
                          .withColumnRenamed("n_w", "n_a")), "w1")
        .join(F.broadcast(uni.withColumnRenamed("w", "w2")
                          .withColumnRenamed("n_w", "n_b")), "w2")
        .crossJoin(F.broadcast(total_t))
        .crossJoin(F.broadcast(total_b))
        .select(
            "w1", "w2", "n_ab",
            F.log(
                (F.col("n_ab") / F.col("b"))
                / ((F.col("n_a") / F.col("t")) * (F.col("n_b") / F.col("t")))
            ).alias("pmi"),
        )
    )
    return out


def unigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    lm_counts: DataFrame | None = None,
) -> DataFrame:
    """Per-document unigram language-model score — the classic cheap
    quality signal (CCNet-style: documents whose tokens are improbable
    under a corpus LM are boilerplate/garbage): ``(doc_id, n_tokens,
    avg_logprob, ppl)`` with ``avg_logprob = mean(ln(n_w / T))`` over the
    document's whitespace tokens and ``ppl = exp(-avg_logprob)``.

    ``lm_counts`` (w, n_w) lets callers score against an LM trained on a
    DIFFERENT (e.g. reference/clean) corpus; default trains on ``df``
    itself, where every token has n_w >= 1 so no smoothing is needed.
    Scale shape: one token-count aggregation (map-side combine absorbs the
    Zipf head), then a shuffle join of exploded tokens against the count
    table keyed by token — AQE's skew split handles the stop-word keys —
    and one per-doc mean. Empty documents score NULL logprob, n_tokens 0.
    """
    norm = F.lower(F.regexp_replace(F.col(text_col), r"\s+", " "))
    toks = F.split(F.trim(norm), " ")
    tok = df.select("doc_id", F.explode(toks).alias("w")).filter(F.col("w") != "")
    if lm_counts is None:
        lm_counts = tok.groupBy("w").agg(F.count("*").alias("n_w"))
    total = lm_counts.agg(F.sum("n_w").alias("t"))
    scored = (
        tok.join(lm_counts, "w")
        .crossJoin(F.broadcast(total))
        .select("doc_id", F.log(F.col("n_w") / F.col("t")).alias("lp"))
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"), F.avg("lp").alias("avg_logprob")
    )
    return (
        df.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            "avg_logprob",
            F.exp(-F.col("avg_logprob")).alias("ppl"),
        )
    )


def pack_documents(
    df: DataFrame,
    max_tokens: int,
    text_col: str = "text",
    group_cols: list[str] | None = None,
    n_shards: int = 0,
) -> DataFrame:
    """Deterministic sequential packing of documents into fixed-size token
    bins (pretraining batch construction): ``(doc_id, <groups>, shard,
    n_tokens, bin)`` where documents ordered by doc_id within a
    (group, shard) stream are assigned ``bin = floor(cum_prev / max_tokens)``
    — each bin takes consecutive documents until their running token total
    reaches ``max_tokens`` (a document longer than ``max_tokens`` occupies
    its own bin and overflows it; chunk first via
    :func:`flexgraph_spark.textops.chunk_documents` if that matters).

    Scale shape: the running sum is a window ordered by doc_id, which sorts
    WITHIN each (group, shard) partition only — ``n_shards > 0`` splits
    each group into ``pmod(xxhash64(doc_id), n_shards)`` streams so no
    single window sees more than corpus/(groups·shards) rows and the sort
    stays parallel (bins never cross shards by construction, so packing
    quality is unchanged; determinism is unchanged because the shard of a
    doc is a pure hash). With ``n_shards = 0`` (tests/oracle) each group is
    one stream — exact but single-reducer, small-data only.
    """
    from pyspark.sql import Window

    groups = list(group_cols or [])
    norm = F.lower(F.regexp_replace(F.col(text_col), r"\s+", " "))
    n_tok = F.size(F.filter(F.split(F.trim(norm), " "), lambda w: w != ""))
    base = df.select("doc_id", *groups, n_tok.alias("n_tokens"))
    shard = (
        F.pmod(F.xxhash64(F.col("doc_id")), F.lit(n_shards))
        if n_shards > 0
        else F.lit(0)
    )
    base = base.withColumn("shard", shard.cast("int"))
    w = (
        Window.partitionBy(*(groups + ["shard"]))
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_prev = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return base.select(
        "doc_id",
        *groups,
        "shard",
        "n_tokens",
        F.floor(cum_prev / F.lit(max_tokens)).cast("long").alias("bin"),
    )


def bigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    lam: float = 0.7,
    lm_docs: DataFrame | None = None,
) -> DataFrame:
    """Per-document interpolated bigram LM score — one rung above
    :func:`unigram_logprob` on the CCNet-style quality ladder:

        lp(w_i | w_{i-1}) = ln( λ·n(w_{i-1},w_i)/n_ctx(w_{i-1})
                               + (1-λ)·n(w_i)/T )

    over positions i ≥ 2; ``(doc_id, n_bigrams, avg_logprob, ppl)``.
    The unigram backoff term makes every in-vocabulary continuation finite
    (an unseen bigram whose w_i exists still scores), so no extra
    smoothing is needed when scoring the training corpus itself.
    ``lm_docs`` trains the counts on a different corpus.

    Scale shape: adjacent pairing happens INSIDE the token array (one
    ``transform`` over a slice — no positional self-join, no window
    shuffle), then one bigram-count aggregation (map-side combine soaks
    the Zipf head), one join of exploded bigrams against the count tables
    keyed by (w1, w2) and w2 (AQE skew-splits stop-word keys), one
    per-doc mean.
    """
    def toks_col(frame):
        norm = F.lower(F.regexp_replace(F.col(text_col), r"\s+", " "))
        return F.filter(F.split(F.trim(norm), " "), lambda w: w != "")

    def bigrams(frame):
        # slice(t, 1, size-1) needs size >= 2 (negative lengths raise in
        # ANSI mode); shorter docs have no bigrams anyway
        t = frame.select("doc_id", toks_col(frame).alias("t")).where(
            F.size("t") >= 2
        )
        pairs = F.expr(
            "transform(slice(t, 1, size(t) - 1), "
            "(x, i) -> struct(x as w1, element_at(t, i + 2) as w2))"
        )
        return t.select("doc_id", F.explode(pairs).alias("b")).select(
            "doc_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2")
        )

    lm_src = df if lm_docs is None else lm_docs
    lm_bi = bigrams(lm_src)
    big = lm_bi.groupBy("w1", "w2").agg(F.count("*").alias("n_big"))
    ctx = lm_bi.groupBy("w1").agg(F.count("*").alias("n_ctx"))
    tok = lm_src.select(F.explode(toks_col(lm_src)).alias("w"))
    uni = tok.groupBy("w").agg(F.count("*").alias("n_w"))
    total = uni.agg(F.sum("n_w").alias("t"))

    doc_bi = bigrams(df)
    lam_c = F.lit(float(lam))
    scored = (
        doc_bi.join(big, ["w1", "w2"], "left")
        .join(ctx, "w1", "left")
        .join(uni.withColumnRenamed("w", "w2"), "w2", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            F.log(
                lam_c * F.coalesce(F.col("n_big") / F.col("n_ctx"), F.lit(0.0))
                + (1.0 - lam_c)
                * F.coalesce(F.col("n_w") / F.col("t"), F.lit(0.0))
            ).alias("lp"),
        )
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"), F.avg("lp").alias("avg_logprob")
    )
    return (
        df.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            "avg_logprob",
            F.exp(-F.col("avg_logprob")).alias("ppl"),
        )
    )


def mixture_weights(
    df: DataFrame,
    group_col: str = "lang",
    temperature: float = 0.7,
    target_rows: int | None = None,
) -> DataFrame:
    """Temperature-flattened mixture weights per group — the multilingual /
    multi-domain rebalancing rule (sample probability ∝ count^τ, τ < 1
    upsamples tails, τ = 1 keeps natural proportions): returns one row per
    group ``(group, n_rows, nat_share, weight, rate)`` where ``weight`` is
    the normalized count^τ share and ``rate = min(1, target_rows·weight /
    n_rows)`` is the per-group keep fraction a sampler should apply
    (``target_rows`` defaults to the corpus size). Feed ``rate`` straight
    into :func:`deterministic_sample` (rates dict) for an auditable
    end-to-end rebalanced sample.

    One aggregation + one broadcast of the (tiny) per-group table; pure
    column math, no UDFs.
    """
    cnt = df.groupBy(F.col(group_col).alias("group")).agg(
        F.count("*").alias("n_rows")
    )
    tot = cnt.agg(
        F.sum("n_rows").alias("t"),
        F.sum(F.pow(F.col("n_rows").cast("double"), float(temperature))).alias(
            "z"
        ),
    )
    tgt = F.lit(int(target_rows)) if target_rows is not None else F.col("t")
    return (
        cnt.crossJoin(F.broadcast(tot))
        .select(
            "group",
            "n_rows",
            (F.col("n_rows") / F.col("t")).alias("nat_share"),
            (
                F.pow(F.col("n_rows").cast("double"), float(temperature))
                / F.col("z")
            ).alias("weight"),
            F.least(
                F.lit(1.0),
                F.pow(F.col("n_rows").cast("double"), float(temperature))
                / F.col("z") * tgt / F.col("n_rows"),
            ).alias("rate"),
        )
    )


def deterministic_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    salt: str = "shuf",
    n_shards: int = 8,
) -> DataFrame:
    """Reproducible global training order — the "shuffle the corpus before
    epoch 0" step, as a pure function of (id, salt) instead of an RNG:
    each row gets ``shard = first32bits(sha256(salt:id)) mod n_shards``
    and ``pos`` = its rank within the shard ordered by (hash, id). Readers
    consume shards round-robin (or concatenated) for a stable pseudo-random
    order that survives reruns, repartitions, and engine versions — the
    same auditability argument as :func:`deterministic_sample`. Re-salt to
    get a fresh epoch order.

    Scale shape: one hash per row, one shuffle keyed by shard, one
    within-shard sort (window rank) — set ``n_shards`` to O(cores ×
    shards-per-core) so each shard's sort fits an executor; no global
    total order is ever materialized.
    """
    from pyspark.sql import Window

    h = F.sha2(
        F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")), 256
    )
    shard = (
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % n_shards
    ).cast("int")
    w = Window.partitionBy("shard").orderBy("_h", id_col)
    return (
        df.withColumn("_h", h)
        .withColumn("shard", shard)
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .drop("_h")
    )


# ---------------------------------------------------------------------------
# DSIR — Data Selection via Importance Resampling (Xie et al., NeurIPS 2023)
# ---------------------------------------------------------------------------

def _dsir_bucket_counts(
    df: DataFrame, text_col: str, num_buckets: int, salt: str
) -> DataFrame:
    """Per-document hashed n-gram feature counts ``(doc_id, bucket, n)``.

    DSIR's featurization: unigrams AND adjacent bigrams of the
    whitespace-normalized lowercase token stream, each hashed into one of
    ``num_buckets`` buckets. Hashing uses the repo's oracle-portable
    ``sha256(salt ':' feature)`` (sketches.sha_bucket), so DuckDB replays
    the exact bucket assignment — no JVM hash seeds.

    Scale shape: token/bigram pairing happens INSIDE the token array (one
    ``transform`` over a slice — the bigram_logprob pattern: no positional
    self-join, no window), then one (doc_id, bucket) count whose map-side
    partial aggregation collapses each doc's Zipf head before the shuffle.
    """
    from flexgraph_spark.sketches import sha_bucket

    norm = F.lower(F.regexp_replace(F.col(text_col), r"\s+", " "))
    toks = F.filter(F.split(F.trim(norm), " "), lambda w: w != "")
    t = df.select("doc_id", toks.alias("t"))
    uni = t.select("doc_id", F.explode("t").alias("f"))
    # slice(t, 1, size-1) needs size >= 2 (ANSI: negative lengths raise)
    bi = (
        t.where(F.size("t") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(slice(t, 1, size(t) - 1), "
                    "(x, i) -> concat(x, ' ', element_at(t, i + 2)))"
                )
            ).alias("f"),
        )
    )
    feats = uni.unionByName(bi)
    return (
        feats.select("doc_id", sha_bucket(F.col("f"), salt, num_buckets).alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count("*").alias("n"))
    )


def dsir_logweights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    num_buckets: int = 4096,
    salt: str = "dsir",
) -> DataFrame:
    """DSIR importance log-weights: score every ``raw`` document by how
    much more likely its hashed n-gram features are under the TARGET
    corpus's bag-of-buckets LM than under the raw corpus's own —
    ``(doc_id, n_feats, logw)`` with

        logw(d) = Σ_b  n_{d,b} · ( ln p̂(b) − ln q̂(b) )

    where p̂/q̂ are Laplace-smoothed bucket frequencies of the target/raw
    corpora: ``p̂(b) = (c_tgt(b)+1)/(C_tgt+B)`` (Xie et al., NeurIPS 2023,
    "Data Selection for Language Models via Importance Resampling" — the
    hashed-n-gram generative importance estimator, eq. 3-4). High ``logw``
    = looks like the target; feed into :func:`dsir_sample` to resample.

    Scale shape: both corpora reduce to ≤ ``num_buckets``-row models (one
    count aggregation each, map-side combined); the per-bucket log-ratio
    table is broadcast onto the raw side's (doc_id, bucket) counts, then
    one per-doc sum. No UDFs, no driver round-trips; total shuffle =
    2 count-aggs + 1 per-doc sum, independent of how skewed the vocab is.
    Documents with no tokens get logw = 0 (the empty product).
    """
    b = int(num_buckets)
    dbc = _dsir_bucket_counts(raw, text_col, b, salt)
    tbc = _dsir_bucket_counts(target, text_col, b, salt)
    q = dbc.groupBy("bucket").agg(F.sum("n").alias("cq"))
    p = tbc.groupBy("bucket").agg(F.sum("n").alias("cp"))
    # models ride as ONE broadcast table: full outer on bucket (≤ B rows),
    # totals cross-joined in as 1-row aggregates — all inside the broadcast
    totals = (
        q.agg(F.sum("cq").alias("tq"))
        .crossJoin(p.agg(F.sum("cp").alias("tp")))
    )
    ratio = (
        q.join(p, "bucket", "full")
        .crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            (
                F.log((F.coalesce("cp", F.lit(0)) + 1.0) / (F.col("tp") + b))
                - F.log((F.coalesce("cq", F.lit(0)) + 1.0) / (F.col("tq") + b))
            ).alias("lr"),
        )
    )
    per_doc = (
        dbc.join(F.broadcast(ratio), "bucket")
        .groupBy("doc_id")
        .agg(F.sum("n").alias("n_feats"), F.sum(F.col("n") * F.col("lr")).alias("logw"))
    )
    return (
        raw.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_feats", F.lit(0)).alias("n_feats"),
            F.coalesce("logw", F.lit(0.0)).alias("logw"),
        )
    )


def dsir_sample(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    text_col: str = "text",
    num_buckets: int = 4096,
    salt: str = "dsir",
) -> DataFrame:
    """DSIR resampling: select ``k`` raw documents WITHOUT replacement with
    probability ∝ exp(logw), via the Gumbel top-k trick — rank by
    ``logw + Gumbel(doc_id)`` and keep the k largest (Vieira 2014; exactly
    the paper's importance resampling step). The Gumbel noise is a pure
    function of (doc_id, salt): ``g = −ln(−ln(u))`` with ``u`` the
    (0,1)-uniform from sha256's first 32 bits (+0.5 to dodge u = 0), so
    the selected set is deterministic, engine-independent, and replayable
    row-by-row in SQL — the same auditability contract as
    :func:`deterministic_sample`.

    Returns ``(doc_id, n_feats, logw)`` of the selected documents. Scale
    shape: :func:`dsir_logweights` + one distributed TakeOrdered (top-k by
    key, never a global sort materialized).
    """
    lw = dsir_logweights(raw, target, text_col, num_buckets, salt)
    h32 = F.conv(
        F.substring(
            F.sha2(F.concat(F.lit(salt + "g:"), F.col("doc_id").cast("string")), 256),
            1, 8,
        ),
        16, 10,
    ).cast("double")
    u = (h32 + 0.5) / F.lit(4294967296.0)
    key = F.col("logw") - F.log(-F.log(u))
    return (
        lw.withColumn("_key", key)
        .orderBy(F.col("_key").desc(), "doc_id")
        .limit(int(k))
        .drop("_key")
    )


# ---------------------------------------------------------------------------
# BPE tokenizer training (Sennrich et al., ACL 2016) — distributed
# ---------------------------------------------------------------------------

BPE_EOW = "</w>"


def bpe_word_counts(
    df: DataFrame, text_col: str = "text", lowercase: bool = True
) -> DataFrame:
    """(word, cnt) over whitespace-split tokens — THE corpus-size reduction
    step of distributed BPE: one count shuffle collapses a 100 TB corpus
    to a vocabulary-sized table, and every merge round after it touches
    only that table (Sennrich's own dictionary trick, made relational)."""
    w = F.col(text_col)
    if lowercase:
        w = F.lower(w)
    return (
        df.select(F.explode(F.split(w, r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def _bpe_apply_merge(symtab: DataFrame, a: str, b: str) -> DataFrame:
    """One greedy left-to-right non-overlapping merge of the adjacent
    symbol pair (a, b), relationally: a position matches when it starts
    the pair; runs of CONSECUTIVE matches (only possible when a == b)
    merge at even offsets from the run start (the pigeonhole of
    greedy scanning); a position immediately after a merged one is
    consumed. Windows partition by word — the table is vocabulary-sized,
    so the per-word sort is over <= ~20 symbols."""
    from pyspark.sql import Window

    wspec = Window.partitionBy("word").orderBy("pos")
    runw = Window.partitionBy("word", "runid")
    ex = (
        symtab.select("word", "cnt", F.posexplode("syms").alias("pos", "s"))
        .withColumn("nxt", F.lead("s").over(wspec))
        .withColumn("mt", (F.col("s") == a) & (F.col("nxt") == b))
        .withColumn(
            "runid",
            F.when(
                F.col("mt"),
                F.col("pos")
                - F.row_number().over(
                    Window.partitionBy("word", "mt").orderBy("pos")
                ),
            ),
        )
        .withColumn(
            "merged",
            F.col("mt")
            & ((F.col("pos") - F.min("pos").over(runw)) % 2 == 0),
        )
        .withColumn(
            "skip", F.coalesce(F.lag("merged").over(wspec), F.lit(False))
        )
        .withColumn(
            "tok",
            F.when(F.col("merged"), F.lit(a + b))
            .when(F.col("skip"), F.lit(None))
            .otherwise(F.col("s")),
        )
        .filter(F.col("tok").isNotNull())
    )
    return ex.groupBy("word").agg(
        F.first("cnt").alias("cnt"),
        F.transform(
            F.sort_array(F.collect_list(F.struct("pos", "tok"))),
            lambda st: st.getField("tok"),
        ).alias("syms"),
    )


def bpe_learn(
    df: DataFrame,
    n_merges: int,
    text_col: str = "text",
    lowercase: bool = True,
    eow: str = BPE_EOW,
    min_count: int = 1,
    num_partitions: int | None = None,
) -> "BpeResult":
    """Distributed BPE merge learning. Each round: count adjacent symbol
    pairs over the (word, cnt, syms) table (overlaps counted, Sennrich
    get_stats semantics), pick the best pair DETERMINISTICALLY
    (count desc, then (a, b) lexicographic — the reference implementation's
    dict-order tie-break is nondeterministic; this one is replayable), and
    apply it greedily left-to-right (:func:`_bpe_apply_merge`). The driver
    loop collects ONE row per round (the argmax) — the data never leaves
    the cluster, and every round is two vocabulary-sized shuffles.

    Stops early when no pair reaches ``min_count``. Returns merges as
    [(round, a, b, n)], the merge table as a DataFrame, and the final
    per-word segmentation (the encoder for every in-vocabulary word)."""
    from flexgraph_spark.gimv import truncate_plan

    spark = df.sparkSession
    p = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    words = bpe_word_counts(df, text_col, lowercase)
    symtab = truncate_plan(
        words.select(
            "word",
            "cnt",
            F.concat(F.split("word", ""), F.array(F.lit(eow))).alias("syms"),
        ).repartition(p, "word")
    )
    merges: list[tuple[int, str, str, int]] = []
    for r in range(1, n_merges + 1):
        pair_idx = F.when(
            F.size("syms") >= 2, F.sequence(F.lit(1), F.size("syms") - 1)
        ).otherwise(F.array())  # sequence(1, 0) would run DESCENDING
        pairs = symtab.select(
            "cnt",
            F.explode(
                F.transform(
                    pair_idx,
                    lambda i: F.struct(
                        F.element_at("syms", i).alias("a"),
                        F.element_at("syms", i + 1).alias("b"),
                    ),
                )
            ).alias("p"),
        )
        best = (
            pairs.groupBy("p.a", "p.b")
            .agg(F.sum("cnt").alias("n"))
            .orderBy(F.desc("n"), "a", "b")
            .first()
        )
        if best is None or best.n < min_count:
            break
        merges.append((r, best.a, best.b, int(best.n)))
        new = truncate_plan(
            _bpe_apply_merge(symtab, best.a, best.b).repartition(p, "word")
        )
        symtab.unpersist()
        symtab = new
    merges_df = spark.createDataFrame(
        merges or [], "round int, a string, b string, n long"
    )
    return BpeResult(merges=merges, merges_df=merges_df, vocab=symtab)


def bpe_apply(
    words: DataFrame,
    merges: list[tuple[int, str, str, int]] | list[tuple[str, str]],
    word_col: str = "word",
    eow: str = BPE_EOW,
) -> DataFrame:
    """Encode arbitrary (possibly out-of-vocabulary) words with a LEARNED
    merge list: replay every merge in order with the same greedy
    application — the BPE encoder as a DataFrame plan. For in-vocabulary
    words this reproduces ``bpe_learn(...).vocab`` exactly
    (pytest-pinned). Returns (word, syms array<string>)."""
    base = words.select(
        F.col(word_col).alias("word"),
        F.lit(1).cast("long").alias("cnt"),
        F.concat(F.split(word_col, ""), F.array(F.lit(eow))).alias("syms"),
    )
    for m in merges:
        a, b = (m[1], m[2]) if len(m) >= 3 else (m[0], m[1])
        base = _bpe_apply_merge(base, a, b)
    return base.select("word", "syms")


class BpeResult:
    """bpe_learn output: merges [(round, a, b, pair_count)], the same as a
    DataFrame, and the final per-word segmentation table."""

    def __init__(self, merges, merges_df: DataFrame, vocab: DataFrame):
        self.merges = merges
        self.merges_df = merges_df
        self.vocab = vocab


def semantic_decontaminate(
    train_vecs: DataFrame,
    eval_vecs: DataFrame,
    threshold: float = 0.95,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Semantic contamination report — the embedding-space sibling of
    :func:`ngram_decontaminate` (catches paraphrased/retranslated eval
    leakage that shares no n-grams): every training vector whose cosine
    to ANY held-out vector reaches ``threshold``, with its best-matching
    eval id. Returns (vec_id, eval_id, cos) — one row per contaminated
    training doc (ties to the lowest eval_id).

    Scale shape: the eval set (small by definition) broadcasts; the scan
    is one JVM fold per (train, eval) pair — O(|train|·|eval|) exactly
    like the brute-force ANN baseline, and the IVF/LSH candidate paths
    compose when |eval| grows. No Python in the loop.
    """
    from flexgraph_spark.textops import _dot, _norm

    t = train_vecs.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("tv"),
    )
    e = eval_vecs.select(
        F.col("vec_id").alias("eval_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("ev"),
    )
    if broadcast_eval:
        e = F.broadcast(e)
    scored = t.crossJoin(e).select(
        "vec_id",
        "eval_id",
        (_dot(F.col("tv"), F.col("ev"))
         / (_norm(F.col("tv")) * _norm(F.col("ev")))).alias("cos"),
    ).filter(F.col("cos") >= threshold)
    from pyspark.sql import Window

    w = Window.partitionBy("vec_id").orderBy(F.desc("cos"), F.asc("eval_id"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("vec_id", "eval_id", F.round("cos", 6).alias("cos"))
    )


def greedy_coverage_select(
    df: DataFrame,
    k: int = 10,
    gram_k: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """Greedy maximum-coverage data selection (the classic (1-1/e)
    submodular-greedy coreset): pick ``k`` documents one at a time, each
    round taking the document covering the most character ``gram_k``-grams
    NOT yet covered by the picks so far (ties -> lowest doc_id) — the
    diversity-maximizing subset selection used for seed corpora and
    eval-set construction, where near-duplicate picks are worthless.

    Scale shape: the gram table builds once (distinct (doc_id, gram),
    uniform keys) and persists; each of the k rounds is one anti-join
    against the covered-gram set plus one count + global argmax (k is
    small by definition — the selection budget). The covered set and the
    pick list live as DataFrames; only the k winning (doc_id, gain) rows
    ever reach the driver. Returns (pick int, doc_id, gain) in pick
    order.
    """
    from flexgraph_spark.textops import shingles

    grams = (
        df.select("doc_id", F.explode(shingles(F.col(text_col), gram_k)).alias("g"))
        .distinct()
        .persist()
    )
    spark = df.sparkSession
    covered = spark.createDataFrame([], "g string")
    picks: list[tuple[int, int, int]] = []
    # stops early when no remaining document adds coverage (gain 0 rows
    # never enter `gains`, so an exhausted corpus ends the selection)
    for r in range(1, k + 1):
        gains = (
            grams.join(covered, "g", "left_anti")
            .groupBy("doc_id")
            .agg(F.count("*").alias("gain"))
        )
        if picks:
            chosen = spark.createDataFrame(
                [(p[1],) for p in picks], "doc_id long"
            )
            gains = gains.join(chosen, "doc_id", "left_anti")
        top = gains.orderBy(F.desc("gain"), F.asc("doc_id")).limit(1).collect()
        if not top:
            break
        doc, gain = int(top[0]["doc_id"]), int(top[0]["gain"])
        picks.append((r, doc, gain))
        prev = covered
        covered = covered.unionByName(
            grams.filter(F.col("doc_id") == doc).select("g")
        ).distinct().persist()
        covered.count()  # materialize before releasing the prior round
        if r > 1:
            prev.unpersist()
    grams.unpersist()
    return spark.createDataFrame(picks, "pick int, doc_id long, gain long")


def _shuffled_negatives(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic word-shuffled twins of the input docs: tokens
    reordered by xxhash64(doc_id, position) — unigram statistics survive,
    word ORDER (what the bigram LM measures) is destroyed. The standard
    weak-negative construction for a fluency classifier."""
    toks = df.select(
        "doc_id",
        F.posexplode(F.split(F.col(text_col), r"\s+")).alias("pos", "tok"),
    ).filter(F.col("tok") != "")
    return (
        toks.withColumn("_r", F.xxhash64("doc_id", "pos"))
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_r", "pos", "tok"))),
                    lambda st: st["tok"],
                ),
                " ",
            ).alias(text_col)
        )
    )


def _strip_summary(model) -> None:
    """Drop a fitted model's trainingSummary before transform: the
    summary holds a SparkSession reference, and serializing the
    prediction UDF then drags the session's non-serializable
    ObservationManager into the task closure — "Task not serializable"
    in any session that has ever run an Observation-bearing query (every
    GIM-V job here). The summary is reachable via a package-private
    setter; bytecode-public, so py4j can call it."""
    try:
        jvm = model._java_obj
        sc_none = jvm.getClass().getClassLoader().loadClass(
            "scala.None$"
        ).getField("MODULE$").get(None)
        jvm.setSummary(sc_none)
    except Exception:  # noqa: BLE001 — best-effort; scoring still works
        pass


def quality_classifier(
    df: DataFrame,
    text_col: str = "text",
    seed: int = 42,
    reg_param: float = 0.01,
):
    """Weak-label quality classifier — the GPT-3/LLaMA-style
    "looks like curated text" filter, trained WITHOUT labels: positives
    are the input documents, negatives their deterministically
    word-shuffled twins (:func:`_shuffled_negatives`), features are the
    fluency/shape signals the rest of the module already computes
    (interpolated-bigram perplexity under a LM fit on positives,
    punctuation/digit/upper ratios, mean line length). A seeded
    pyspark.ml LogisticRegression separates them; every input document
    is scored with P(curated).

    Returns (scored, model) where scored = (doc_id, p_good double).
    Verification: scoring-identity gate (model.transform probability ==
    sigmoid(intercept + w·x) recomputed from the coefficients as column
    expressions — catches feature/column misalignment) + held-out AUC
    pytest. Training is float-order sensitive at the 1e-15 level, so
    there is no cross-engine oracle for the weights themselves.

    Scale shape: features are column expressions + two LM joins; the
    LBFGS iterations are pyspark.ml's distributed treeAggregate. The
    shuffled-negative build is one posexplode + groupBy (collect_list
    bounded by document length).
    """
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.functions import array_to_vector

    from flexgraph_spark import textops

    pos = df.select("doc_id", text_col)
    # negative-twin ids are SPAN-shifted past the real id range: off =
    # max-min+1 keeps shifted ids collision-free even when real doc_ids
    # are negative (max+1 alone would land doc_id=-5's twin back inside
    # the positive range and mislabel it)
    head = pos.agg(F.min("doc_id").alias("mn"), F.max("doc_id").alias("mx")).first()
    if head["mx"] is None:
        raise ValueError("quality_classifier: empty input — nothing to train on")
    mn, mx = int(head["mn"]), int(head["mx"])
    off = mx - mn + 1
    neg = _shuffled_negatives(pos, text_col).select(
        (F.col("doc_id") + off).alias("doc_id"), text_col
    )
    both = pos.unionByName(neg).persist()
    lm = pos  # fluency model fit on positives only
    feats = (
        bigram_logprob(both, text_col, lm_docs=lm)
        .select("doc_id", F.coalesce("avg_logprob", F.lit(0.0)).alias("f_lp"))
        .join(
            textops.quality_scores(both, text_col).select(
                "doc_id", "punct_ratio", "digit_ratio", "upper_ratio",
                (F.col("mean_line_len") / 100.0).alias("line_len_s"),
            ),
            "doc_id",
        )
    )
    fcols = ["f_lp", "punct_ratio", "digit_ratio", "upper_ratio", "line_len_s"]
    train = feats.select(
        "doc_id",
        array_to_vector(F.array(*[F.col(c) for c in fcols])).alias("features"),
        (F.col("doc_id") <= mx).cast("double").alias("label"),
    )
    model = LogisticRegression(
        maxIter=25, regParam=reg_param, featuresCol="features",
        labelCol="label",
    ).fit(train)
    _strip_summary(model)
    from pyspark.ml.functions import vector_to_array

    scored_all = model.transform(train)
    get_p1 = F.element_at(vector_to_array(F.col("probability")), 2)
    scored = (
        scored_all.filter(F.col("doc_id") <= mx)
        .select("doc_id", get_p1.alias("p_good"))
    )
    both.unpersist()
    return scored, model


def quality_classifier_violations(
    df: DataFrame, text_col: str = "text", seed: int = 42, tol: float = 1e-9,
    reg_param: float = 0.01,
) -> DataFrame:
    """Scoring-identity gate for :func:`quality_classifier`: recompute
    sigmoid(intercept + w·x) from the trained coefficients as column
    expressions and return doc_ids where it disagrees with the model's
    probability beyond ``tol`` — EMPTY when the feature assembly and
    scoring path line up."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.functions import array_to_vector
    from pyspark.ml.functions import vector_to_array as _v2a

    from flexgraph_spark import textops

    pos = df.select("doc_id", text_col)
    head = pos.agg(F.min("doc_id").alias("mn"), F.max("doc_id").alias("mx")).first()
    if head["mx"] is None:
        raise ValueError("quality_classifier: empty input — nothing to train on")
    mn, mx = int(head["mn"]), int(head["mx"])
    off = mx - mn + 1  # span shift: collision-free even for negative ids
    neg = _shuffled_negatives(pos, text_col).select(
        (F.col("doc_id") + off).alias("doc_id"), text_col
    )
    both = pos.unionByName(neg).persist()
    feats = (
        bigram_logprob(both, text_col, lm_docs=pos)
        .select("doc_id", F.coalesce("avg_logprob", F.lit(0.0)).alias("f_lp"))
        .join(
            textops.quality_scores(both, text_col).select(
                "doc_id", "punct_ratio", "digit_ratio", "upper_ratio",
                (F.col("mean_line_len") / 100.0).alias("line_len_s"),
            ),
            "doc_id",
        )
    )
    fcols = ["f_lp", "punct_ratio", "digit_ratio", "upper_ratio", "line_len_s"]
    train = feats.select(
        "doc_id",
        array_to_vector(F.array(*[F.col(c) for c in fcols])).alias("features"),
        (F.col("doc_id") <= mx).cast("double").alias("label"),
        *[F.col(c) for c in fcols],
    )
    model = LogisticRegression(
        maxIter=25, regParam=reg_param, featuresCol="features",
        labelCol="label",
    ).fit(train)
    _strip_summary(model)
    w = model.coefficients.toArray()
    b = float(model.intercept)
    manual = F.lit(b)
    for i, c in enumerate(fcols):
        manual = manual + F.lit(float(w[i])) * F.col(c)
    manual_p = F.lit(1.0) / (F.lit(1.0) + F.exp(-manual))
    out = (
        model.transform(train)
        .withColumn("_mp", manual_p)
        .withColumn(
            "_p",
            F.element_at(_v2a(F.col("probability")), 2),
        )
        .filter(F.abs(F.col("_p") - F.col("_mp")) > tol)
        .select("doc_id")
    )
    both.unpersist()
    return out
