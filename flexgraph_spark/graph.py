"""M0 — derive the link graph from the source-code repository table.

Input (BASELINE.json input_hint): an Iceberg-style table
``(repo string, path string, commit string, lang string, content string)``.
Output: ``edges(src long, dst long)`` + ``vertices(vertex long, repo, path,
module)`` with deterministic vertex ids.

Everything here is pure column expressions (Catalyst-optimizable: the scan
reads only the columns each step needs; ``content`` is touched exactly once
at extraction). No Python UDFs anywhere.

Reference parity notes: the reference ingests ready-made edge/adjacency text
files (/root/reference/src/main/java/flexgraph/io/UnweightedEdgeListInputFormat.java:33-34);
this engine additionally *derives* edges from file contents, per the target
spec. Text-format readers for the reference's two formats live in
``read_edge_list_text`` / ``read_adjacency_list_text`` below.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Import/include patterns per language (FIXTURES.md F2 syntax; real-world
# patterns are a superset — the extraction is a pluggable dict).
LINK_PATTERNS = {
    "py": r"from\s+([\w\.]+)\s+import",
    "java": r"import\s+([\w\.]+)\s*;",
    "c": r"#include\s+\"([\w/\.]+)\.h\"",
}

TARGET_KEYS_PER_BUCKET = 2_000_000  # two-level rank: keys sorted per bucket task


def module_expr(repo: Column, path: Column) -> Column:
    """Canonical dotted module key for a file: repo.mod.file (drops the
    leading source dir and the extension, '/' -> '.')."""
    trimmed = F.regexp_replace(path, r"^[^/]+/", "")  # drop "src/"
    no_ext = F.regexp_replace(trimmed, r"\.[A-Za-z0-9]+$", "")
    return F.concat_ws(".", repo, F.regexp_replace(no_ext, "/", "."))


def extract_links(files: DataFrame) -> DataFrame:
    """(repo, path, lang, content) -> (src_module, dst_module), one row per link.

    Vectorized: a single ``regexp_extract_all`` chosen by ``lang`` via
    CASE/WHEN, then explode. C includes are normalized to dotted modules.
    """
    chain = F.array().cast("array<string>")
    for lang, p in LINK_PATTERNS.items():
        chain = F.when(
            F.col("lang") == lang, F.regexp_extract_all("content", F.lit(p), F.lit(1))
        ).otherwise(chain)
    out = (
        files.select(
            module_expr(F.col("repo"), F.col("path")).alias("src_module"),
            F.explode(chain).alias("raw"),
        )
        .select(
            "src_module",
            F.regexp_replace("raw", "/", ".").alias("dst_module"),
        )
    )
    return out


def assign_ids(
    keys: DataFrame, key_col: str = "module", strategy: str = "rank",
    num_buckets: int | None = None,
) -> DataFrame:
    """Deterministic vertex ids for a distinct-key DataFrame.

    * ``rank`` (default): contiguous [0, n) ids via scalable two-level dense
      rank — hash-bucket the keys, rank within each bucket (one task per
      bucket, uniform by hash), offset by cumulative bucket counts. The
      bucket count is sized from the key count (~TARGET_KEYS_PER_BUCKET per
      bucket task) and the bucket→offset map stays a DataFrame (broadcast
      join) — nothing key-proportional ever reaches the driver, so this
      holds at 10^12 keys.
    * ``hash``: ``xxhash64(key)`` — zero-shuffle; caller must audit
      collisions (``distinct ids == distinct keys``). Right at 10^12 keys
      only with a collision-resolution pass; default stays ``rank``.
    """
    keys = keys.select(key_col).distinct()
    if strategy == "hash":
        return keys.withColumn("vertex", F.xxhash64(key_col))
    if num_buckets is None:
        n_keys = keys.count()
        num_buckets = max(32, min(1 << 20, -(-n_keys // TARGET_KEYS_PER_BUCKET)))
    bucketed = keys.withColumn(
        "_bucket", F.pmod(F.xxhash64(key_col), F.lit(num_buckets)).cast("int")
    )
    counts = bucketed.groupBy("_bucket").agg(F.count("*").alias("_cnt"))
    # prefix-sum of bucket counts -> per-bucket id offset; the window runs
    # over #buckets rows (≤ 2^20), one task — never over the keys themselves
    off_w = Window.orderBy("_bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_bucket", F.coalesce(F.sum("_cnt").over(off_w), F.lit(0)).alias("_off")
    )
    w = Window.partitionBy("_bucket").orderBy(key_col)
    return (
        bucketed.withColumn("_local", F.row_number().over(w) - 1)
        .join(F.broadcast(offsets), "_bucket")
        .select(key_col, (F.col("_off") + F.col("_local")).cast("long").alias("vertex"))
    )


def remap_contiguous(edges: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Relabel an arbitrary-id edge list onto contiguous ids [0, n).

    The blocked CSR engine (flexgraph_spark.blocks) follows the reference's
    numVertices = maxId+1 rule (GraphPrepartitioningReducer.java:84-101) and
    allocates dense per-block arrays, so sparse/holey id spaces must be
    compacted first — exactly what the reference's prepartitioning assumes
    of its inputs. Returns (edges', mapping) where mapping = (orig, vertex);
    the relabeling is an arbitrary deterministic bijection (graph algorithms
    are label-invariant; map results back through ``mapping``).
    """
    verts = (
        edges.select(F.col("src").alias("orig"))
        .union(edges.select(F.col("dst").alias("orig")))
        .distinct()
    )
    mapping = assign_ids(verts, "orig")
    others = [c for c in edges.columns if c not in ("src", "dst")]
    remapped = (
        edges.join(mapping.withColumnRenamed("orig", "src"), "src")
        .withColumnRenamed("vertex", "_new_src")
        .join(
            mapping.withColumnRenamed("orig", "dst").withColumnRenamed("vertex", "_new_dst"),
            "dst",
        )
        .select(
            F.col("_new_src").alias("src"), F.col("_new_dst").alias("dst"), *others
        )
    )
    return remapped, mapping


def derive_graph(files: DataFrame, id_strategy: str = "rank") -> tuple[DataFrame, DataFrame]:
    """Full M0 pipeline: files -> (vertices, edges).

    vertices: (vertex long, module, repo, path, lang)
    edges:    (src long, dst long) — src imports dst; links to modules that
              don't resolve to a known file are dropped (dangling imports).
    """
    file_keys = files.select(
        "repo", "path", "lang", module_expr(F.col("repo"), F.col("path")).alias("module")
    )
    ids = assign_ids(file_keys.select("module"), "module", id_strategy)
    vertices = file_keys.join(ids, "module")
    links = extract_links(files)
    edges = (
        links.join(ids.withColumnRenamed("vertex", "src"), links.src_module == ids.module)
        .drop("module")
        .join(
            ids.withColumnRenamed("vertex", "dst").withColumnRenamed("module", "m2"),
            F.col("dst_module") == F.col("m2"),
        )
        .select("src", "dst")
        .distinct()
    )
    return vertices.select("vertex", "module", "repo", "path", "lang"), edges


def content_fingerprint(files: DataFrame) -> DataFrame:
    """Per-row sha256 of content (the BASELINE.json row invariant)."""
    return files.select("repo", "path", "commit", F.sha2(F.col("content"), 256).alias("sha256"))


def verify_content_invariant(derived: DataFrame, source: DataFrame) -> int:
    """Count rows whose content sha256 differs between two tables (0 == pass)."""
    a = content_fingerprint(derived).withColumnRenamed("sha256", "sha_a")
    b = content_fingerprint(source).withColumnRenamed("sha256", "sha_b")
    joined = a.join(b, ["repo", "path", "commit"], "full")
    return joined.filter(
        F.col("sha_a").isNull()
        | F.col("sha_b").isNull()
        | (F.col("sha_a") != F.col("sha_b"))
    ).count()


def symmetrize(edges: DataFrame) -> DataFrame:
    """edges ∪ reversed(edges), distinct — required for true WCC (the
    reference's cc.sh never symmetrizes; SURVEY.md §3.2 flags that).

    Extra columns (weight, ...) ride on BOTH directions — the reference's
    WeightedGraphPrepartitioning UndirectedMapper keeps weights on reversed
    edges the same way; dropping them here made ``--expand undirected`` on
    a weighted edge list silently run unit-weight SSSP. Callers whose
    semantics need pure (src, dst) pairs (CC, LP: parallel weighted edges
    must not double-count) select those columns before calling."""
    others = [c for c in edges.columns if c not in ("src", "dst")]
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"), *others)
    return edges.select("src", "dst", *others).union(rev).distinct()


def degrees(edges: DataFrame, direction: str = "out", weighted: bool = False) -> DataFrame:
    """(vertex, degree) — exact counts, map-side partially aggregated by
    Catalyst (subsumes the reference's combiner,
    UnweightedGraphPrepartitioning.java:150-167).

    ``weighted=True`` sums the ``weight`` column instead of counting edges —
    the reference's {un,}weighted × {in,out,both} matrix
    (DegreeComputation.java:106-198). Weighted output column is ``wdegree``
    (double); unweighted stays ``degree`` (long)."""
    if weighted and "weight" not in edges.columns:
        raise ValueError("weighted degrees need a 'weight' column")
    agg = (
        F.sum("weight").alias("wdegree") if weighted else F.count("*").alias("degree")
    )
    if direction == "out":
        return edges.groupBy(F.col("src").alias("vertex")).agg(agg)
    if direction == "in":
        return edges.groupBy(F.col("dst").alias("vertex")).agg(agg)
    cols = ["src", "dst", "weight"] if weighted else ["src", "dst"]
    e = edges.select(*cols)
    both = e.select(F.col("src").alias("vertex"), *cols[2:]).union(
        e.select(F.col("dst").alias("vertex"), *cols[2:])
    )
    return both.groupBy("vertex").agg(agg)


def expand_direction(edges: DataFrame, mode: str = "directed") -> DataFrame:
    """The reference's direction-expansion modes
    (UnweightedGraphPrepartitioning.java:105-148): ``directed`` (as-is),
    ``undirected`` (symmetrize), ``transposed`` (swap src/dst)."""
    if mode == "directed":
        return edges
    if mode == "undirected":
        return symmetrize(edges)
    if mode == "transposed":
        others = [c for c in edges.columns if c not in ("src", "dst")]
        return edges.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), *others
        )
    raise ValueError(f"unknown direction mode {mode!r}")


def read_edge_list_text(spark, path: str, weighted: bool = False, sep: str = "\t") -> DataFrame:
    """Reference edge-list text format: SRC\\tDST[\\tWEIGHT]
    (UnweightedEdgeListInputFormat.java:33-34)."""
    df = spark.read.csv(path, sep=sep, comment="#")
    cols = [F.col("_c0").cast("long").alias("src"), F.col("_c1").cast("long").alias("dst")]
    if weighted:
        cols.append(F.col("_c2").cast("double").alias("weight"))
    return df.select(*cols)


def read_adjacency_list_text(
    spark, path: str, weighted: bool = False,
    field_sep: str = "\t", list_sep: str = " ",
) -> DataFrame:
    """Reference adjacency-list format: SRC\\tDEGREE DST1 DST2 ...
    (UnweightedAdjacencyListInputFormat.java:34-35); weighted interleaves
    DST WEIGHT pairs. Both delimiters are configurable (the reference's
    FIELD_SEPARATOR / LIST_SEPARATOR, Constants.java:19-21). Parsed with
    pure column expressions."""
    import re as _re

    lines = spark.read.text(path)
    parts = F.split(F.col("value"), _re.escape(field_sep))
    rest = F.split(F.element_at(parts, 2), _re.escape(list_sep))
    base = lines.select(
        F.element_at(parts, 1).cast("long").alias("src"),
        F.slice(rest, 2, F.element_at(rest, 1).cast("int") * (2 if weighted else 1)).alias("items"),
    )
    if not weighted:
        return base.select("src", F.explode("items").alias("_d")).select(
            "src", F.col("_d").cast("long").alias("dst")
        )
    # interleaved dst/weight pairs -> zip even/odd positions
    idx = F.sequence(F.lit(0), (F.size("items") / 2).cast("int") - 1)
    return base.select(
        "src",
        F.explode(
            F.transform(
                idx,
                lambda i: F.struct(
                    F.get("items", i * 2).cast("long").alias("dst"),
                    F.get("items", i * 2 + 1).cast("double").alias("weight"),
                ),
            )
        ).alias("e"),
    ).select("src", "e.dst", "e.weight")


def bipartite_projection(
    edges: DataFrame,
    side: str = "src",
    max_fanout: int | None = None,
    min_weight: int = 1,
) -> DataFrame:
    """Project a bipartite ``(src, dst)`` edge list onto one side:
    ``(a, b, weight)`` with ``a < b`` and weight = number of opposite-side
    vertices the two share (co-occurrence / co-citation graph — suppliers
    sharing parts, pages sharing outlinks, repos sharing imports).

    Scale: the pair fan-out through an opposite-side vertex of degree d is
    d(d−1)/2, so hubs dominate quadratically — ``max_fanout`` drops
    opposite-side vertices above a degree cap BEFORE the self-join (same
    principle as link_prediction's bridge cap: a shared neighbor with
    10⁶ co-members tells you ~nothing about any pair). With the cap, the
    join output is bounded by Σ_{d ≤ cap} d² and the groupBy shuffles
    uniform (a, b) pair keys; ``min_weight`` prunes the long 1-share tail
    at the aggregate, after map-side combine.
    """
    if side not in ("src", "dst"):
        raise ValueError(f"side must be 'src' or 'dst', got {side!r}")
    key, other = ("dst", "src") if side == "src" else ("src", "dst")
    adj = edges.select(F.col(other).alias("m"), F.col(key).alias("k")).distinct()
    if max_fanout is not None:
        ok = (
            adj.groupBy("k").agg(F.count("*").alias("fanout"))
            .where(F.col("fanout") <= max_fanout)
            .select("k")
        )
        adj = adj.join(ok, "k")
    left = adj.select("k", F.col("m").alias("a"))
    right = adj.select("k", F.col("m").alias("b"))
    return (
        left.join(right, "k")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").cast("long").alias("weight"))
        .where(F.col("weight") >= min_weight)
    )


def contract_graph(
    edges: DataFrame,
    mapping: DataFrame,
    drop_self: bool = True,
) -> DataFrame:
    """Quotient (contracted) graph under a vertex → label mapping: every
    edge (src, dst[, weight]) becomes (label(src), label(dst)) and parallel
    edges aggregate to one row with ``n_edges`` (count) and ``weight``
    (sum; = count when the input is unweighted). ``mapping`` is
    (vertex, label) — a CC/LP/star result, a module table, any rollup.
    Unmapped endpoints keep their own id as label (coalesce), so partial
    mappings contract only the covered region.

    The file→module→repo rollup: contract the file link graph by module,
    then by repo, and PageRank each level — all one shuffle per level
    (two label joins + one aggregate; the label join is a plain hash join
    that AQE skew-splits when one label covers a hub's worth of
    vertices).
    """
    m = mapping.select(F.col("vertex"), F.col("label"))
    w = (
        F.col("weight").cast("double")
        if "weight" in edges.columns
        else F.lit(1.0)
    )
    e = edges.select("src", "dst", w.alias("w"))
    out = (
        e.join(m.withColumnRenamed("vertex", "src")
               .withColumnRenamed("label", "src_label"), "src", "left")
        .join(m.withColumnRenamed("vertex", "dst")
              .withColumnRenamed("label", "dst_label"), "dst", "left")
        .select(
            F.coalesce("src_label", "src").alias("src"),
            F.coalesce("dst_label", "dst").alias("dst"),
            "w",
        )
    )
    if drop_self:
        out = out.where(F.col("src") != F.col("dst"))
    return out.groupBy("src", "dst").agg(
        F.count("*").cast("long").alias("n_edges"),
        F.sum("w").alias("weight"),
    )


REPO_TABLE_COLUMNS = ("repo", "path", "commit", "lang", "content")


def read_repo_table(spark, source: str, fmt: str = "auto"):
    """Load the (repo, path, commit, lang, content) source table the link
    graph derives from — the north-rule input is an ICEBERG table of
    source-code repositories, so ``fmt='iceberg'`` reads through
    ``spark.read.format('iceberg')`` (catalog identifier like
    ``cat.db.repo_files`` or a table path; needs the iceberg-spark
    runtime on the cluster classpath — Iceberg scans give the engine
    snapshot isolation, hidden-partition pruning, and metadata-only
    planning for free). ``fmt='parquet'`` reads a parquet directory.
    ``fmt='auto'`` tries Iceberg first and falls back to parquet when the
    Iceberg data source is not on the classpath (this sandbox) or the
    identifier is not an Iceberg table. Validates the five required
    columns either way; extra columns pass through.
    """
    def _load_iceberg():
        return spark.read.format("iceberg").load(source)

    def _load_parquet():
        return spark.read.parquet(source)

    if fmt == "iceberg":
        df = _load_iceberg()
    elif fmt == "parquet":
        df = _load_parquet()
    elif fmt == "auto":
        try:
            df = _load_iceberg()
        except Exception:
            df = _load_parquet()
    else:
        raise ValueError(f"unknown repo-table format {fmt!r}")
    missing = [c for c in REPO_TABLE_COLUMNS if c not in df.columns]
    if missing:
        raise ValueError(
            f"repo table at {source!r} lacks required columns {missing} "
            f"(expected {list(REPO_TABLE_COLUMNS)})"
        )
    return df


def graph_stats(edges: DataFrame) -> DataFrame:
    """One-row global link-graph profile — the cheap health dashboard a
    crawl/link pipeline runs before anything iterative:

    * ``n_vertices`` / ``n_edges`` of the simple digraph (self-loops and
      duplicates dropped),
    * ``reciprocity`` — fraction of edges whose reverse edge also exists
      (mutual-link rate; near 1 on social graphs, near 0 on strict
      hierarchies),
    * ``assortativity`` — Pearson correlation of (out-degree(src),
      in-degree(dst)) over edges (positive: hubs link to hubs).

    Scale shape: two degree aggregations (map-side combined), one
    self-join on the edge key for reciprocity (hash join, uniform keys),
    one corr aggregate — all single-pass, no iteration, no collect.
    """
    e = edges.select("src", "dst").where(F.col("src") != F.col("dst")).distinct()
    verts = (
        e.select(F.col("src").alias("v"))
        .union(e.select(F.col("dst").alias("v")))
        .distinct()
    )
    od = e.groupBy("src").agg(F.count("*").alias("odeg"))
    idg = e.groupBy("dst").agg(F.count("*").alias("ideg"))
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    base = (
        e.join(od, "src")
        .join(idg, "dst")
        .join(rev.withColumn("recip", F.lit(1)), ["src", "dst"], "left")
    )
    agg = base.agg(
        F.count("*").alias("n_edges"),
        F.sum(F.coalesce("recip", F.lit(0))).alias("_n_recip"),
        F.corr(F.col("odeg").cast("double"), F.col("ideg").cast("double")).alias(
            "_assort"
        ),
    )
    nv = verts.agg(F.count("*").alias("n_vertices"))
    return nv.crossJoin(agg).select(
        "n_vertices",
        "n_edges",
        F.round(F.col("_n_recip") / F.col("n_edges"), 6).alias("reciprocity"),
        F.round("_assort", 6).alias("assortativity"),
    )


def rmat_edges(
    spark,
    scale: int,
    n_edges: int,
    a: float = 0.57,
    b: float = 0.19,
    c: float = 0.19,
    salt: str = "rmat",
    drop_self_loops: bool = False,
    dedup: bool = False,
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic distributed R-MAT / stochastic-Kronecker graph
    generator (Chakrabarti, Zhan & Faloutsos, SDM 2004 — the power-law
    generator behind Graph500 and the PEGASUS-lineage benchmarks): each
    edge recursively picks one of the four adjacency-matrix quadrants
    with probabilities (a, b, c, d = 1-a-b-c) for ``scale`` levels,
    yielding a 2^scale-vertex graph with a skewed, community-structured
    degree distribution.

    Randomness is a pure function of (salt, edge_id, level): the level's
    60-bit ``sketches.sha_long`` draw is compared against INTEGER
    thresholds floor(cum_prob * 2^60) precomputed in exact Python — no
    float comparisons anywhere, so DuckDB replays the generator
    bit-for-bit and the result is independent of partitioning, executor
    count, and retries (safe under speculative execution).

    Scale story: ``spark.range(n_edges)`` is an embarrassingly parallel
    map-only plan — 2 * scale sha256 expressions per row inside one
    whole-stage-codegen span, zero shuffles, zero driver state — so a
    10^12-edge benchmark graph generates at aggregate-hash throughput on
    any cluster size. Raw R-MAT output keeps duplicate edges and self
    loops (the reproducible-count face); ``dedup`` / ``drop_self_loops``
    shuffle once on (src, dst) when a simple graph is wanted.

    Returns (eid long, src long, dst long) with vertices in [0, 2^scale).
    """
    if not (0 < a and 0 <= b and 0 <= c and a + b + c <= 1):
        raise ValueError("quadrant probabilities must be a valid distribution")
    if scale < 1 or scale > 62:
        raise ValueError("scale must be in [1, 62]")
    from flexgraph_spark.sketches import sha_long

    two60 = 1 << 60
    ta = int(a * two60)
    tb = int((a + b) * two60)
    tc = int((a + b + c) * two60)
    df = spark.range(n_edges).select(F.col("id").alias("eid"))
    if num_partitions:
        df = df.repartition(num_partitions)
    src = F.lit(0).cast("long")
    dst = F.lit(0).cast("long")
    for lvl in range(scale):
        h = sha_long(
            F.concat_ws(":", F.col("eid").cast("string"), F.lit(str(lvl))), salt
        )
        bit = 1 << (scale - 1 - lvl)
        src = src + F.when(h >= tb, F.lit(bit)).otherwise(F.lit(0))
        dst = dst + F.when(
            ((h >= ta) & (h < tb)) | (h >= tc), F.lit(bit)
        ).otherwise(F.lit(0))
    out = df.select("eid", src.alias("src"), dst.alias("dst"))
    if drop_self_loops:
        out = out.filter(F.col("src") != F.col("dst"))
    if dedup:
        out = out.groupBy("src", "dst").agg(F.min("eid").alias("eid")).select(
            "eid", "src", "dst"
        )
    return out
