"""Training-data pipeline operator tests over the driver's documents /
embeddings tables plus synthetic corner cases."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from flexgraph_spark import textops

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def _mini_docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (3, "the quick brown fox jumped over the lazy dog"),  # near dup
        (4, "completely different content about spark engines"),
        (5, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicates(spark):
    df = _mini_docs(spark)
    dups = textops.exact_duplicates(df).collect()
    assert len(dups) == 1
    assert dups[0]["dup_count"] == 2
    assert dups[0]["doc_ids"] == [1, 2]
    kept = textops.dedup_exact(df)
    assert kept.count() == 4
    assert kept.filter("doc_id = 2").count() == 0  # lowest doc_id kept


def test_token_stats(spark):
    df = _mini_docs(spark)
    st = {r["doc_id"]: r for r in textops.token_stats(df).collect()}
    assert st[1]["n_tokens"] == 9
    assert st[5]["n_tokens"] == 0
    assert st[1]["n_chars"] == len("the quick brown fox jumps over the lazy dog")


def test_quality_scores(spark):
    df = spark.createDataFrame(
        [(1, "Hello, World! 123\nsecond line")], "doc_id long, text string"
    )
    r = textops.quality_scores(df).first()
    assert r["n_chars"] == 29
    assert r["punct_ratio"] == pytest.approx(2 / 29)  # ',' and '!'
    assert r["digit_ratio"] == pytest.approx(3 / 29)
    assert r["upper_ratio"] == pytest.approx(2 / 29)
    assert r["mean_line_len"] == pytest.approx(29 / 2)


def test_language_id(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog sat in that house for a while"),
            (2, "der Hund und die Katze ist nicht mit dem Mann"),
            (3, "xyzzy qwerty"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["lang_pred"] for r in textops.language_id(df).collect()}
    assert got[1] == "en"
    assert got[2] == "de"
    assert got[3] == "unknown"


def test_minhash_near_duplicates(spark):
    df = _mini_docs(spark)
    nd = textops.minhash_near_duplicates(df, threshold=0.6)
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in nd.collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0  # exact dup
    assert (1, 3) in pairs and pairs[(1, 3)] > 0.6  # near dup
    assert not any(4 in p for p in pairs)


def test_minhash_against_bruteforce_jaccard(spark, docs):
    """LSH recall on real documents: every pair LSH finds must have true
    Jaccard >= threshold (precision is enforced by the verify step; here we
    check the verify numbers against a brute-force python computation)."""
    sample = docs.limit(60)
    nd = textops.minhash_near_duplicates(sample, threshold=0.5).collect()
    rows = {r["doc_id"]: r["text"] for r in sample.collect()}

    def jac(a, b, k=5):
        A = {a[i : i + k] for i in range(max(len(a) - k + 1, 1))}
        B = {b[i : i + k] for i in range(max(len(b) - k + 1, 1))}
        return len(A & B) / max(len(A | B), 1)

    import re

    for r in nd:
        ta = re.sub(r"\s+", " ", rows[r["doc_a"]].lower())
        tb = re.sub(r"\s+", " ", rows[r["doc_b"]].lower())
        assert jac(ta, tb) == pytest.approx(r["jaccard"], abs=1e-9)
        assert r["jaccard"] >= 0.5


def test_simhash_determinism_and_neardup(spark):
    df = _mini_docs(spark)
    s1 = {r["doc_id"]: r["simhash"] for r in textops.simhash(df).collect()}
    s2 = {r["doc_id"]: r["simhash"] for r in textops.simhash(df).collect()}
    assert s1 == s2  # deterministic across runs
    assert s1[1] == s1[2]  # identical docs → identical simhash
    nd = textops.simhash_near_duplicates(df, max_hamming=16)
    pairs = {(r["doc_a"], r["doc_b"]) for r in nd.collect()}
    assert (1, 2) in pairs


def test_doc_fingerprint(spark):
    df = _mini_docs(spark)
    fp = {r["doc_id"]: r["fingerprint"] for r in textops.doc_fingerprint(df).collect()}
    assert fp[1] == fp[2]
    assert fp[1] != fp[4]


def test_cosine_topk_bruteforce_vs_numpy(spark, embeddings):
    queries = embeddings.filter("vec_id < 3")
    got = textops.cosine_topk_bruteforce(embeddings, queries, top_k=5).collect()
    emb = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in embeddings.collect()}

    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    for qid in range(3):
        expected = sorted(
            ((cos(emb[qid], v), k) for k, v in emb.items() if k != qid),
            key=lambda t: (-t[0], t[1]),
        )[:5]
        mine = sorted(
            [(r["rank"], r["neighbor_id"], r["score"]) for r in got if r["query_id"] == qid]
        )
        for (rank, nid, score), (escore, eid) in zip(mine, expected):
            assert nid == eid
            assert score == pytest.approx(escore, abs=1e-9)


def test_cosine_topk_lsh_recall(spark, embeddings):
    queries = embeddings.filter("vec_id < 10")
    brute = textops.cosine_topk_bruteforce(embeddings, queries, top_k=5)
    # this dataset's true top-5 neighbors are weak (mean cosine ~0.32), so
    # LSH needs short codes + many tables: expected recall ~0.9 at 4x16
    approx = textops.cosine_topk_lsh(
        embeddings, queries, top_k=5, num_planes=4, num_tables=16
    )
    b = {(r["query_id"], r["neighbor_id"]) for r in brute.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(a & b) / len(b)
    assert recall >= 0.6, recall


def test_media_feature_plumbing(spark):
    rows = [
        (1, "image", bytearray(b"\x00\x01\x02\x03" * 10), {"w": "2"}),
        (2, "audio", bytearray(b""), {}),
    ]
    media = spark.createDataFrame(rows, textops.MEDIA_SCHEMA)
    feats = textops.extract_media_features(media, feature_dim=4).collect()
    by_id = {r["media_id"]: r for r in feats}
    assert by_id[1]["n_bytes"] == 40
    assert len(by_id[1]["feature"]) == 4
    assert sum(by_id[1]["feature"]) == pytest.approx(1.0)
    assert by_id[2]["feature"] == [0.0, 0.0, 0.0, 0.0]
    with pytest.raises(Exception):
        textops.extract_media_features(media, real_decode=True).collect()


def test_jaccard_similarity_join_equals_bruteforce(spark, docs):
    """Prefix-filtered exact join must return the IDENTICAL pair set as the
    all-pairs compare (the lossless-candidate-generation guarantee)."""
    sample = docs.limit(80).cache()
    t = 0.25
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in textops.jaccard_similarity_join(sample, threshold=t).collect()
    }
    sh = textops.shingle_table(sample, "text", 5)
    rows = {r["doc_id"]: set(r["hs"]) for r in sh.collect()}
    sh.unpersist()
    exp = {}
    ids = sorted(rows)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(rows[a] & rows[b])
            j = inter / max(len(rows[a] | rows[b]), 1)
            if j >= t:
                exp[(a, b)] = j
    assert set(got) == set(exp)
    for k in exp:
        assert abs(got[k] - exp[k]) < 1e-12
    sample.unpersist()


def test_minhash_releases_caches(spark):
    """Near-dup pipelines must not leak persisted shingle tables."""
    df = _mini_docs(spark)
    before = len(spark.sparkContext._jsc.getPersistentRDDs())
    textops.minhash_near_duplicates(df, threshold=0.5).count()
    textops.jaccard_similarity_join(df, threshold=0.5).count()
    after = len(spark.sparkContext._jsc.getPersistentRDDs())
    assert after <= before + 2  # localCheckpoint blocks only, no shingle caches


def _emb_with_dups(spark, embeddings, n_dup=20, mix=0.15):
    """Originals + near-duplicate copies (id+100000): v' = v + mix*v_next."""
    base = embeddings.select("vec_id", "embedding")
    nxt = base.select((F.col("vec_id") - 1).alias("vec_id"),
                      F.col("embedding").alias("other"))
    dups = (
        base.filter(F.col("vec_id") < n_dup)
        .join(nxt, "vec_id")
        .select(
            (F.col("vec_id") + 100000).alias("vec_id"),
            F.zip_with("embedding", "other",
                       lambda a, b: (a + F.lit(mix) * b).cast("float")
                       ).alias("embedding"),
        )
    )
    return base.unionByName(dups)


def test_embedding_near_duplicates(spark, embeddings):
    vecs = _emb_with_dups(spark, embeddings).cache()
    got = textops.embedding_near_duplicates(
        vecs, threshold=0.95, num_planes=8, num_tables=6
    ).collect()
    rows = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
            for r in vecs.collect()}

    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    # precision: every emitted pair really is >= threshold (exact verify)
    for r in got:
        assert cos(rows[r["vec_id_a"]], rows[r["vec_id_b"]]) >= 0.95
        assert abs(cos(rows[r["vec_id_a"]], rows[r["vec_id_b"]]) - r["cosine"]) < 1e-6
    # recall vs numpy all-pairs at the same threshold (deterministic seed)
    ids = sorted(rows)
    exp = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if cos(rows[a], rows[b]) >= 0.95:
                exp.add((a, b))
    found = {(r["vec_id_a"], r["vec_id_b"]) for r in got}
    assert len(exp) >= 10  # the planted dups exist
    assert len(found & exp) / len(exp) >= 0.8
    vecs.unpersist()


def test_ivf_topk_exact_when_probing_all(spark, embeddings):
    """nprobe == n_centroids probes every inverted list -> IVF must equal
    brute force exactly (gates assignment/probe/dedup/ranking plumbing)."""
    queries = embeddings.filter(F.col("vec_id") < 5)
    assigned, cents = textops.ivf_index(embeddings, n_centroids=8)
    ivf = textops.ivf_topk(assigned, cents, queries, top_k=5, nprobe=8)
    bf = textops.cosine_topk_bruteforce(embeddings, queries, 5)
    a = sorted((r["query_id"], r["rank"], r["neighbor_id"]) for r in ivf.collect())
    b = sorted((r["query_id"], r["rank"], r["neighbor_id"]) for r in bf.collect())
    assert a == b


def test_ivf_topk_recall(spark, embeddings):
    queries = embeddings.filter(F.col("vec_id") < 10)
    assigned, cents = textops.ivf_index(embeddings, n_centroids=16)
    ivf = textops.ivf_topk(assigned, cents, queries, top_k=5, nprobe=4)
    bf = textops.cosine_topk_bruteforce(embeddings, queries, 5)
    got = {(r["query_id"], r["neighbor_id"]) for r in ivf.collect()}
    exp = {(r["query_id"], r["neighbor_id"]) for r in bf.collect()}
    assert len(got & exp) / len(exp) >= 0.5  # deterministic given seed


def test_winnow_fingerprints(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog and runs away fast"),
        (2, "the quick brown fox jumps over the lazy dog and runs away fast"),
        (3, "PREFIX text here -- the quick brown fox jumps over the lazy dog and runs away fast -- SUFFIX"),
        (4, "zzzz completely unrelated content qqqq xxxx wwww yyyy vvvv"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fp = {r["doc_id"]: set(r["fps"]) for r in
          textops.winnow_fingerprints(df, k=8, window=4).collect()}
    assert fp[1] == fp[2]  # identical docs, identical fingerprints
    # winnowing guarantee: a shared substring >= k+window-1 chars yields a
    # shared fingerprint
    assert fp[1] & fp[3]
    assert not (fp[1] & fp[4])


def test_simhash_banding_complete_at_requested_hamming(spark, docs):
    """Chunk count is derived from max_hamming (pigeonhole: h+1 chunks),
    so the banded pair set must EQUAL the brute-force hamming join at the
    shipped bound (round 2's fixed 4x16 split silently missed pairs with
    hamming 4..12)."""
    sample = docs.limit(120).cache()
    h = 12
    sh = textops.simhash(sample)
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("ha"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("hb"))
    brute = (
        a.join(b, F.col("doc_a") < F.col("doc_b"))
        .filter(F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))) <= h)
    )
    exp = {(r["doc_a"], r["doc_b"]) for r in brute.collect()}
    got = {
        (r["doc_a"], r["doc_b"])
        for r in textops.simhash_near_duplicates(sample, max_hamming=h).collect()
    }
    assert got == exp
    sample.unpersist()


def test_simhash_rejects_insufficient_chunks(spark):
    df = _mini_docs(spark)
    with pytest.raises(ValueError, match="num_chunks"):
        textops.simhash_near_duplicates(df, max_hamming=12, num_chunks=4)


def test_lazy_mode_shares_shingle_table(spark):
    """Passing a prebuilt shingle table returns the lazy plan: results
    match the eager path and the caller's cache is the only persist."""
    df = _mini_docs(spark)
    eager = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in textops.minhash_near_duplicates(df, threshold=0.5).collect()
    }
    sh = textops.shingle_table(df, "text", 5)
    lazy = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in textops.minhash_near_duplicates(df, threshold=0.5, sh=sh).collect()
    }
    lazy_join = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in textops.jaccard_similarity_join(df, threshold=0.5, sh=sh).collect()
    }
    eager_join = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in textops.jaccard_similarity_join(df, threshold=0.5).collect()
    }
    sh.unpersist()
    assert lazy == eager
    assert lazy_join == eager_join


def test_media_real_decode_audio_wav(spark):
    """real_decode=True with the stdlib wave reader: a generated 16-bit PCM
    WAV decodes to a normalized |amplitude| histogram."""
    import io
    import math
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(8000)
        samples = np.array(
            [int(16000 * math.sin(i / 10.0)) for i in range(800)], dtype=np.int16
        )
        wf.writeframes(samples.tobytes())
    payload = buf.getvalue()
    media = spark.createDataFrame(
        [(1, "audio", bytearray(payload), {})], textops.MEDIA_SCHEMA
    )
    row = textops.extract_media_features(media, feature_dim=4, real_decode=True).first()
    assert row["n_bytes"] == len(payload)
    assert sum(row["feature"]) == pytest.approx(1.0)
    assert row["feature"][0] > 0  # low-amplitude bin populated


def test_media_real_decode_image_requires_pillow(spark):
    """Image decode resolves Pillow at runtime: with the lib absent the
    error names the dependency; with it present a real histogram appears."""
    try:
        import PIL  # noqa: F401
        have_pil = True
    except ImportError:
        have_pil = False
    media = spark.createDataFrame(
        [(1, "image", bytearray(b"not-a-png"), {})], textops.MEDIA_SCHEMA
    )
    if not have_pil:
        with pytest.raises(Exception, match="Pillow"):
            textops.extract_media_features(media, real_decode=True).collect()
    else:
        with pytest.raises(Exception):  # invalid payload still fails cleanly
            textops.extract_media_features(media, real_decode=True).collect()


def test_repetition_stats_handcrafted(spark):
    rows = [
        (1, "aa\naa\nbb"),          # 3 lines, 1 dup; chars 6, dup chars 2
        (2, "x y x y x y"),         # top bigram "x y" = 3 of 5
        (3, ""),                    # degenerate
        (4, "unique lines\nonly here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in textops.repetition_stats(df).collect()}
    assert got[1]["dup_line_frac"] == pytest.approx(1.0 / 3.0)
    assert got[1]["dup_line_char_frac"] == pytest.approx(2.0 / 6.0)
    assert got[2]["top_bigram_frac"] == pytest.approx(3.0 / 5.0)
    assert got[3]["dup_line_frac"] == 0.0
    assert got[3]["dup_line_char_frac"] == 0.0
    assert got[3]["top_bigram_frac"] == 0.0
    assert got[4]["dup_line_frac"] == 0.0
    assert got[4]["top_bigram_frac"] == pytest.approx(1.0 / 3.0)


def test_quality_filter_pass_and_fail(spark):
    ok = "This is a perfectly reasonable sentence with enough useful tokens inside."
    rows = [
        (1, ok),
        (2, "short text"),                                   # < min_tokens
        (3, "!!! ??? ,,, " * 20),                            # punct ratio
        (4, "1234 5678 9012 " * 20),                         # digit ratio
        (5, ("same line\n" * 10) + ok),                      # dup lines
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(r["doc_id"] for r in textops.quality_filter(df).collect())
    assert got == [1]


def test_chunk_documents_windows(spark):
    text = " ".join(f"t{i}" for i in range(11))  # 11 tokens
    df = spark.createDataFrame([(1, text), (2, "a b"), (3, "")],
                               "doc_id long, text string")
    out = textops.chunk_documents(df, chunk_tokens=4, overlap=1)
    rows = sorted(
        ((r["doc_id"], r["chunk_id"], r["n_chunk_tokens"], r["chunk_text"])
         for r in out.collect())
    )
    # doc 1: step 3, nc = ceil(10/3) = 4 -> starts 0,3,6,9; last has 2 tokens
    d1 = [r for r in rows if r[0] == 1]
    assert [r[2] for r in d1] == [4, 4, 4, 2]
    assert d1[0][3] == "t0 t1 t2 t3"
    assert d1[1][3] == "t3 t4 t5 t6"
    assert d1[3][3] == "t9 t10"
    # overlap: consecutive windows share exactly one token
    assert d1[0][3].split()[-1] == d1[1][3].split()[0]
    # doc 2: single short chunk; doc 3 (empty): no chunks
    assert [r for r in rows if r[0] == 2] == [(2, 0, 2, "a b")]
    assert not [r for r in rows if r[0] == 3]


def test_chunk_documents_rejects_bad_overlap(spark):
    df = _mini_docs(spark)
    with pytest.raises(ValueError):
        textops.chunk_documents(df, chunk_tokens=4, overlap=4)


def test_bm25_golden_hand_computed(spark):
    """Three tiny docs, two-term query — score recomputed by hand with the
    same Okapi formula (k1=1.2, b=0.75)."""
    import math

    docs = spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "cherry cherry cherry date"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r.bm25
        for r in textops.bm25_rank(docs, "apple cherry", topk=10).collect()
    }
    n, avgdl = 3, 3.0
    k1, b = 1.2, 0.75

    def sc(tf, dl, dft):
        idf = math.log(1 + (n - dft + 0.5) / (dft + 0.5))
        return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    assert out[1] == round(sc(2, 3, 1), 6)          # apple only
    assert out[2] == round(sc(1, 2, 2), 6)          # cherry only
    assert out[3] == round(sc(3, 4, 2), 6)          # cherry only
    # doc with no query terms is excluded
    out2 = textops.bm25_rank(docs, "date", topk=10).collect()
    assert [r.doc_id for r in out2] == [3]


def test_bm25_rejects_empty_query(spark):
    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        textops.bm25_rank(docs, "!!! ???")


def test_tfidf_top_terms_golden(spark):
    """tf-idf with smooth idf; the doc-frequent term ranks below the rare
    one even at equal tf; ties break by term ascending."""
    import math

    docs = spark.createDataFrame(
        [
            (1, "common rare1 common"),
            (2, "common rare2"),
            (3, "common other"),
        ],
        "doc_id long, text string",
    )
    out = textops.tfidf_top_terms(docs, per_doc_k=2)
    rows = {(r.doc_id, r.rank): (r.term, r.tfidf, r.tf) for r in out.collect()}

    def idf(dft):
        return math.log((3 + 1) / (dft + 1)) + 1

    # doc 1: common tf=2 df=3 -> 2*idf(3); rare1 tf=1 df=1 -> idf(1)
    assert rows[(1, 1)] == ("common", round(2 * idf(3), 6), 2)
    assert rows[(1, 2)] == ("rare1", round(idf(1), 6), 1)
    # doc 2: rare2 beats common (idf(1) > idf(3))
    assert rows[(2, 1)][0] == "rare2"
    assert rows[(2, 2)][0] == "common"


def test_semdedup_k1_matches_bruteforce(spark, embeddings):
    """n_clusters=1 (exact face): keep/dup_of/max_cosine must equal the
    NumPy all-pairs greedy keep rule exactly."""
    vecs = _emb_with_dups(spark, embeddings).cache()
    got = {r["vec_id"]: r for r in
           textops.semdedup(vecs, n_clusters=1, threshold=0.95).collect()}
    rows = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
            for r in vecs.collect()}

    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    ids = sorted(rows)
    n_dropped = 0
    for j, b in enumerate(ids):
        lower = [(a, cos(rows[a], rows[b])) for a in ids[:j]
                 if cos(rows[a], rows[b]) >= 0.95]
        r = got[b]
        if lower:
            n_dropped += 1
            assert not r["keep"]
            assert r["dup_of"] == min(a for a, _ in lower)
            assert r["max_cosine"] == pytest.approx(
                max(c for _, c in lower), abs=1e-9)
        else:
            assert r["keep"] and r["dup_of"] is None and r["max_cosine"] is None
    assert n_dropped >= 20  # all planted dups are dropped
    vecs.unpersist()


def test_semdedup_clustered_recall_and_containment(spark, embeddings):
    """k-means mode: planted near-identical copies land in their base's
    cluster (same nearest centroid) and are dropped with dup_of = the base
    id; clustered drops are a subset of exact-face drops."""
    vecs = _emb_with_dups(spark, embeddings).cache()
    k8 = {r["vec_id"]: r for r in
          textops.semdedup(vecs, n_clusters=8, threshold=0.95).collect()}
    k1_dropped = {r["vec_id"] for r in
                  textops.semdedup(vecs, n_clusters=1, threshold=0.95).collect()
                  if not r["keep"]}
    dropped8 = {v for v, r in k8.items() if not r["keep"]}
    assert dropped8 <= k1_dropped
    # every planted copy (id+100000) is dropped onto its base
    planted = [v for v in k8 if v >= 100000]
    assert len(planted) == 20
    for v in planted:
        assert not k8[v]["keep"]
        assert k8[v]["dup_of"] == v - 100000
        assert k8[v]["max_cosine"] >= 0.95
    # kept rows carry their cluster id; one row per input vector
    assert len(k8) == vecs.count()
    vecs.unpersist()


def test_duplicated_spans_exact_counts(spark):
    """Hand-built corpus: cross-doc 5-gram mass counted exactly; within-doc
    repeats alone don't count (min_docs=2 distinct docs); short docs get
    n_grams=0 and frac 0; tokenization lowercases and collapses whitespace."""
    docs = spark.createDataFrame(
        [
            (1, "a b c d e f"),
            (2, "A  B c d\te x"),     # case/whitespace-normalized match
            (3, "z z z z z z z"),      # 3 positions of the same gram, 1 doc
            (4, "short one"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in
           textops.duplicated_spans(docs, n=5, min_docs=2).collect()}
    assert (got[1]["n_grams"], got[1]["n_dup"], got[1]["dup_frac"]) == (2, 1, 0.5)
    assert (got[2]["n_grams"], got[2]["n_dup"], got[2]["dup_frac"]) == (2, 1, 0.5)
    assert (got[3]["n_grams"], got[3]["n_dup"], got[3]["dup_frac"]) == (3, 0, 0.0)
    assert (got[4]["n_grams"], got[4]["n_dup"], got[4]["dup_frac"]) == (0, 0, 0.0)
    # min_docs=1 makes within-doc repetition count too
    got1 = {r["doc_id"]: r for r in
            textops.duplicated_spans(docs, n=5, min_docs=1).collect()}
    assert got1[3]["n_dup"] == 3


def test_paragraph_dedup_first_occurrence_wins(spark):
    """Global first (doc_id, pos) keeps; trimmed-body keying; blanks pass
    through; within-doc repeats dropped; text rebuilt in position order."""
    docs = spark.createDataFrame(
        [
            (1, "alpha\n\nshared\nalpha"),
            (2, "shared\nbeta"),
            (3, "  shared  \ngamma"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in textops.paragraph_dedup(docs).collect()}
    assert got[1]["n_paras"] == 4 and got[1]["n_dropped"] == 1
    assert got[1]["clean_text"] == "alpha\n\nshared"
    assert got[2]["n_paras"] == 2 and got[2]["n_dropped"] == 1
    assert got[2]["clean_text"] == "beta"
    # whitespace-padded copy still matches the trimmed key
    assert got[3]["n_dropped"] == 1 and got[3]["clean_text"] == "gamma"


def test_hard_negatives_excludes_same_label(spark, embeddings):
    """Every mined negative has a different label than its query and is
    the true cross-label cosine top-k (NumPy check)."""
    got = textops.hard_negatives(
        embeddings, embeddings.filter(F.col("vec_id") < 3), top_k=4
    ).collect()
    rows = {r["vec_id"]: (np.array(r["embedding"], dtype=np.float64), r["label"])
            for r in embeddings.collect()}
    by_q = {}
    for r in got:
        qv, ql = rows[r["query_id"]]
        nv, nl = rows[r["neighbor_id"]]
        assert nl != ql
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"]))
    for qid, pairs in by_q.items():
        qv, ql = rows[qid]
        scores = sorted(
            ((float(qv @ v / (np.linalg.norm(qv) * np.linalg.norm(v))), -i)
             for i, (v, l) in rows.items() if l != ql),
            reverse=True,
        )[:4]
        exp = [-s[1] for s in scores]
        assert [n for _, n in sorted(pairs)] == exp


def test_remove_duplicated_spans_cuts_shared_grams(spark):
    from flexgraph_spark.textops import remove_duplicated_spans

    rows = [
        (1, "aa bb cc dd ee ff gg hh"),       # shares "aa..ee" with doc 2
        (2, "xx aa bb cc dd ee yy zz"),
        (3, "totally unique words here only once ok"),
        (4, ""),                               # empty doc
        (5, "short doc"),                      # < n tokens: nothing to gram
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.clean_text, r.n_tokens, r.n_removed)
        for r in remove_duplicated_spans(df, n=5).collect()
    }
    assert got[1] == ("ff gg hh", 8, 5)
    assert got[2] == ("xx yy zz", 8, 5)
    assert got[3] == ("totally unique words here only once ok", 7, 0)
    assert got[4] == ("", 0, 0)
    assert got[5] == ("short doc", 2, 0)


def test_remove_duplicated_spans_overlap_merges_and_full_removal(spark):
    from flexgraph_spark.textops import remove_duplicated_spans

    # docs 1/2 are identical -> EVERY 3-gram duplicates -> full removal;
    # doc 3 shares two OVERLAPPING 3-grams with them ("bb cc dd", "cc dd ee")
    # -> the union span bb..ee goes, not two separate cuts
    rows = [
        (1, "aa bb cc dd ee"),
        (2, "aa bb cc dd ee"),
        (3, "qq bb cc dd ee rr"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.clean_text, r.n_removed)
        for r in remove_duplicated_spans(df, n=3).collect()
    }
    assert got[1] == ("", 5)
    assert got[2] == ("", 5)
    assert got[3] == ("qq rr", 4)


def test_remove_duplicated_spans_min_docs_threshold(spark):
    from flexgraph_spark.textops import remove_duplicated_spans

    rows = [
        (1, "aa bb cc dd"),
        (2, "aa bb cc dd"),
        (3, "aa bb cc dd"),
        (4, "zz aa bb cc yy"),  # "aa bb cc" appears in 4 distinct docs
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # min_docs=5: nothing recurs in 5 docs -> untouched
    out = remove_duplicated_spans(df, n=3, min_docs=5)
    assert out.filter(F.col("n_removed") > 0).count() == 0
    # min_docs=4: only the 4-doc gram "aa bb cc" goes; doc 1's "bb cc dd"
    # (3 docs) survives... but overlaps the removed span, so doc 1 keeps dd
    got = {
        r.doc_id: r.clean_text
        for r in remove_duplicated_spans(df, n=3, min_docs=4).collect()
    }
    assert got[1] == "dd"
    assert got[4] == "zz yy"


def test_remove_duplicated_spans_case_insensitive_match_case_preserving_rebuild(spark):
    from flexgraph_spark.textops import remove_duplicated_spans

    rows = [
        (1, "AA bb CC dd EE Keep This"),
        (2, "aa BB cc DD ee other tail"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r.clean_text
        for r in remove_duplicated_spans(df, n=5).collect()
    }
    # the shared 5-gram matches case-insensitively...
    assert got[1] == "Keep This"
    assert got[2] == "other tail"


def test_random_projection_linear_and_deterministic(spark):
    from flexgraph_spark.textops import random_projection

    a = [float(i % 7) - 3.0 for i in range(16)]
    b = [float((i * 3) % 5) for i in range(16)]
    ab = [x + y for x, y in zip(a, b)]
    df = spark.createDataFrame(
        [(1, a), (2, b), (3, ab), (4, [0.0] * 16)],
        "vec_id long, embedding array<float>",
    )
    out = random_projection(df, out_dim=4, in_dim=16)
    rows = {r.vec_id: [r.p0, r.p1, r.p2, r.p3] for r in out.collect()}
    # linearity: proj(a + b) == proj(a) + proj(b) (exact map, fp-tight)
    for j in range(4):
        assert abs(rows[3][j] - (rows[1][j] + rows[2][j])) < 1e-9
    # zero vector projects to zero
    assert rows[4] == [0.0, 0.0, 0.0, 0.0]
    # deterministic across partitionings
    rows2 = {
        r.vec_id: [r.p0, r.p1, r.p2, r.p3]
        for r in random_projection(df.repartition(3), out_dim=4, in_dim=16).collect()
    }
    assert rows == rows2
    # different salt -> different projection
    rows3 = {
        r.vec_id: [r.p0, r.p1, r.p2, r.p3]
        for r in random_projection(df, out_dim=4, in_dim=16, salt="rp2").collect()
    }
    assert rows3[1] != rows[1]


def test_blocklist_stats_whole_token_case_insensitive(spark):
    from flexgraph_spark.textops import blocklist_stats

    rows = [
        (1, "clean text with good words"),
        (2, "this has SPAM in it"),
        (3, "spammy is not spam-adjacent but spam is"),  # whole-token only
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_flagged, r.passes)
        for r in blocklist_stats(df, ["spam", "junk"]).collect()
    }
    assert got[1] == (0, True)
    assert got[2] == (1, False)  # case-insensitive
    # "spammy" and "spam-adjacent" are NOT whole-token matches; bare "spam" is
    assert got[3] == (1, False)
    assert got[4] == (0, True)  # empty doc passes
    # relaxed threshold keeps low-density docs
    relaxed = {
        r.doc_id: r.passes
        for r in blocklist_stats(df, ["spam"], max_flagged_frac=0.2).collect()
    }
    assert relaxed[2] is True and relaxed[3] is True
    import pytest as _pytest
    with _pytest.raises(ValueError):
        blocklist_stats(df, [])


def test_html_extract_golden(spark):
    """Hand-written HTML -> expected text: script/style/comment removal,
    block-tag breaks, inline tags to spaces, entity unescape, whitespace
    collapse."""
    html = (
        '<html><head><SCRIPT src="x.js">if (a < b) { alert("hi"); }</script>'
        "<style>p { color: red }</style></head><body>"
        "<!-- boilerplate\nnav -->"
        "<h1 class='t'>Title</h1><p>Hello <b>world</b>,&nbsp;it&#39;s"
        " 1 &lt; 2 &amp;&amp; 3 &gt; 2.</p>"
        "<ul><li>one</li><li>two</li></ul>"
        '<div class="footer">&copy; 2026 Example &quot;Co.&quot;</div>'
        "</body></html>"
    )
    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    out = textops.html_extract(df).collect()[0]
    assert out.clean_text == (
        "Title Hello world , it's 1 < 2 && 3 > 2. one two "
        '© 2026 Example "Co."'
    )
    # column contract: html dropped, other columns kept
    assert set(textops.html_extract(df).columns) == {"doc_id", "clean_text"}


def test_html_extract_sql_twin_matches(spark):
    """The DuckDB replay chain (html_extract_sql) produces the identical
    clean_text — the lockstep contract behind the html_extract gate."""
    import duckdb

    rows = [
        (1, "<p>a&amp;b</p><script>no</script> tail"),
        (2, "plain, no markup at all"),
        (3, "<div>x</div><style a=b>.x{}</style><em>y</em>&nbsp;&lt;z&gt;"),
        (4, "<br/>line<BR>break<table><tr><td>cell</td></tr></table>"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, html string")
    got = {
        r.doc_id: r.clean_text for r in textops.html_extract(df).collect()
    }
    con = duckdb.connect()
    con.execute("create table t(doc_id bigint, html varchar)")
    con.executemany("insert into t values (?, ?)", rows)
    expr = textops.html_extract_sql("html")
    want = dict(con.sql(f"select doc_id, {expr} from t").fetchall())
    assert got == want


# ---------------------------------------------------------------------------
# k-NN graph + semantic communities
# ---------------------------------------------------------------------------


def _toy_vectors(spark):
    """Two tight blobs (0-2 near e1, 10-12 near e2) + one isolated vector
    (20, near e3 with a twist so it's nobody's mutual neighbor at k=2)."""
    import numpy as np

    rows = []
    base = {
        0: [1.0, 0.05, 0.0], 1: [0.98, 0.1, 0.0], 2: [1.02, 0.0, 0.05],
        10: [0.0, 1.0, 0.05], 11: [0.1, 0.97, 0.0], 12: [0.0, 1.03, 0.1],
        20: [0.5, 0.5, 5.0],
    }
    for vid, v in base.items():
        rows.append((vid, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_knn_graph_directed_matches_numpy(spark):
    import numpy as np

    vecs = _toy_vectors(spark)
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in textops.knn_graph(vecs, k=2, mutual=False).collect()
    }
    rows = vecs.collect()
    ids = [r["vec_id"] for r in rows]
    M = np.array([r["embedding"] for r in rows], dtype=np.float64)
    M = M / np.linalg.norm(M, axis=1, keepdims=True)
    S = M @ M.T
    want = set()
    for i, q in enumerate(ids):
        order = sorted(
            ((-S[i, j], ids[j]) for j in range(len(ids)) if j != i)
        )[:2]
        want.update((q, n) for _, n in order)
    assert got == want


def test_knn_graph_mutual_is_symmetric_subset(spark):
    vecs = _toy_vectors(spark)
    directed = {
        (r["query_id"], r["neighbor_id"])
        for r in textops.knn_graph(vecs, k=2, mutual=False).collect()
    }
    mutual = [(r["a"], r["b"]) for r in textops.knn_graph(vecs, k=2).collect()]
    assert len(mutual) == len(set(mutual))
    for a, b in mutual:
        assert a < b and (a, b) in directed and (b, a) in directed


def test_semantic_communities_two_blobs_and_singleton(spark):
    vecs = _toy_vectors(spark)
    got = {
        r["vec_id"]: r["cluster"]
        for r in textops.semantic_communities(vecs, k=2).collect()
    }
    assert got[0] == got[1] == got[2] == 0
    assert got[10] == got[11] == got[12] == 10
    # 20 points at the blobs but nobody points back within k=2 -> singleton
    assert got[20] == 20
    assert len(got) == 7


def test_group_overlap_fork_scores_and_freq_cap(spark):
    """Hand-built catalog: repo A and its fork share 3 of A's 4 docs; the
    fork adds 1 unique doc; a boilerplate doc lives in ALL four repos and
    must be dropped by the frequency cap (otherwise unrelated B/C pairs
    would score). Exact Jaccard/containment asserted."""
    rows = []
    for d in ("d1", "d2", "d3", "d4"):
        rows.append(("A", d))
    for d in ("d1", "d2", "d3", "fork-only"):
        rows.append(("A_fork", d))
    rows += [("B", "b1"), ("B", "b2"), ("C", "c1")]
    rows += [(g, "boiler") for g in ("A", "A_fork", "B", "C")]
    df = spark.createDataFrame(rows, "source string, text string")
    out = textops.group_overlap(df, min_jaccard=0.3, max_sha_freq=3).collect()
    assert len(out) == 1
    [r] = out
    # shared=3, n_a=4, n_b=4 (boiler excluded everywhere), union=5
    assert (r.group_a, r.group_b, r.shared, r.n_a, r.n_b) == ("A", "A_fork", 3, 4, 4)
    assert r.jaccard == 0.6 and r.containment == 0.75
    # without the cap the boilerplate links every pair
    uncapped = textops.group_overlap(df, min_jaccard=0.0, max_sha_freq=None)
    assert uncapped.count() == 6  # all C(4,2) pairs share >= the boiler doc


def test_quantize_int8_bounds_and_scale(spark):
    df = spark.createDataFrame(
        [(1, [2.0, -4.0, 0.0]), (2, [1.0, 1.0, -2.0])],
        "vec_id long, embedding array<float>",
    )
    qv, m = textops.quantize_int8(df)
    assert m == 4.0
    got = {r.vec_id: r.qvec for r in qv.collect()}
    # floor(x*127/4 + 0.5): 2.0 -> 64 (63.5+0.5), -4.0 -> -127, 0 -> 0
    assert got[1] == [64, -127, 0]
    assert got[2] == [32, 32, -63]  # -63.5 + 0.5 = -63 exactly -> floor -63
    for v in got.values():
        assert all(-127 <= x <= 127 for x in v)


def test_ann_topk_int8_recall_vs_float(spark, embeddings):
    """int8 quantization preserves cosine ranking almost everywhere on
    real-ish embeddings: top-5 sets >= 80% recall vs float brute force."""
    queries = embeddings.filter(F.col("vec_id") < 10)
    sq = textops.ann_topk_int8(embeddings, queries, top_k=5)
    bf = textops.cosine_topk_bruteforce(embeddings, queries, 5)
    got = {(r["query_id"], r["neighbor_id"]) for r in sq.collect()}
    exp = {(r["query_id"], r["neighbor_id"]) for r in bf.collect()}
    assert len(got & exp) / len(exp) >= 0.8


def test_pq_gates_empty(spark, embeddings):
    assert textops.pq_assign_violations(embeddings, m_subspaces=8,
                                        n_centroids=8).count() == 0
    assert textops.pq_adc_violations(embeddings, m_subspaces=8,
                                     n_centroids=8).count() == 0


def test_pq_topk_recall_vs_exact_l2(spark, embeddings):
    """PQ ADC search at m=32 (2-dim subspaces, 128-bit codes) recovers
    >= half of the exact L2 top-5 on the synthetic embeddings —
    deterministic given the k-means seed."""
    import numpy as np

    rows = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
            for r in embeddings.collect()}
    codes, books = textops.pq_index(embeddings, m_subspaces=32, n_centroids=16)
    qs = embeddings.filter(F.col("vec_id") < 10)
    pq = textops.pq_topk(codes, books, qs, top_k=5)
    got = {(r["query_id"], r["neighbor_id"]) for r in pq.collect()}
    exp = set()
    for qid in range(10):
        q = rows[qid]
        d = sorted((float(((q - v) ** 2).sum()), vid)
                   for vid, v in rows.items() if vid != qid)
        exp |= {(qid, vid) for _, vid in d[:5]}
    assert len(got & exp) / len(exp) >= 0.5


def test_canonicalize_urls_rules(spark):
    cases = {
        "HTTPS://Example.COM:443/path/?utm_source=x&b=2&a=1#frag":
            "https://example.com/path?a=1&b=2",
        "http://example.com:8080/a/b/": "http://example.com:8080/a/b",
        "https://example.com/": "https://example.com/",  # root slash kept
        "http://site.org/page?gclid=123": "http://site.org/page",
        "http://site.org/page?z=1&y=2&UTM_CAMPAIGN=s":
            "http://site.org/page?y=2&z=1",
        "http://example.com:80/x": "http://example.com/x",
    }
    df = spark.createDataFrame([(u,) for u in cases], "url string")
    got = {r.url: r.canonical
           for r in textops.canonicalize_urls(df).collect()}
    assert got == cases


def test_compression_ratio_orders_redundancy(spark):
    import random
    random.seed(4)
    rows = [
        (1, "abc " * 200),                                   # redundant
        (2, "".join(random.choice("abcdefghijklmnopqrstuvwxyz0123456789 ")
                    for _ in range(800))),                   # high-entropy
        (3, ""),                                             # empty
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.n_bytes, r.ratio)
           for r in textops.compression_ratio(df).collect()}
    assert got[1][0] == 800 and got[2][0] == 800
    assert got[1][1] < 0.05 < got[2][1] <= 1.1
    assert got[3] == (0, 0.0)


def test_ct_language_classifies_distinct_styles(spark):
    """Profiles trained on clearly-distinct 'languages' classify held-in
    docs correctly, and the missing-gram penalty dominates for an
    out-of-profile doc."""
    train = [
        (1, "aaa aab aba aab baa aaa aab", "aa"),
        (2, "aab aaa aba aaa aab baa aaa", "aa"),
        (3, "zzz zzy zyz zzy yzz zzz zzy", "zz"),
        (4, "zzy zzz zyz zzz zzy yzz zzz", "zz"),
    ]
    df = spark.createDataFrame(train, "doc_id long, text string, lang string")
    prof = textops.language_profiles(df, top_k=20)
    got = {r.doc_id: r.pred_lang
           for r in textops.classify_language(df, prof, top_k=20).collect()}
    assert got == {1: "aa", 2: "aa", 3: "zz", 4: "zz"}


def test_group_overlap_minhash_recall_vs_exact(spark):
    """LSH-banded fork detection finds every high-Jaccard pair the exact
    operator finds on planted forks (16 bands of 4 rows: ~1.0 collision
    probability at J>=0.5), with identical scores on the survivors."""
    rows = []
    for g in range(8):
        for d in range(30):
            rows.append((f"repo{g}", f"doc {g} {d} content xyz"))
        if g % 2 == 0:  # fork shares 24/30 docs, adds 6 unique
            for d in range(24):
                rows.append((f"repo{g}_fork", f"doc {g} {d} content xyz"))
            for d in range(6):
                rows.append((f"repo{g}_fork", f"unique {g} {d} zzz"))
    df = spark.createDataFrame(rows, "source string, text string")
    exact = {(r.group_a, r.group_b): (r.shared, r.jaccard)
             for r in textops.group_overlap(df, min_jaccard=0.5).collect()}
    mh = {(r.group_a, r.group_b): (r.shared, r.jaccard)
          for r in textops.group_overlap_minhash(
              df, min_jaccard=0.5, num_hashes=64, bands=16).collect()}
    assert len(exact) == 4
    assert mh == exact  # full recall at this S-curve operating point


def test_knn_graph_candidate_faces_recall(spark, embeddings):
    """The candidates= hook: 'lsh'/'ivf' reuse the bucketed generators
    with shuffle joins (no query broadcast) and feed the SAME mutual
    reduction. IVF probing every inverted list is exact; LSH recall is
    bounded below against the exact face."""
    vecs = embeddings.filter("vec_id < 300")
    exact = {(r.a, r.b) for r in textops.knn_graph(vecs, k=5).collect()}
    assert exact
    ivf = {(r.a, r.b) for r in textops.knn_graph(
        vecs, k=5, candidates="ivf", n_centroids=8, nprobe=8).collect()}
    assert ivf == exact  # nprobe == n_centroids -> every list probed
    lsh = {(r.a, r.b) for r in textops.knn_graph(
        vecs, k=5, candidates="lsh", num_planes=4, num_tables=16).collect()}
    assert len(lsh & exact) / len(exact) >= 0.6
    with pytest.raises(ValueError, match="candidates"):
        textops.knn_graph(vecs, k=5, candidates="bogus")


def test_semantic_communities_scale_faces_match_exact_on_blobs(spark):
    """On well-separated blobs every candidate generator recovers the
    same mutual graph, so the cluster assignment is identical across
    'exact', 'lsh', and 'ivf'."""
    vecs = _toy_vectors(spark)
    exact = {r.vec_id: r.cluster
             for r in textops.semantic_communities(vecs, k=2).collect()}
    lsh = {r.vec_id: r.cluster
           for r in textops.semantic_communities(
               vecs, k=2, candidates="lsh", num_planes=2, num_tables=8
           ).collect()}
    assert lsh == exact
    ivf = {r.vec_id: r.cluster
           for r in textops.semantic_communities(
               vecs, k=2, candidates="ivf", n_centroids=3, nprobe=3
           ).collect()}
    assert ivf == exact


def test_cosine_topk_lsh_sha_planes_recall_and_determinism(spark, embeddings):
    """sha-parity sign planes are a valid hyperplane family: recall vs
    brute force holds like the Gaussian mode, and the assignment is
    deterministic (no RNG state — pure content hash)."""
    queries = embeddings.filter("vec_id < 10")
    brute = textops.cosine_topk_bruteforce(embeddings, queries, top_k=5)
    approx = textops.cosine_topk_lsh(
        embeddings, queries, top_k=5, num_planes=4, num_tables=16,
        plane_source="sha",
    )
    b = {(r["query_id"], r["neighbor_id"]) for r in brute.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    assert len(a & b) / len(b) >= 0.6
    again = textops.cosine_topk_lsh(
        embeddings, queries, top_k=5, num_planes=4, num_tables=16,
        plane_source="sha",
    )
    assert {tuple(r) for r in again.collect()} == {tuple(r) for r in approx.collect()}
    with pytest.raises(ValueError, match="plane_source"):
        textops.lsh_assign_buckets(embeddings, plane_source="nope")


def test_media_real_decode_video_resolves_pyav(spark):
    """Video decode resolves PyAV at runtime, mirroring the Pillow/wave
    pattern: absent -> NotImplementedError naming the dependency; present
    -> frames sample into an averaged grayscale histogram."""
    try:
        import av  # noqa: F401
        have_av = True
    except ImportError:
        have_av = False
    media = spark.createDataFrame(
        [(1, "video", bytearray(b"not-an-mp4"), {})], textops.MEDIA_SCHEMA
    )
    if not have_av:
        with pytest.raises(Exception, match="PyAV"):
            textops.extract_media_features(media, real_decode=True).collect()
    else:
        with pytest.raises(Exception):  # invalid payload still fails cleanly
            textops.extract_media_features(media, real_decode=True).collect()


def test_ngram_novelty_planted(spark):
    """Doc 1 and 2 are identical (novelty 0); doc 3 is all-new content
    (novelty 1 except any shingles shared with 1/2)."""
    rows = [
        (1, "aaaa bbbb cccc dddd"),
        (2, "aaaa bbbb cccc dddd"),
        (3, "zzzz yyyy xxxx wwww"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in textops.ngram_novelty(df).collect()}
    assert got[1].novelty == 0.0 and got[2].novelty == 0.0
    assert got[3].novelty == 1.0
    assert got[3].n_shingles == got[3].n_novel > 0
