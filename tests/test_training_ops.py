"""Tests for training-data pipeline operators: dedup family, ANN,
text analysis, multimodal plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from faang_pydantics_validation_spark.operators import dedup as DD
from faang_pydantics_validation_spark.operators import multimodal as MM
from faang_pydantics_validation_spark.operators import similarity as SIM
from faang_pydantics_validation_spark.operators import text as TX


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        (1, base),
        (2, base),  # exact dup of 1 (after normalization)
        (3, "THE  quick Brown fox jumps over the lazy dog again and again today"),  # normalized dup
        (4, base.replace("today", "tomorrow")),  # near dup of 1
        (5, "completely different words about spark and distributed query engines"),
        (6, "le chat et le chien et le cheval dans la maison des les amis"),
        (7, "short text"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_word_shingles_matches_hof_construction(spark):
    """word_shingles is built with one anchored-lookahead
    regexp_extract_all pass (stays in whole-stage codegen); its value must
    be IDENTICAL — as a set per document — to the reference HOF
    construction (transform over sequence + concat_ws(slice)), including
    the edge cases: NULL text (both yield [""], never NULL — greatest()
    skips the NULL size in the HOF, so it never returned NULL either),
    empty text, single word, exactly n words,
    n-1 words (full-text fallback), repeated shingles (distinct), messy
    ASCII whitespace, and unicode spaces (NOT word separators for either
    construction — normalized_text collapses only ASCII whitespace)."""
    from pyspark.sql import functions as F

    rows = [
        (0, None),
        (1, ""),
        (2, "one"),
        (3, "a b c"),
        (4, "a b"),
        (5, "  A   b\tC  d \n e  "),
        (6, "x y x y x y x y"),
        (7, "nb\xa0sp stays one\xa0word here ok"),  # real NBSPs: not separators
        (8, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for n in (1, 2, 3, 5):
        words = F.split(DD.normalized_text(F.col("text")), " ")
        hof = F.array_distinct(
            F.when(
                F.size(words) < n, F.array(F.concat_ws(" ", words))
            ).otherwise(
                F.transform(
                    F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0))),
                    lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)),
                )
            )
        )
        got = df.select(
            "doc_id",
            F.array_sort(DD.word_shingles(F.col("text"), n)).alias("a"),
            F.array_sort(hof).alias("b"),
        ).collect()
        for r in got:
            assert (r["a"] is None) == (r["b"] is None), (n, r["doc_id"])
            assert r["a"] == r["b"], (n, r["doc_id"], r["a"], r["b"])


def test_exact_duplicates(spark, docs):
    groups = {r["content_md5"]: r for r in DD.exact_duplicates(docs).collect()}
    dup_groups = [g for g in groups.values() if g["n_docs"] > 1]
    assert len(dup_groups) == 1
    assert dup_groups[0]["n_docs"] == 3 and dup_groups[0]["keep_id"] == 1


def test_ngram_jaccard_pairs(spark, docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in DD.ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs and pairs[(1, 3)] == 1.0
    assert (1, 4) in pairs and 0.5 <= pairs[(1, 4)] < 1.0
    assert not any(5 in p or 6 in p for p in pairs)


def test_ngram_jaccard_max_df_prunes(spark, docs):
    # with max_df=1 every shared shingle is dropped -> no pairs at all
    assert DD.ngram_jaccard_pairs(docs, threshold=0.1, max_df=1).count() == 0


def test_minhash_lsh_finds_planted_dups(spark, docs):
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in DD.minhash_lsh_pairs(docs, threshold=0.5).collect()
    }
    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in DD.ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    # verified-LSH jaccard values must equal the exact computation on the
    # candidates it surfaces, and it must surface the identical pairs
    assert (1, 2) in got and got[(1, 2)] == 1.0
    assert (1, 3) in got
    for k, v in got.items():
        assert exact[k] == v


def test_simhash_identical_and_different(spark, docs):
    sigs = {r["id"]: r["simhash"] for r in DD.simhash(docs).collect()}
    assert sigs[1] == sigs[2] == sigs[3]  # identical normalized text
    assert sigs[1] != sigs[5]
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in DD.simhash_near_pairs(docs, max_hamming=10).collect()
    }
    assert pairs[(1, 2)] == 0 and pairs[(2, 3)] == 0
    assert (1, 4) in pairs  # near dup within hamming ball


def test_minhash_duplicate_cluster_not_quadratic(spark):
    """Planted duplicate cluster (500 identical + 4 fully distinct docs):
    the internal text collapse must shrink the banded self-join input to
    one representative per distinct text — the LSH pass sees 5 docs, not
    504 — while the emitted pair set is still the full (inherently
    quadratic) duplicate-cluster relation at jaccard exactly 1.0."""
    rows = [(i, "alpha beta gamma delta epsilon zeta eta theta") for i in range(500)]
    rows += [
        (500 + j, " ".join(f"u{j}x{k}" for k in range(12))) for j in range(1, 5)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert DD._text_members(df, "doc_id", "text").where("id = rep").count() == 5
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in DD.minhash_lsh_pairs(df, num_hashes=16, bands=4, threshold=0.5).collect()
    }
    assert set(got) == {(a, b) for a in range(500) for b in range(a + 1, 500)}
    assert all(v == 1.0 for v in got.values())


def test_simhash_duplicate_cluster_not_quadratic(spark):
    """SimHash twin of the minhash planted-cluster test: collapse first,
    re-expand after, full cluster relation at hamming exactly 0."""
    rows = [(i, "alpha beta gamma delta epsilon zeta eta theta") for i in range(500)]
    rows += [
        (500 + j, " ".join(f"u{j}x{k}" for k in range(12))) for j in range(1, 5)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in DD.simhash_near_pairs(df, max_hamming=3).collect()
    }
    assert set(got) == {(a, b) for a in range(500) for b in range(a + 1, 500)}
    assert all(v == 0 for v in got.values())


def test_signature_collapse_matches_uncollapsed(spark, docs):
    """collapse_exact=True must be value-identical to collapse_exact=False
    on a mixed corpus with exact dups (1,2,3) and a near dup (4): identical
    normalized text means identical signatures and shingle/token sets, so
    the collapse is a pure plan optimization. collapse_min_pairs=0 forces
    the collapse on this small fixture (the adaptive default would
    short-circuit it — its duplicate pair mass is tiny)."""
    for fn, kw, score in (
        (DD.minhash_lsh_pairs,
         dict(num_hashes=32, bands=8, threshold=0.3, collapse_min_pairs=0), "jaccard"),
        (DD.simhash_near_pairs,
         dict(max_hamming=10, collapse_min_pairs=0), "hamming"),
    ):
        a = {
            (r["id_a"], r["id_b"]): r[score]
            for r in fn(docs, collapse_exact=True, **kw).collect()
        }
        b = {
            (r["id_a"], r["id_b"]): r[score]
            for r in fn(docs, collapse_exact=False, **kw).collect()
        }
        assert a == b, (fn.__name__, a, b)


def test_group_form_mega_cluster_linear_cardinality(spark):
    """A planted mega-cluster (300 identical docs) must emit O(cluster)
    group-form rows — 299 (rep 0 -> each other member) — where the pair
    form emits the inherently quadratic 300*299/2 = 44850 pairs. The
    distinct member_id set is everything except the surviving rep."""
    rows = [(i, "alpha beta gamma delta epsilon zeta eta theta") for i in range(300)]
    rows += [(300 + j, " ".join(f"u{j}x{k}" for k in range(12))) for j in range(1, 5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    g = DD.minhash_lsh_pairs(
        df, num_hashes=16, bands=4, threshold=0.5, group_form=True
    ).collect()
    assert len(g) == 299
    assert all(r["rep_id"] == 0 and r["jaccard"] == 1.0 for r in g)
    assert {r["member_id"] for r in g} == set(range(1, 300))

    gs = DD.simhash_near_pairs(df, max_hamming=3, group_form=True).collect()
    assert len(gs) == 299
    assert all(r["rep_id"] == 0 and r["hamming"] == 0 for r in gs)

    import numpy as np

    rng = np.random.default_rng(3)
    v0 = [float(x) for x in rng.standard_normal(8)]
    vrows = [(i, v0) for i in range(300)]
    vrows += [(300 + j, [float(x) for x in rng.standard_normal(8)]) for j in range(1, 5)]
    vdf = spark.createDataFrame(vrows, "vec_id long, embedding array<double>")
    ge = DD.embedding_cosine_dups(
        vdf, threshold=0.99, dim=8, group_form=True
    ).collect()
    assert len(ge) == 299
    assert all(r["rep_id"] == 0 and r["cosine"] == 1.0 for r in ge)


def test_group_form_drop_set_matches_pair_form(spark, docs):
    """Greedy keep-lowest-id dedup must read the same drop set off either
    output shape: distinct member_id == distinct id_b, for every operator
    and for collapse on/off."""
    for fn, kw in (
        (DD.minhash_lsh_pairs,
         dict(num_hashes=32, bands=8, threshold=0.3, collapse_min_pairs=0)),
        (DD.simhash_near_pairs, dict(max_hamming=10, collapse_min_pairs=0)),
    ):
        for collapse in (True, False):
            pair_drop = {
                r["id_b"]
                for r in fn(docs, collapse_exact=collapse, **kw).collect()
            }
            group_drop = {
                r["member_id"]
                for r in fn(
                    docs, collapse_exact=collapse, group_form=True, **kw
                ).collect()
            }
            assert group_drop == pair_drop, (fn.__name__, collapse)


def test_collapse_short_circuits_on_dup_free_corpus(spark):
    """A corpus with no normalization-identical documents must short-circuit
    the collapse (_text_members -> None after one metadata-sized agg): the
    collapse-on plan degenerates to the collapse-off plan, value-identical
    output, no representative semi-join / re-expansion overhead."""
    rows = [(i, " ".join(f"w{i}t{k}" for k in range(10))) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert DD._text_members(df, "doc_id", "text") is None
    # adaptive threshold: a handful of 2-copy groups (pair mass q = 4) is
    # below the production default -> short-circuit; forcing with
    # min_quadratic=0 still builds the map
    few = df.unionByName(
        spark.createDataFrame(
            [(100 + i, " ".join(f"w{i}t{k}" for k in range(10))) for i in range(2)],
            "doc_id long, text string",
        )
    )
    assert DD._text_members(few, "doc_id", "text", min_quadratic=10000) is None
    forced = DD._text_members(few, "doc_id", "text", min_quadratic=0)
    assert forced is not None and forced.where("id != rep").count() == 2
    for fn, kw, score in (
        (DD.minhash_lsh_pairs, dict(num_hashes=16, bands=8, threshold=0.1), "jaccard"),
        (DD.simhash_near_pairs, dict(max_hamming=20), "hamming"),
    ):
        a = {
            (r["id_a"], r["id_b"]): r[score]
            for r in fn(df, collapse_exact=True, **kw).collect()
        }
        b = {
            (r["id_a"], r["id_b"]): r[score]
            for r in fn(df, collapse_exact=False, **kw).collect()
        }
        assert a == b, fn.__name__


def test_bucket_cap_invariant_to_collapse_short_circuit(spark):
    """Hot-bucket occupancy counts DISTINCT text digests, so the
    max_bucket keep/drop decision cannot flip between the collapse and
    short-circuit paths: a bucket sitting AT the cap in distinct variants
    plus a few exact copies (raw rows over the cap, pair mass under the
    adaptive threshold) must keep its near-dup pairs either way. The old
    raw-row count dropped the whole bucket only on the short-circuit
    path — the value-identity claim broke exactly at the cap boundary."""
    base = [f"w{k}" for k in range(40)]
    distinct = [(i, " ".join(base + [f"tail{i}"])) for i in range(4)]
    copies = [(100 + c, distinct[0][1]) for c in range(4)]
    df = spark.createDataFrame(distinct + copies, "doc_id long, text string")
    for fn, kw, score in (
        (DD.minhash_lsh_pairs,
         dict(num_hashes=16, bands=8, threshold=0.3, max_bucket=4), "jaccard"),
        (DD.simhash_near_pairs,
         dict(max_hamming=8, n_bands=4, max_bucket=4), "hamming"),
    ):
        short = {
            (r["id_a"], r["id_b"]): r[score]
            for r in fn(df, collapse_min_pairs=10**9, **kw).collect()
        }
        collapsed = {
            (r["id_a"], r["id_b"]): r[score]
            for r in fn(df, collapse_min_pairs=0, **kw).collect()
        }
        assert short == collapsed, fn.__name__
        # the planted near-dups (4 distinct + the copy cluster) DID pair up
        assert (0, 1) in short and (100, 101) in short, fn.__name__


def test_cache_registry_scoped_release(spark, docs):
    """release_caches(mark) must unpersist exactly the operator-internal
    caches created after mark — never unrelated session caches (the
    clearCache() regression: a long-lived driver's dims would vanish)."""
    unrelated = spark.createDataFrame([(1,)], "x int").persist()
    unrelated.count()
    before = len(DD._CACHES)
    mark = DD.cache_mark()
    DD.minhash_lsh_pairs(docs, num_hashes=16, bands=4, threshold=0.5).count()
    created = [(s, df) for s, df in DD._CACHES if s > mark]
    assert created, "operator should have registered its persists"
    assert all(df.storageLevel.useMemory for _, df in created)
    DD.release_caches(mark)
    assert len(DD._CACHES) == before
    assert unrelated.storageLevel.useMemory, "unrelated cache was evicted"
    unrelated.unpersist()


def test_cache_registry_overlapping_scopes(spark, docs):
    """An OLDER scope's release must not evict a still-open later scope's
    caches (overlapping pipelines in one long-lived driver), and the
    later scope's own release must still work afterwards — marks are
    identities, not list positions."""
    base = len(DD._CACHES)
    mark_a = DD.cache_mark()
    DD.minhash_lsh_pairs(docs, num_hashes=16, bands=4, threshold=0.5).count()
    mark_b = DD.cache_mark()
    DD.simhash_near_pairs(docs, max_hamming=3).count()
    b_caches = [(s, df) for s, df in DD._CACHES if s > mark_b]
    assert b_caches, "scope B should have registered persists"
    DD.release_caches(mark_a)  # A closes while B is still open
    assert all(df.storageLevel.useMemory for _, df in b_caches), (
        "scope A's release evicted scope B's live caches"
    )
    remaining = {s for s, _ in DD._CACHES}
    assert all(s > mark_b for s in remaining if s > mark_a)
    DD.release_caches(mark_b)
    assert len(DD._CACHES) == base
    assert all(not df.storageLevel.useMemory for _, df in b_caches)


def test_band_bucket_cap_prunes_hot_buckets(spark):
    """NEAR-identical flood (shared prefix + one unique token each — not
    exact dups, so the collapse can't absorb them): max_bucket=1 drops
    every multi-document (band, bucket) group, leaving zero candidates,
    while the uncapped run surfaces the flood's near-dup pairs — the
    documented recall trade of the cap."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [(i, base + f" unique{i}") for i in range(12)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert (
        DD.minhash_lsh_pairs(df, num_hashes=16, bands=8, threshold=0.3, max_bucket=None).count()
        > 0
    )
    assert (
        DD.minhash_lsh_pairs(df, num_hashes=16, bands=8, threshold=0.3, max_bucket=1).count()
        == 0
    )
    assert DD.simhash_near_pairs(df, max_hamming=10, max_bucket=None).count() > 0
    assert DD.simhash_near_pairs(df, max_hamming=10, max_bucket=1).count() == 0


@pytest.fixture(scope="module")
def vectors(spark):
    import numpy as np

    rng = np.random.default_rng(0)
    base = rng.standard_normal((40, 16)).astype("float32")
    base[1] = base[0] + 0.01 * rng.standard_normal(16).astype("float32")  # near-dup of 0
    rows = [(i, [float(x) for x in base[i]]) for i in range(40)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>").cache()


def test_bruteforce_topk(spark, vectors):
    out = SIM.cosine_topk_bruteforce(vectors.where("vec_id < 3"), vectors, k=3)
    rows = out.collect()
    assert len(rows) == 9
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    top0 = sorted(by_q[0], key=lambda r: r["rank"])[0]
    assert top0["corpus_id"] == 1 and top0["cosine"] > 0.99
    for q, rs in by_q.items():
        ranks = sorted(r["rank"] for r in rs)
        assert ranks == [1, 2, 3]
        assert all(r["corpus_id"] != q for r in rs)


def test_ivf_centroid_selection_is_distributed(spark, vectors):
    """Scale guard: centroid sampling must plan as TakeOrderedAndProject
    (per-partition top-nlist + driver merge), never a partition-less
    window over the whole corpus — the only unpartitioned windows allowed
    are the trivial ones over the already-limited nlist-row sample
    (recognizable by their __h hash-order key)."""
    import re

    queries = vectors.where("vec_id < 10")
    df = SIM.cosine_topk_ivf(queries, vectors, k=3, nlist=8, nprobe=4)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    unpartitioned = [
        spec
        for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
        if " NULLS " in spec.split(",")[0]  # first arg is an ORDER key => no partition keys
    ]
    assert unpartitioned, "expected the post-limit sample windows to exist"
    for spec in unpartitioned:
        assert spec.lstrip().startswith("__h#"), f"corpus-wide global window found: {spec}"


def test_lsh_and_ivf_recall_vs_bruteforce(spark, vectors):
    queries = vectors.where("vec_id < 10")
    exact = SIM.cosine_topk_bruteforce(queries, vectors, k=3).collect()
    exact_set = {(r["query_id"], r["corpus_id"]) for r in exact}
    # random gaussian corpora have near-orthogonal "neighbors", the hardest
    # case for hyperplane LSH — use few planes + multiprobe and a modest bar
    lsh = SIM.cosine_topk_lsh(queries, vectors, k=3, n_planes=4).collect()
    lsh_set = {(r["query_id"], r["corpus_id"]) for r in lsh}
    recall = len(exact_set & lsh_set) / len(exact_set)
    assert recall >= 0.4, f"LSH recall too low: {recall}"
    # the planted near-dup must be found
    assert (0, 1) in lsh_set and (1, 0) in lsh_set

    ivf = SIM.cosine_topk_ivf(queries, vectors, k=3, nlist=8, nprobe=4).collect()
    ivf_set = {(r["query_id"], r["corpus_id"]) for r in ivf}
    recall_ivf = len(exact_set & ivf_set) / len(exact_set)
    assert recall_ivf >= 0.5, f"IVF recall too low: {recall_ivf}"
    assert (0, 1) in ivf_set


def test_embedding_cosine_dups(spark, vectors):
    pairs = {(r["id_a"], r["id_b"]): r["cosine"] for r in DD.embedding_cosine_dups(vectors, threshold=0.95).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] > 0.99


def test_quality_features(spark, docs):
    rows = {r["doc_id"]: r for r in TX.quality_features(docs).collect()}
    r7 = rows[7]
    assert r7["n_chars"] == len("short text")
    assert r7["n_words"] == 2 and r7["n_tokens"] == 2
    assert r7["punct_ratio"] == 0.0 and r7["alpha_ratio"] < 1.0
    r3 = rows[3]
    assert r3["upper_ratio"] > 0  # has uppercase


def test_language_id(spark, docs):
    rows = {r["doc_id"]: r for r in TX.language_id(docs).collect()}
    assert rows[1]["lang_guess"] == "en"
    assert rows[6]["lang_guess"] == "fr"
    assert rows[5]["marker_ratio"] >= 0


def test_token_counts_edges(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "a  b\t c"), (4, "don't stop-me now, ok?")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in TX.quality_features(df).collect()}
    assert rows[1]["n_words"] == 0 and rows[2]["n_words"] == 0
    assert rows[3]["n_words"] == 3
    # BPE-ish: don ' t stop - me now , ok ?  => 10
    assert rows[4]["n_tokens"] == 10


def test_fingerprint_stability(spark, docs):
    fps = {r["doc_id"]: r for r in TX.fingerprint(docs).collect()}
    assert fps[1]["fp_md5"] == fps[2]["fp_md5"] == fps[3]["fp_md5"]
    assert fps[1]["fp_xx64"] == fps[2]["fp_xx64"]
    assert fps[1]["fp_md5"] != fps[5]["fp_md5"]


def test_multimodal_roundtrip(spark, docs):
    media = MM.pack_fake_media(docs)
    meta = {r["doc_id"]: r for r in MM.decode_media_meta(media).collect()}
    for i in (1, 5, 7):
        assert meta[i]["width"] == i % 64 + 8
        assert meta[i]["height"] == i % 48 + 6
        assert meta[i]["n_frames"] == i % 5 + 1
    body = "short text".encode()
    assert meta[7]["n_bytes"] == 16 + len(body)
    assert meta[7]["body_sum"] == sum(body)


def test_frame_sample(spark, docs):
    media = MM.pack_fake_media(docs)
    frames = MM.frame_sample(media, every=2).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r["frame_idx"])
    # doc 4: n_frames = 4%5+1 = 5 -> frames 0,2,4
    assert sorted(by_doc[4]) == [0, 2, 4]
    # doc 5: n_frames = 1 -> frame 0
    assert by_doc[5] == [0]

def test_embedding_dups_duplicate_cluster_not_quadratic(spark):
    """Planted duplicate cluster (1,000 identical vectors + 4 distinct):
    the exact-duplicate collapse must reduce the LSH/in-bucket input to one
    representative per DISTINCT vector — the in-bucket pass sees 5 rows,
    not 1004 — while the emitted pair set is still the full (inherently
    quadratic) duplicate-cluster relation at cosine 1.0."""
    import numpy as np

    rng = np.random.default_rng(7)
    distinct = rng.standard_normal((5, 16))
    rows = [(i, [float(x) for x in distinct[0]]) for i in range(1000)]
    rows += [(1000 + j, [float(x) for x in distinct[j]]) for j in range(1, 5)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    canon = DD.exact_dup_canon(df, "vec_id", "embedding")
    assert canon.where("id = rep").count() == 5

    out = DD.embedding_cosine_dups(df, threshold=0.95, dim=16)
    assert out.count() == 1000 * 999 // 2
    row = out.where("id_a = 0 AND id_b = 1").collect()
    assert row and row[0]["cosine"] == 1.0


def test_embedding_dups_collapse_matches_bruteforce(spark, vectors):
    """Collapse + re-expand == brute-force all-pairs on a mixed set with
    planted exact duplicates."""
    import numpy as np

    dups = vectors.where("vec_id < 3").selectExpr("vec_id + 100 AS vec_id", "embedding")
    df = vectors.unionByName(dups)
    got = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in DD.embedding_cosine_dups(df, threshold=0.95, dim=16).collect()
    }
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype="float64") for r in df.collect()}
    ids = sorted(vecs)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            c = float(vecs[a] @ vecs[b] / (np.linalg.norm(vecs[a]) * np.linalg.norm(vecs[b])))
            if round(c, 6) >= 0.95:
                want[(a, b)] = round(c, 6)
    assert set(got) == set(want)
    for k2 in want:
        assert abs(got[k2] - want[k2]) < 1e-5, (k2, got[k2], want[k2])


def test_lsh_topk_with_duplicate_corpus_matches_bruteforce(spark, vectors):
    """Duplicate corpus copies must survive the rep-collapse: each copy
    re-expands into the candidate set and the final top-k equals the
    brute-force ranking (identical vectors => identical cosine, ranked by
    id)."""
    dups = vectors.where("vec_id = 0").selectExpr("vec_id + 200 AS vec_id", "embedding")
    corpus = vectors.unionByName(dups)
    queries = vectors.where("vec_id = 0")
    exact = SIM.cosine_topk_bruteforce(queries, corpus, k=3).collect()
    lsh = SIM.cosine_topk_lsh(queries, corpus, k=3, n_planes=4, dim=16).collect()
    want = {(r["query_id"], r["corpus_id"], r["rank"]) for r in exact}
    got = {(r["query_id"], r["corpus_id"], r["rank"]) for r in lsh}
    assert (0, 200, 1) in want  # the planted copy of the query itself
    assert got == want


def test_ann_construction_is_lazy(spark, vectors):
    """Constructing the ANN/dedup DataFrames with dim supplied must launch
    no Spark job (the r2 code ran an eager .first() to sniff the
    dimension)."""
    sc = spark.sparkContext
    before = len(sc.statusTracker().getJobIdsForGroup())
    SIM.cosine_topk_lsh(vectors.where("vec_id < 3"), vectors, k=3, dim=16)
    DD.embedding_cosine_dups(vectors, dim=16)
    after = len(sc.statusTracker().getJobIdsForGroup())
    assert after == before


def test_ivf_recall_floor(spark):
    """IVF in its approximate regime (nprobe < nlist) must hold a recall
    floor vs exact brute-force top-k over the real sf0.01 embeddings —
    the contract query ann_ivf uses nprobe == nlist (provably exact, see
    its DuckDB oracle); this guards the regime the oracle can't reach."""
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    queries = emb.where("vec_id < 10")
    exact = {(r["query_id"], r["corpus_id"])
             for r in SIM.cosine_topk_bruteforce(queries, emb, k=3).collect()}
    approx = {(r["query_id"], r["corpus_id"])
              for r in SIM.cosine_topk_ivf(queries, emb, k=3, nlist=8, nprobe=4).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"IVF recall too low at sf0.01: {recall}"


def test_real_bmp_wav_decode(spark):
    """REAL codec roundtrip (stdlib-only): hand-assembled spec-conformant
    BMP bytes and a WAV produced by the stdlib wave module go through the
    same mapInPandas decoder as the FAKE payloads and come back with the
    true header metadata."""
    import io
    import struct
    import wave

    width, height = 3, 2
    row = b"\x00\x7f\xff" * width
    row += b"\x00" * ((4 - len(row) % 4) % 4)  # BMP rows pad to 4 bytes
    pixels = row * height
    file_hdr = b"BM" + struct.pack("<IHHI", 14 + 40 + len(pixels), 0, 0, 14 + 40)
    info_hdr = struct.pack(
        "<IiiHHIIiiII", 40, width, -height, 1, 24, 0, len(pixels), 2835, 2835, 0, 0
    )  # negative height = top-down, must still report abs()
    bmp = file_hdr + info_hdr + pixels

    buf = io.BytesIO()
    wf = wave.open(buf, "wb")
    wf.setnchannels(2)
    wf.setsampwidth(2)
    wf.setframerate(8000)
    data = struct.pack("<8h", *range(8))  # 4 sample frames x 2 channels x s16
    wf.writeframes(data)
    wf.close()
    wav = buf.getvalue()

    df = spark.createDataFrame(
        [(1, bytearray(bmp)), (2, bytearray(wav))], "doc_id long, media binary"
    )
    rows = {r["doc_id"]: r for r in MM.decode_media_meta(df).collect()}
    assert (rows[1]["width"], rows[1]["height"], rows[1]["n_frames"]) == (3, 2, 1)
    assert rows[1]["body_sum"] == sum(pixels)
    assert rows[1]["n_bytes"] == len(bmp)
    assert (rows[2]["width"], rows[2]["height"], rows[2]["n_frames"]) == (2, 16, 4)
    assert rows[2]["body_sum"] == sum(data)

    # frame_sample rides the same decode: 4 wav frames, every 2nd -> 0, 2
    fs = MM.frame_sample(df.where("doc_id = 2"), every=2).collect()
    assert sorted(r["frame_idx"] for r in fs) == [0, 2]


def test_malformed_wav_raises_value_error():
    """Malformed RIFF inputs fail the decoder's documented ValueError
    contract (not a struct.error leaking from the executor): a short
    'fmt ' chunk and a data chunk truncated below its declared size."""
    import struct

    def riff(*chunks):
        body = b"WAVE" + b"".join(
            cid + struct.pack("<I", size) + payload for cid, size, payload in chunks
        )
        return b"RIFF" + struct.pack("<I", len(body)) + body

    short_fmt = riff((b"fmt ", 6, struct.pack("<IH", 1, 2)), (b"data", 4, b"\x01\x02\x03\x04"))
    with pytest.raises(ValueError, match="fmt chunk too short"):
        MM._decode_wav(short_fmt)

    good_fmt = struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
    truncated = riff((b"fmt ", 16, good_fmt), (b"data", 100, b"\x01\x02\x03\x04"))
    with pytest.raises(ValueError, match="data chunk truncated"):
        MM._decode_wav(truncated)


def test_zero_norm_vectors_excluded(spark, vectors):
    """Zero-norm vectors have NaN cosine (which Spark sorts ABOVE every
    number); they are intentionally dropped by exact_dup_canon and so
    never appear in embedding_cosine_dups pairs or cosine_topk_lsh
    rankings."""
    zeros = spark.createDataFrame(
        [(900, [0.0] * 16), (901, [0.0] * 16)], "vec_id long, embedding array<float>"
    )
    df = vectors.unionByName(zeros)
    assert DD.exact_dup_canon(df, "vec_id", "embedding").where("id >= 900").count() == 0
    pair_ids = DD.embedding_cosine_dups(df, threshold=0.95, dim=16).select(
        F.explode(F.array("id_a", "id_b")).alias("i")
    )
    assert pair_ids.where("i >= 900").count() == 0
    topk = SIM.cosine_topk_lsh(vectors.where("vec_id < 2"), df, k=5, dim=16)
    assert topk.where("corpus_id >= 900").count() == 0
    assert topk.where("isnan(cosine)").count() == 0
