"""Training-pipeline operators: exact ops vs planted fixtures, and
approximate ops (minhash-LSH, simhash, embedding-LSH) property-tested
against their exact counterparts — precision must be 1.0 (verified
candidates), recall measured against brute force."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from bids_spark.operators import dedup as dd
from bids_spark.operators import multimodal as mm
from bids_spark.operators import similarity as sim
from bids_spark.operators import textstats as ts


@pytest.fixture(scope="module")
def planted(spark):
    """Corpus with planted exact + near duplicates."""
    base = (
        "the quick brown fox jumps over the lazy dog and runs far away "
        "into the deep green forest tonight"
    )
    rows = [
        (1, base),
        (2, base),  # exact dup of 1
        (3, base.replace("quick", "rapid")),          # near dup of 1
        (4, base.replace("dog and runs", "cat and walks")),  # near dup
        (5, "completely different text about spark dataframes and shuffles"),
        (6, "another unrelated document mentioning parquet and arrow batches"),
        (7, ""),  # empty
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dedup_planted(planted):
    out = {r["keep_id"]: r["n_copies"] for r in dd.exact_dedup(planted).collect()}
    assert out[1] == 2          # docs 1,2 merged, min id kept
    assert 2 not in out
    assert out[3] == 1 and out[5] == 1


def test_ngram_jaccard_planted(planted):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dd.ngram_jaccard_pairs(planted, threshold=0.1).collect()
    }
    assert pairs[(1, 2)] == 1.0                      # exact dup
    assert 0.3 < pairs[(1, 3)] < 1.0                 # near dup
    assert (1, 5) not in pairs and (5, 6) not in pairs


def test_minhash_lsh_finds_planted(planted):
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dd.minhash_lsh_pairs(planted, threshold=0.3).collect()
    }
    assert (1, 2) in got and got[(1, 2)] == 1.0
    assert (1, 3) in got                              # near dup found
    # precision 1.0: every reported jaccard is the exact value
    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dd.ngram_jaccard_pairs(planted, threshold=0.0).collect()
    }
    for pair, j in got.items():
        assert abs(exact[pair] - j) < 1e-9


def test_minhash_signature_shape(planted):
    sig = dd.minhash_signatures(planted, num_perm=64).collect()
    assert all(len(r["sig"]) == 64 for r in sig)
    by_id = {r["doc_id"]: list(r["sig"]) for r in sig}
    assert by_id[1] == by_id[2]                       # identical docs
    same = sum(a == b for a, b in zip(by_id[1], by_id[3]))
    assert same > 20                                  # near dup: many minima shared


def test_simhash_planted(planted):
    by_id = {r["doc_id"]: r["simhash"] for r in dd.simhash(planted).collect()}
    assert by_id[1] == by_id[2]
    ham13 = bin(by_id[1] ^ by_id[3]).count("1")
    ham15 = bin(by_id[1] ^ by_id[5]).count("1")
    assert ham13 < ham15                              # near dup closer than unrelated
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in dd.simhash_neardup_pairs(planted, max_hamming=ham13).collect()
    }
    assert (1, 2) in pairs and (1, 3) in pairs


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()


def test_cosine_topk_self_first(emb):
    qv = [float(x) for x in emb.filter("vec_id = 7").first()["embedding"]]
    top = sim.cosine_topk(emb, qv, 5).collect()
    assert top[0]["vec_id"] == 7 and abs(top[0]["cos"] - 1.0) < 1e-9
    assert [r["rank"] for r in top] == [1, 2, 3, 4, 5]


def test_lsh_ann_recall(emb):
    qv = [float(x) for x in emb.filter("vec_id = 7").first()["embedding"]]
    exact = {r["vec_id"] for r in sim.cosine_topk(emb, qv, 10).collect()}
    approx = {r["vec_id"] for r in sim.lsh_ann_topk(emb, qv, 10).collect()}
    assert 7 in approx                                 # self always bucketed with itself
    assert len(exact & approx) >= 4                    # ≥40% top-10 recall on randoms


def test_embedding_neardup_exact_subset(spark, emb):
    got = sim.embedding_neardup_pairs(emb, threshold=0.4).collect()
    # verify precision: recompute each pair exactly
    import numpy as np

    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
            for r in emb.collect()}
    for r in got:
        a, b = vecs[r["vec_a"]], vecs[r["vec_b"]]
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert abs(cos - r["cos"]) < 1e-5 and cos >= 0.4


def test_quality_and_langid(spark):
    rows = [
        (1, "the cat is in the house and the dog is in the garden"),
        (2, "der hund ist ein gutes tier und die katze ist auch ein tier"),
        (3, "le chat est un animal et la maison est grande"),
        (4, "!!! ??? ,,, ..."),
        (5, ""),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    langs = {r["doc_id"]: r["pred_lang"] for r in ts.lang_id(docs).collect()}
    assert langs[1] == "en" and langs[2] == "de" and langs[3] == "fr"
    assert langs[4] == "und" and langs[5] == "und"
    q = {r["doc_id"]: r["quality"] for r in ts.quality_score(docs).collect()}
    assert q[1] > q[4] and q[4] < 0.35


def test_fingerprint_order_sensitive(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma beta alpha"), (3, "alpha beta gamma")],
        ["doc_id", "text"],
    )
    fp = {r["doc_id"]: r["fp"] for r in ts.fingerprint(docs).collect()}
    assert fp[1] == fp[3] and fp[1] != fp[2]


def test_decode_features_deterministic(planted):
    media = mm.attach_media(planted)
    fcols = [f"f{i}" for i in range(mm.N_FEATURES)]

    def grab(df):
        return {r["doc_id"]: tuple(r[c] for c in fcols) for r in df.collect()}

    f1 = grab(mm.decode_features(media))
    f2 = grab(mm.decode_features(media))
    assert f1 == f2
    assert all(len(v) == mm.N_FEATURES for v in f1.values())
    assert abs(sum(f1[1]) - 1.0) < 1e-9               # L1-normalized
    assert sum(f1[7]) == 0.0                          # empty media → zero vec


def test_decode_features_strict_raises(planted):
    media = mm.attach_media(planted)
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        mm.decode_features(media, strict=True).collect()


def test_frame_sample_shape(planted):
    media = mm.attach_media(planted).filter("media_len > 0")
    n_docs = media.count()
    frames = mm.sample_frames(media, n_frames=4)
    assert frames.count() == 4 * n_docs
    per = frames.groupBy("doc_id").agg(F.countDistinct("frame_no").alias("n")).collect()
    assert all(r["n"] == 4 for r in per)


def test_ngram_jaccard_df_cap_below_self_join(planted):
    """Scale guard: the max_shingle_df semi-filter must execute BELOW
    the shingle self-join (on both inputs), or a boilerplate shingle
    with df=10^6 materializes 10^12 join rows before it can be
    dropped.  The fixed plan semi-joins inv against the rare-shingle
    set on each side of the self-join → two LeftSemi joins in the
    optimized plan; the broken ordering had exactly one, above it."""
    out = dd.ngram_jaccard_pairs(planted, n=3, threshold=0.05)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("LeftSemi") >= 2, plan


def test_ngram_jaccard_df_cap_semantics(planted):
    """A shingle over the cap contributes to NO pair's common count:
    with max_shingle_df=1 every shared shingle is dropped → no pairs."""
    assert dd.ngram_jaccard_pairs(planted, n=3, threshold=0.0,
                                  max_shingle_df=1).count() == 0


def test_lsh_ann_index_matches_adhoc(spark, emb, tmp_path):
    """The pre-bucketed index uses the same planes/seed as the ad-hoc
    scan, so candidates — and therefore the exact-rescored top-k —
    must be identical."""
    qv = [float(x) for x in emb.filter("vec_id = 7").first()["embedding"]]
    idx = sim.LshAnnIndex(str(tmp_path / "ann")).build(emb)
    got = [(r["rank"], r["vec_id"]) for r in idx.topk(spark, qv, 10).collect()]
    want = [(r["rank"], r["vec_id"]) for r in sim.lsh_ann_topk(emb, qv, 10).collect()]
    assert got == want


def test_lsh_ann_index_prunes_scan(spark, emb, tmp_path):
    """Candidate lookup must be a pruned scan: band is a partition
    column (PartitionFilters) and key reaches the parquet row-group
    stats (PushedFilters) — not a full pass over the signatures."""
    qv = [float(x) for x in emb.filter("vec_id = 7").first()["embedding"]]
    idx = sim.LshAnnIndex(str(tmp_path / "ann2")).build(emb)
    plan = (
        idx.candidates(spark, qv)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters" in plan
    pushed = plan.split("PushedFilters: [")[1].split("]")[0]
    assert "key" in pushed, pushed


def test_embedding_allpairs_exact_supersets_banded(spark, emb):
    """Exact all-pairs is the ground truth: every banded pair appears
    in it with the same cosine (banding may only MISS pairs)."""
    exact = {
        (r["vec_a"], r["vec_b"]): r["cos"]
        for r in sim.embedding_allpairs_exact(emb, threshold=0.4).collect()
    }
    banded = {
        (r["vec_a"], r["vec_b"]): r["cos"]
        for r in sim.embedding_neardup_pairs(emb, threshold=0.4).collect()
    }
    assert set(banded) <= set(exact)
    for pair, c in banded.items():
        assert abs(exact[pair] - c) < 1e-9


def test_ivf_ann_recall_and_pruning(spark, emb, tmp_path):
    """IVF probe must (a) reach decent recall@10 vs brute force across
    several queries, (b) scan only the probed cell partitions, and
    (c) reload identically from its persisted metadata."""
    idx = sim.IvfAnnIndex(str(tmp_path / "ivf"), n_cells=8, nprobe=3).build(emb)
    hits = total = 0
    for qid in (0, 7, 42):
        qv = [float(x) for x in emb.filter(f"vec_id = {qid}").first()["embedding"]]
        truth = {r["vec_id"] for r in sim.cosine_topk(emb, qv, 10).collect()}
        got = {r["vec_id"] for r in idx.topk(spark, qv, 10).collect()}
        hits += len(truth & got)
        total += len(truth)
        # the query vector itself lives in a probed cell → rank 1
        assert qid in got
    assert hits / total >= 0.5, f"recall@10 {hits}/{total}"
    # partition pruning: cell is a partition column of the cells parquet
    qv = [float(x) for x in emb.filter("vec_id = 0").first()["embedding"]]
    import os

    cells = spark.read.parquet(os.path.join(str(tmp_path / "ivf"), "cells"))
    from pyspark.sql import functions as F

    plan = (
        cells.filter(F.col("cell").isin([0, 1, 2]))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters" in plan and "cell" in plan.split("PartitionFilters")[1][:200]
    # reload from meta: same centroids → same results
    re = sim.IvfAnnIndex(str(tmp_path / "ivf"))
    assert re.n_cells == 8 and re.nprobe == 3
    got1 = [(r["rank"], r["vec_id"]) for r in idx.topk(spark, qv, 10).collect()]
    got2 = [(r["rank"], r["vec_id"]) for r in re.topk(spark, qv, 10).collect()]
    assert got1 == got2


def test_ivf_cell_assignment_parity_and_vectorized_build(spark, emb, tmp_path):
    """The Arrow-batched matmul assignment must agree with the
    when-chain column-math assignment vector-for-vector, and a build
    above VECTORIZE_CELLS_ABOVE (which routes through the matmul path)
    must stay exactly correct: with nprobe = n_cells every cell is
    probed, so topk must equal brute force."""
    dim = len(emb.first()["embedding"])
    cents = np.random.RandomState(7).standard_normal((12, dim))
    chain = {
        r["vec_id"]: r["cell"]
        for r in emb.select(
            "vec_id",
            sim.IvfAnnIndex._nearest_cell(F.col("embedding"), cents).alias("cell"),
        ).collect()
    }
    matmul = {
        r["vec_id"]: r["cell"]
        for r in emb.select(
            "vec_id",
            sim.IvfAnnIndex._nearest_cell_vectorized(
                F.col("embedding"), cents
            ).alias("cell"),
        ).collect()
    }
    assert chain == matmul
    n_cells = sim.IvfAnnIndex.VECTORIZE_CELLS_ABOVE + 32  # forces matmul path
    idx = sim.IvfAnnIndex(
        str(tmp_path / "ivf_big"), n_cells=n_cells, nprobe=n_cells
    ).build(emb)
    qv = [float(x) for x in emb.filter("vec_id = 7").first()["embedding"]]
    truth = [(r["rank"], r["vec_id"]) for r in sim.cosine_topk(emb, qv, 10).collect()]
    got = [(r["rank"], r["vec_id"]) for r in idx.topk(spark, qv, 10).collect()]
    assert got == truth


def test_lsh_signature_vectorized_parity(emb):
    """The Arrow-batched matmul signature (the default — measured
    faster at every size, see VECTORIZE_SIG_NODES_ABOVE) must agree
    bit-for-bit with the JVM column-math twin at the fixture dim, and
    the dispatch must route transformer dims to the matmul path — the
    bits×dim literal expression is the same Catalyst plan-size hazard
    class as the IVF when-chain bug."""
    dim = len(emb.first()["embedding"])
    planes = sim._hyperplanes(dim, 32, 42)
    col = {
        r["vec_id"]: r["sig"]
        for r in sim._lsh_signatures_column(
            emb, planes, "vec_id", "embedding"
        ).collect()
    }
    vec = {
        r["vec_id"]: r["sig"]
        for r in sim._lsh_signatures_vectorized(
            emb, planes, "vec_id", "embedding"
        ).collect()
    }
    assert col == vec and len(col) == emb.count()
    # dispatch threshold: 32 bits × dim 768 must take the vectorized
    # path — no per-coefficient literals in the plan
    fat = emb.select(
        "vec_id",
        F.transform(
            F.sequence(F.lit(0), F.lit(767)),
            lambda i: F.element_at("embedding", i % dim + 1),
        ).alias("embedding"),
    )
    plan = sim.lsh_signatures(
        fat, 768, 32, 42
    )._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan or "pythonUDF" in plan.lower()
