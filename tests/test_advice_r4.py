"""Round-4 ADVICE fixes, pinned.

1. cmd_append inherits url_field from existing segments instead of
   committing a segment the engine then rejects wholesale.
2. SearchEngine.from_documents(url_field=True) counts a NULL url as
   dl=0 when computing avgdl_url (the blocked engine / DuckDB oracle
   convention, sum(dl)/n_docs) instead of F.avg skipping the doc.
3. BlockedIndex.build rejects url_field+positions+f64 at build time —
   previously the incompatibility only surfaced as a query-time
   NotImplementedError on url:"a b".
"""

from __future__ import annotations

import os

import pytest

from bids_spark.operators.blocked_index import BlockedIndex
from bids_spark.operators.segments import SegmentedIndex
from bids_spark.operators.wand import BlockedSearchEngine
from bids_spark.plans.planner import SearchEngine


@pytest.fixture(scope="module")
def null_url_corpus(spark):
    # one doc with a NULL url, one with a 2-token url
    return spark.createDataFrame(
        [(1, "merge data tables", None),
         (2, "join data now", "https://github.com/x")],
        "doc_id bigint, text string, url string",
    ).cache()


def test_avgdl_url_counts_null_url_as_zero(spark, null_url_corpus):
    eng = SearchEngine.from_documents(
        null_url_corpus, url_field=True, cache=False
    )
    # url dls: doc1=0 (NULL — not NULL/-1), doc2=4
    # (https/github/com/x) → avg 2.0, not 4.0 (avg-skips-NULL) and
    # not 1.5 (legacy sizeOfNull -1 poisoning the sum)
    assert eng.avgdl_url == pytest.approx(2.0)


def test_null_url_scores_match_blocked_engine(spark, null_url_corpus,
                                              tmp_path):
    naive = SearchEngine.from_documents(
        null_url_corpus, url_field=True, cache=False
    )
    bi = BlockedIndex(str(tmp_path / "idx"))
    bi.build(null_url_corpus, fingerprint="nullurl", n_buckets=2,
             with_positions=True, score_mode="dl", url_field=True)
    blocked = BlockedSearchEngine(spark, bi, cache=False)
    for q in ("url:github", "url:com data", "merge url:x"):
        want = [(r["doc_id"], round(r["score"], 9))
                for r in blocked.search(q, 10).collect()]
        got = [(r["doc_id"], round(r["score"], 9))
               for r in naive.search(q, 10).collect()]
        assert got == want, q


def test_build_rejects_url_phrase_incapable_combo(spark, tmp_path):
    docs = spark.createDataFrame(
        [(1, "a b", "u")], "doc_id bigint, text string, url string"
    )
    bi = BlockedIndex(str(tmp_path / "badidx"))
    with pytest.raises(ValueError, match="score_mode='dl'"):
        bi.build(docs, fingerprint="bad", with_positions=True,
                 score_mode="f64", url_field=True)
    # positions off remains legal with f64 (no phrase surface to break)
    bi2 = BlockedIndex(str(tmp_path / "okidx"))
    bi2.build(docs, fingerprint="ok", n_buckets=1, with_positions=False,
              score_mode="f64", url_field=True)


def test_segmented_index_url_field_flag(spark, tmp_path):
    si = SegmentedIndex(str(tmp_path / "segs"))
    assert si.url_field_flag() is None
    docs = spark.createDataFrame(
        [(1, "alpha beta", "https://a.example/x")],
        "doc_id bigint, text string, url string",
    )
    si.add_segment(docs, fingerprint="s1", n_buckets=2,
                   url_field=True, url_col="url")
    assert si.url_field_flag() is True


def test_cmd_append_inherits_url_field(spark, tmp_path, monkeypatch,
                                       capsys):
    """Appending with a conflicting url_field flag inherits the store's
    convention (and warns) instead of committing an unservable mix."""
    from bids_spark import cli

    monkeypatch.setenv("BIDS_DATASET", str(tmp_path / "ds"))
    os.makedirs(cli.dataset_dir(), exist_ok=True)
    a = spark.createDataFrame(
        [(1, "merge data", "pathA")],
        "doc_id bigint, text string, file_path string",
    )
    b = spark.createDataFrame(
        [(2, "zebraword here", "pathB")],
        "doc_id bigint, text string, file_path string",
    )
    pa, pb = str(tmp_path / "a.pq"), str(tmp_path / "b.pq")
    a.write.parquet(pa)
    b.write.parquet(pb)
    assert cli.cmd_append(spark, None, pa, url_field=False) == 0
    si = SegmentedIndex(cli._segments_path())
    assert si.url_field_flag() is False
    # conflicting flag: inherited, warned, store stays servable
    assert cli.cmd_append(spark, None, pb, url_field=True) == 0
    err = capsys.readouterr().err
    assert "url_field=False" in err and "inheriting" in err
    assert si.url_field_flag() is False
    eng = si.engine(spark)  # would raise on a mixed store
    hits = [r["doc_id"] for r in eng.search("zebraword", 5).collect()]
    assert hits == [2]
