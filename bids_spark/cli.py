r"""bids-search-compatible CLI over the Spark engine.

Mirrors the reference CLI surface (/root/reference/bids/search.py):

    --initialise            reset the dataset            (search.py:97-98)
    --index DIR             index BIDS JSON docs in DIR  (search.py:99-103)
                            — also builds the blocked compressed
                            positional index (the tantivy-writer
                            analogue); --search serves from it
    --index-parquet FILE    index a documents parquet (engine extension)
    --pattern GLOB          filename filter for --index scans
                            (bids-scan --pattern, scan.py:89-111)
    --append DIR            incremental add: one new segment, no rebuild
    --append-parquet FILE   (reference add-then-commit flow,
                            playground/example/indexer.py:90-105)
    --delete-doc ID [ID..]  tombstone docs (stop matching immediately)
    --compact               merge segments, purge tombstones
    --search QUERY          run a query                  (search.py:104-134)
    --results N             top-k (default 10)           (search.py:20)
    --offset N              pagination: skip first N     (ui/results.py:188-215)
    --snippets              highlight window per hit     (ui/results.py:325-344)
    --interactive           page results interactively   (ui/results.py:107-344
                            via bids_spark/ui.py — the TUI's controls on
                            a pipe-friendly stdin/stdout loop)
    --export FILE.zip       archive the dataset          (index.py:199-205)
    --import FILE.zip       restore a dataset            (index.py:207-213)
    --verbose               debug logging
    --debug                 reference trace prints: dataset location
                            (index.py:34-35), "Find files in DIR"
                            (index.py:87), per-candidate dedup trace
                            "N Add element." / "N Already found: …"
                            (index.py:170-176), "Import file …"
                            (index.py:200-201)
    -V / --version          print version and exit    (search.py:76)

Exit codes (search.py:119,137,139; README.md:475-481):
    0 success with results, 1 error, 2 search returned nothing.

Result rendering mirrors search.py:117-134: rank, `Score: {:.4f}`,
doc identifier.  Dataset dir: $BIDS_DATASET or ~/.cache/bids_spark
(index.py:17,23-31).

Ingest semantics (index.py:69-119, Spark-native): recursive listing,
skip non-JSON, keep only docs whose JSON has metadata.docFormat ==
"BIDS" (the is_bids_file sniff), whole file text = indexed content,
doc_id = xxhash64(file_path) — deterministic replacement for the
reference's salted abs(hash(path)) (index.py:44-45).
"""

from __future__ import annotations

import argparse
import glob as _glob
import json
import os
import shutil
import sys
import zipfile

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def dataset_dir() -> str:
    return os.environ.get(
        "BIDS_DATASET", os.path.expanduser("~/.cache/bids_spark/dataset")
    )


def _docs_path() -> str:
    return os.path.join(dataset_dir(), "docs")


def _get_spark(verbose: bool) -> SparkSession:
    from bids_spark.session import get_spark

    cores = int(os.environ.get("BIDS_SPARK_CLI_CORES", "8"))
    s = get_spark(app_name="bids-spark-cli", cores=cores, shuffle_partitions=cores)
    if verbose:
        s.sparkContext.setLogLevel("INFO")
    return s


def cmd_initialise() -> int:
    d = dataset_dir()
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d, exist_ok=True)
    print(f"Initialised dataset at {d}")
    return 0


def ingest_directory(spark: SparkSession, directory: str, pattern: str = "*"):
    """Recursive scan → (doc_id, file_path, text) of BIDS JSON docs.

    `pattern` is a filename glob applied on top of the JSON/BIDS
    filters — the mass-scan selection surface of the reference's
    bids-scan (--pattern, /root/reference/bids/scan.py:89-111); its
    executable-bit filter maps to a readability check here (the
    web-scale analogue: skip what the crawler can't fetch)."""
    import fnmatch

    files = [
        f
        for f in _glob.glob(os.path.join(directory, "**", "*"), recursive=True)
        if os.path.isfile(f)
        and not os.path.islink(f)
        and f.endswith(".json")
        and fnmatch.fnmatch(os.path.basename(f), pattern)
        and os.access(f, os.R_OK)
    ]
    if not files:
        return None
    raw = (
        spark.read.text(files, wholetext=True)
        .select(
            F.input_file_name().alias("file_path"), F.col("value").alias("text")
        )
    )
    is_bids = F.get_json_object("text", "$.metadata.docFormat") == "BIDS"
    return raw.filter(is_bids).select(
        F.xxhash64("file_path").alias("doc_id"), "file_path", "text"
    )


def _index_path() -> str:
    return os.path.join(dataset_dir(), "index")


def cmd_index(
    spark: SparkSession,
    directory: str | None,
    parquet: str | None,
    pattern: str = "*",
    debug: bool = False,
    url_field: bool = True,
) -> int:
    if directory and debug:
        # reference get_files trace head (index.py:87); the per-file
        # decisions run distributed here, so only the driver-side line
        # is mirrored
        print(f"Find files in {directory}")
    if parquet:
        docs = _read_parquet_docs(spark, parquet)
    else:
        docs = ingest_directory(spark, directory, pattern)
        if docs is None:
            print(f"No indexable files under {directory}", file=sys.stderr)
            return 1
    # --index is a full (re)build.  Honour pending tombstones FIRST and
    # against the PRE-EXISTING store only: it still holds deleted rows,
    # and rebuilding from it would silently resurrect them — but the
    # incoming batch must be appended AFTER the purge, so a re-scan
    # that re-adds a previously deleted document (same path ⇒ same
    # xxhash64 doc_id) keeps its fresh copy instead of having it
    # swept up by the old tombstone.
    from bids_spark.operators.segments import SegmentedIndex

    tomb = SegmentedIndex(_segments_path()).tombstones(spark)
    if tomb is not None and os.path.exists(_docs_path()):
        kept = spark.read.parquet(_docs_path()).join(tomb, "doc_id", "left_anti")
        tmp = _docs_path() + ".tmp"
        kept.write.mode("overwrite").parquet(tmp)
        _swap_in_store(tmp)
    mode = "append" if os.path.exists(_docs_path()) else "overwrite"
    docs.write.mode(mode).parquet(_docs_path())
    shutil.rmtree(_segments_path(), ignore_errors=True)
    # build the real (blocked, compressed, positional) index at --index
    # time, like the reference's tantivy writer (index.py:121-143);
    # resumable via manifest.  Append ⇒ doc count changes ⇒ fingerprint
    # changes ⇒ full rebuild (incremental path: streaming module).
    from bids_spark.operators.blocked_index import BlockedIndex

    all_docs = spark.read.parquet(_docs_path())
    # content-sensitive fingerprint: doc count alone would silently
    # serve a stale index after a same-size reindex — fold in cheap
    # content stats (one agg job at build time only)
    st = all_docs.agg(
        F.count("*").alias("n"),
        F.sum("doc_id").alias("s"),
        F.min("doc_id").alias("lo"),
        F.max("doc_id").alias("hi"),
        F.sum(F.length("text")).alias("b"),
    ).first()
    n = int(st["n"])
    # the reference indexes file_path as a second text field alongside
    # content (bids/index.py:49-52) — mirrored by default; url_field
    # also covers parquet ingests whose url/source column was folded
    # into file_path by _read_parquet_docs.  `--no-url-field` opts out.
    BlockedIndex(_index_path()).build(
        all_docs.select("doc_id", "text", "file_path"),
        fingerprint=f"dataset-{n}-{st['s']}-{st['lo']}-{st['hi']}-{st['b']}",
        with_positions=True,
        url_field=url_field,
        url_col="file_path",
    )
    print(f"Indexed: dataset now holds {n} documents")
    return 0


def _segments_path() -> str:
    return os.path.join(dataset_dir(), "segments")


def _swap_in_store(tmp: str) -> None:
    """Replace the docs store with `tmp` without a window where the
    store is absent: rename-aside, rename-in, then drop the old copy.
    A crash leaves either the old store or the new one in place."""
    old = _docs_path() + ".old"
    shutil.rmtree(old, ignore_errors=True)
    os.rename(_docs_path(), old)
    try:
        os.rename(tmp, _docs_path())
    except Exception:
        os.rename(old, _docs_path())  # roll back
        raise
    shutil.rmtree(old, ignore_errors=True)


def _read_parquet_docs(spark: SparkSession, parquet: str):
    """(doc_id, text, file_path) from a documents parquet.  The
    file_path column (the reference's second indexed text field) is
    taken from the parquet's url or source column when present —
    `url:`/`file_path:` queries then work over parquet ingests too —
    else NULL (no url-field postings for those docs)."""
    df = spark.read.parquet(parquet)
    for cand in ("file_path", "url", "source"):
        if cand in df.columns:
            fp = F.col(cand).cast("string").alias("file_path")
            break
    else:
        fp = F.lit(None).cast("string").alias("file_path")
    return df.select("doc_id", F.col("text"), fp)


def cmd_append(
    spark: SparkSession,
    directory: str | None,
    parquet: str | None,
    pattern: str = "*",
    auto_compact: int | None = None,
    url_field: bool = True,
) -> int:
    """Incremental add: ONE new immutable segment per invocation (the
    reference's add-then-commit flow, playground/example/indexer.py:
    90-105) — no rebuild of existing segments.  A dataset previously
    built with --index is bootstrapped by converting its documents
    into segment 0 first (one-time cost)."""
    from bids_spark.operators.segments import SegmentedIndex

    if parquet:
        docs = _read_parquet_docs(spark, parquet)
    else:
        docs = ingest_directory(spark, directory, pattern)
        if docs is None:
            print(f"No indexable files under {directory}", file=sys.stderr)
            return 1
    si = SegmentedIndex(_segments_path())
    # Inherit url_field from the committed segments: a flag that
    # disagrees with the store would commit a segment the engine then
    # rejects wholesale ("segments disagree on url_field") — every
    # later --search fails until a --compact.  The store's convention
    # wins; the user's flag only applies to an empty store.
    existing_url_field = si.url_field_flag()
    if existing_url_field is not None and existing_url_field != url_field:
        print(
            f"warning: existing segments were built with "
            f"url_field={existing_url_field}; inheriting it (the "
            f"requested url_field={url_field} would make the store "
            "unservable — use --compact to change the convention)",
            file=sys.stderr,
        )
        url_field = existing_url_field
    if not si.segment_paths() and os.path.exists(_docs_path()):
        old = spark.read.parquet(_docs_path())
        si.add_segment(
            old.select("doc_id", "text", "file_path"),
            fingerprint="cli-bootstrap",
            url_field=url_field, url_col="file_path",
        )
    docs.write.mode("append" if os.path.exists(_docs_path()) else "overwrite").parquet(
        _docs_path()
    )
    n_seg = len(si.segment_paths())
    # content-derived fingerprint: a retried append after a crash must
    # NOT resume a partial manifest that was built from different docs
    st = docs.agg(
        F.count("*").alias("n"), F.sum("doc_id").alias("s"),
        F.sum(F.length("text")).alias("b"),
    ).first()
    # url_field must match existing segments (the engine enforces
    # all-or-nothing across segments)
    si.add_segment(
        docs.select("doc_id", "text", "file_path"),
        fingerprint=f"cli-append-{st['n']}-{st['s']}-{st['b']}",
        url_field=url_field, url_col="file_path",
    )
    n = spark.read.parquet(_docs_path()).count()
    print(
        f"Appended segment {n_seg + 1}: dataset now holds {n} documents "
        f"in {len(si.segment_paths())} segments"
    )
    if auto_compact and len(si.segment_paths()) >= auto_compact:
        # route through cmd_compact, NOT SegmentedIndex's own policy:
        # the CLI keeps a stored-fields docs store that compact must
        # purge in the same breath (see cmd_compact)
        print(f"Auto-compacting ({len(si.segment_paths())} ≥ {auto_compact})")
        return cmd_compact(spark)
    return 0


def cmd_delete(spark: SparkSession, doc_ids: list[int]) -> int:
    """Tombstone documents (Lucene pre-merge semantics: they stop
    matching immediately; survivors' scores unchanged until compact)."""
    from bids_spark.operators.segments import SegmentedIndex

    si = SegmentedIndex(_segments_path())
    if not si.segment_paths():
        print(
            "delete requires a segmented dataset — build one with --append",
            file=sys.stderr,
        )
        return 1
    si.delete_docs(spark, doc_ids)
    print(f"Deleted {len(doc_ids)} document(s)")
    return 0


def cmd_compact(spark: SparkSession) -> int:
    """Merge all segments into one and purge tombstones (tantivy's
    background merge, on demand)."""
    from bids_spark.operators.segments import SegmentedIndex

    si = SegmentedIndex(_segments_path())
    before = len(si.segment_paths())
    if before == 0:
        print("No segments to compact", file=sys.stderr)
        return 1
    tomb = si.tombstones(spark)
    if before == 1 and tomb is None:
        print("Already compact (1 segment, no tombstones)")
        return 0
    if tomb is not None and os.path.exists(_docs_path()):
        # purge tombstoned rows from the document STORE too — compact
        # clears the tombstone list, so this is the last moment the
        # deleted ids are known; a later --index rebuild must not
        # resurrect them from the store (Lucene merge = stored fields
        # of deleted docs dropped)
        kept = spark.read.parquet(_docs_path()).join(tomb, "doc_id", "left_anti")
        tmp = _docs_path() + ".tmp"
        kept.write.mode("overwrite").parquet(tmp)
        _swap_in_store(tmp)
    si.compact(spark)
    print(f"Compacted {before} segment(s) into 1")
    return 0


def _resolve_engine(spark: SparkSession, docs):
    """Pick the serving engine for the dataset, best format first."""
    from bids_spark.operators.blocked_index import BlockedIndex
    from bids_spark.operators.segments import SegmentedIndex

    si = SegmentedIndex(_segments_path())
    bi = BlockedIndex(_index_path())
    if si.segment_paths():
        # segmented dataset (--append/--delete-doc flow) takes priority:
        # exact global BM25 over the committed segment set + tombstones
        return si.engine(spark)
    if bi.is_servable():
        # serve from the prebuilt blocked index (the scale path).
        # is_servable gates on the manifest recording blocks+terms done
        # with the CURRENT format tag: an interrupted --index or an
        # older-format directory falls back instead of crashing.
        from bids_spark.operators.wand import BlockedSearchEngine

        return BlockedSearchEngine(spark, bi)
    # datasets imported from older archives / partial builds:
    # score on the fly
    from bids_spark.plans.planner import SearchEngine

    return SearchEngine.from_documents(docs, cache=False)


def cmd_search_file(spark: SparkSession, path: str, limit: int) -> int:
    """Batched serving surface: one query per line of `path` (blank
    lines and #-comments skipped), ALL evaluated in one Spark action
    via search_many.  Prints each query's ranked ids in file order.

    This is an ops surface with engine semantics (raw ranked results
    per query), NOT the reference-mirrored page shaping — --search
    keeps the over-fetch + content-dedup + pagination contract.  Exit
    0 when any query matched, 2 when none did (same convention as the
    single-query no-hit exit)."""
    if not os.path.exists(_docs_path()):
        print("No dataset — run --index first", file=sys.stderr)
        return 1
    with open(path) as f:
        lines = [ln.strip() for ln in f]
    queries = {
        f"q{i}": ln
        for i, ln in enumerate(lines, 1)
        if ln and not ln.startswith("#")
    }
    if not queries:
        print("No queries in file", file=sys.stderr)
        return 1
    docs = spark.read.parquet(_docs_path())
    eng = _resolve_engine(spark, docs)
    if hasattr(eng, "search_many"):
        rows = eng.search_many(queries, limit).collect()
    else:
        # naive fallback engine (imported legacy archives): same output
        # contract, per-query plans
        rows = []
        for qid, q in queries.items():
            for r in eng.search(q, limit).collect():
                rows.append(
                    {"qid": qid, "rank": r["rank"],
                     "doc_id": r["doc_id"], "score": r["score"]}
                )
    by_qid: dict[str, list] = {}
    for r in rows:
        by_qid.setdefault(r["qid"], []).append(r)
    any_hit = False
    for qid, q in queries.items():  # file order (dicts preserve it)
        print(f"## {q}")
        hits = sorted(by_qid.get(qid, []), key=lambda r: r["rank"])
        if not hits:
            print("No results found")
            continue
        any_hit = True
        for r in hits:
            print(
                f"{r['rank']}. Score: {r['score']:.4f} "
                f"doc_id={r['doc_id']}"
            )
    return 0 if any_hit else 2


def cmd_search(
    spark: SparkSession,
    query: str,
    limit: int,
    offset: int = 0,
    show_snippets: bool = False,
    interactive: bool = False,
    debug: bool = False,
) -> int:
    if not os.path.exists(_docs_path()):
        print("No dataset — run --index first", file=sys.stderr)
        return 1
    PAGE_SIZE = 10  # reference over-fetch (index.py:21,155-157)
    docs = spark.read.parquet(_docs_path())
    eng = _resolve_engine(spark, docs)
    # reference quirk kept verbatim: over-fetch limit+PAGE_SIZE, drop
    # results whose CONTENT equals an earlier (higher-ranked) result,
    # truncate to limit (index.py:151-181)
    # pagination (reference UI pages the collected top-k 10/page,
    # ui/results.py:188-215): over-fetch offset+limit+PAGE_SIZE once,
    # slice after content-dedup — ≤ a page or two of extra rows.
    fetched = eng.search(query, offset + limit + PAGE_SIZE)
    meta_cols = [c for c in ("file_path",) if c in docs.columns]
    joined = fetched.join(docs.select("doc_id", "text", *meta_cols), "doc_id")
    if show_snippets:
        from bids_spark.operators.webtext import ABSENT, snippet_exprs
        from bids_spark.plans.parser import parse_query, positive_terms

        terms = positive_terms(parse_query(query))
        if terms:
            # appended in the SAME select — no self-join, the search
            # subtree executes once; collapse whitespace for display
            pos, _m, snippet = snippet_exprs(terms)
            joined = joined.withColumn(
                "_snippet",
                F.when(
                    pos < ABSENT, F.regexp_replace(snippet, r"\s+", " ")
                ),
            )
    enriched = joined.orderBy("rank").collect()
    rows, seen = [], set()
    cand_no = 0  # reference numbers every CANDIDATE, kept or dropped
    for r in enriched:
        cand_no += 1
        key = r["text"]
        if key in seen:
            if debug:
                # index.py:174-176 trace (label = our doc identifier)
                label = (r["file_path"] if meta_cols
                         and r["file_path"] is not None
                         else f"doc_id={r['doc_id']}")
                print(f"{cand_no} Already found: {label}. "
                      f"Score: {r['score']}")
            continue
        seen.add(key)
        if debug:
            print(f"{cand_no} Add element.")  # index.py:170-172
        rows.append(r)
        if len(rows) >= offset + limit:
            break
    if interactive:
        # interactive mode pages exactly the top-`limit` deduped results,
        # like the reference, which truncates to limit BEFORE the TUI
        # pages the collected list (index.py:179-181, ui/results.py:188-215)
        from bids_spark.ui import rows_from_search, run_pager

        if offset:
            print("--offset is ignored with --interactive (the pager "
                  "starts at page 1)", file=sys.stderr)
        return run_pager(rows_from_search(rows[:limit], show_snippets))
    rows = rows[offset:]
    if not rows:
        print("No results found")
        return 2
    for i, r in enumerate(rows, offset + 1):
        label = (r["file_path"] if meta_cols and r["file_path"] is not None
                 else f"doc_id={r['doc_id']}")
        print(f"{i}. Score: {r['score']:.4f} {label}")
        if show_snippets and "_snippet" in r.__fields__ and r["_snippet"]:
            print(f"   … {r['_snippet']} …")
    return 0


def cmd_sbom(spark: SparkSession, out_path: str) -> int:
    """Generate SBOMs for every BIDS document in the dataset — the
    reference's `--sbom` surface (bids/sbom.py: parse the stored BIDS
    JSON, emit application+library packages and DESCRIBES/DEPENDS_ON
    relationships).  Output is the neutral per-doc JSON of
    operators/sbom.py (lib4sbom's SPDX/CycloneDX envelopes are out of
    engine scope — SURVEY §8); written as JSON lines, one SBOM per
    document, so the export streams at any corpus size instead of
    building one driver-side array."""
    from bids_spark.operators.sbom import sbom_json, sbom_packages

    if not os.path.exists(_docs_path()):
        print("No indexed dataset — run --index first", file=sys.stderr)
        return 1
    docs = spark.read.parquet(_docs_path())
    sb = sbom_json(docs)
    n = 0
    with open(out_path, "w") as f:
        # toLocalIterator: one partition in driver memory at a time
        for row in sb.toLocalIterator():
            f.write(row["sbom"] + "\n")
            n += 1
    if n == 0:
        print("No BIDS documents in the dataset", file=sys.stderr)
        return 2
    counts = {
        r["ptype"]: r["n"]
        for r in sbom_packages(docs)
        .groupBy("ptype").agg(F.count("*").alias("n")).collect()
    }
    print(
        f"Wrote {n} SBOMs to {out_path} "
        f"({counts.get('application', 0)} application, "
        f"{counts.get('library', 0)} library packages)"
    )
    return 0


def cmd_export(archive: str) -> int:
    d = dataset_dir()
    if not os.path.isdir(d):
        print("No dataset to export", file=sys.stderr)
        return 1
    base = archive[:-4] if archive.endswith(".zip") else archive
    shutil.make_archive(base, "zip", d)
    print(f"Exported dataset to {base}.zip")
    return 0


def cmd_import(archive: str, debug: bool = False) -> int:
    if debug:
        print(f"Import file {archive}")  # index.py:200-201
    # reference validates zip before touching the dataset (index.py:190-197)
    if not zipfile.is_zipfile(archive):
        print(f"{archive} is not a valid archive", file=sys.stderr)
        return 1
    cmd_initialise()
    with zipfile.ZipFile(archive) as z:
        z.extractall(dataset_dir())
    print(f"Imported dataset from {archive}")
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="bids-spark-search")
    p.add_argument("--initialise", action="store_true")
    p.add_argument("--index", metavar="DIR")
    p.add_argument("--index-parquet", metavar="FILE")
    p.add_argument(
        "--no-url-field", action="store_true",
        help="do not index the file_path/url column as a second text "
             "field (the reference indexes file_path alongside content; "
             "field-scoped url:/file_path: queries need it)",
    )
    p.add_argument(
        "--pattern", metavar="GLOB", default="*",
        help="filename glob applied during --index directory scans "
             "(bids-scan --pattern analogue)",
    )
    p.add_argument(
        "--append", metavar="DIR",
        help="incremental add: index DIR as ONE new segment (no rebuild)",
    )
    p.add_argument("--append-parquet", metavar="FILE")
    p.add_argument(
        "--delete-doc", type=int, nargs="+", metavar="ID",
        help="tombstone doc ids (segmented datasets; purged by --compact)",
    )
    p.add_argument(
        "--compact", action="store_true",
        help="merge all segments into one, purging tombstones",
    )
    p.add_argument(
        "--auto-compact", type=int, metavar="N",
        help="with --append: compact automatically when the segment "
             "count reaches N (tantivy background-merge analogue)",
    )
    p.add_argument("--search", metavar="QUERY")
    p.add_argument(
        "--search-file", metavar="FILE",
        help="batched serving: one query per line, all evaluated in a "
             "single Spark action (search_many); prints ranked doc ids "
             "per query — raw engine results, no content-dedup paging",
    )
    p.add_argument("--results", type=int, default=10)
    p.add_argument(
        "--offset", type=int, default=0,
        help="skip the first N results (pagination; reference UI pages "
             "10/page, ui/results.py:188-215)",
    )
    p.add_argument(
        "--snippets", action="store_true",
        help="show a highlight window around the earliest query-term hit "
             "(ui/results.py:325-344 analogue)",
    )
    p.add_argument(
        "--interactive", action="store_true",
        help="with --search: page results interactively (reference TUI "
             "controls: n/p/f/l, g N, NUMBER to view a doc, /TERM + m/M "
             "for in-document match navigation, q to quit); --offset is "
             "ignored in this mode — the pager always starts at page 1",
    )
    p.add_argument(
        "--sbom", metavar="OUT_JSONL",
        help="generate SBOMs for every BIDS document in the dataset "
             "(reference bids/sbom.py); one neutral packages+"
             "relationships JSON per line",
    )
    p.add_argument("--export", metavar="ZIP")
    p.add_argument("--import", dest="import_", metavar="ZIP")
    p.add_argument("--verbose", action="store_true")
    p.add_argument(
        "--debug", action="store_true",
        help="reference trace prints: dataset location, ingest scan "
             "head, per-candidate dedup decisions, import trace "
             "(index.py:34,87,170-176,200)",
    )
    from bids_spark import __version__

    p.add_argument(
        "-V", "--version", action="version",
        version=f"%(prog)s {__version__}",  # search.py:76
    )
    a = p.parse_args(argv)

    if a.debug:
        # reference prints this at indexer construction, i.e. for every
        # command (index.py:34-35)
        print(f"Dataset location: {dataset_dir()}")

    try:
        if a.initialise:
            return cmd_initialise()
        if a.export:
            return cmd_export(a.export)
        if a.sbom:
            spark = _get_spark(a.verbose)
            return cmd_sbom(spark, a.sbom)
        if a.import_:
            return cmd_import(a.import_, debug=a.debug)
        if a.index or a.index_parquet:
            spark = _get_spark(a.verbose)
            return cmd_index(
                spark, a.index, a.index_parquet, a.pattern, debug=a.debug,
                url_field=not a.no_url_field,
            )
        if a.append or a.append_parquet:
            spark = _get_spark(a.verbose)
            return cmd_append(
                spark, a.append, a.append_parquet, a.pattern,
                auto_compact=a.auto_compact,
                url_field=not a.no_url_field,
            )
        if a.delete_doc:
            spark = _get_spark(a.verbose)
            return cmd_delete(spark, a.delete_doc)
        if a.compact:
            spark = _get_spark(a.verbose)
            return cmd_compact(spark)
        if a.search_file is not None:
            spark = _get_spark(a.verbose)
            return cmd_search_file(spark, a.search_file, a.results)
        if a.search is not None:
            spark = _get_spark(a.verbose)
            return cmd_search(
                spark, a.search, a.results, offset=a.offset,
                show_snippets=a.snippets, interactive=a.interactive,
                debug=a.debug,
            )
        p.print_help()
        return 1
    except Exception as e:  # reference: any error → exit 1 (search.py:137)
        print(f"error: {e}", file=sys.stderr)
        return 1


if __name__ == "__main__":
    raise SystemExit(main())
