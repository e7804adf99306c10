"""Interactive pager (bids_spark/ui.py): the reference TUI's controls
(ui/results.py) driven over StringIO — pagination, go-page range
check, doc view, in-document search with wrapping match navigation —
plus one end-to-end CLI --interactive run over a real index."""

from __future__ import annotations

import io
import os
import subprocess
import sys

import pytest

from bids_spark.ui import Pager, run_pager

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _rows(n, text="alpha beta\ngamma beta\ndelta"):
    return [
        {"doc_id": i, "score": float(n - i), "text": text, "file_path": None}
        for i in range(n)
    ]


def _drive(rows, *cmds):
    out = io.StringIO()
    code = run_pager(rows, inp=io.StringIO("".join(c + "\n" for c in cmds)), out=out)
    return code, out.getvalue()


def test_empty_results_exit_code_2():
    code, text = _drive([])
    assert code == 2
    assert "No results found" in text


def test_pagination_next_prev_first_last():
    code, text = _drive(_rows(25), "n", "n", "p", "l", "f", "q")
    assert code == 0
    # 25 rows / page 10 → 3 pages; n,n → page 3; p → 2; l → 3; f → 1
    pages = [ln for ln in text.splitlines() if ln.startswith("Page ")]
    assert pages == [
        "Page 1 of 3", "Page 2 of 3", "Page 3 of 3",
        "Page 2 of 3", "Page 3 of 3", "Page 1 of 3",
    ]
    # past-the-end n / before-start p render nothing new
    _, t2 = _drive(_rows(5), "n", "p", "q")
    assert [ln for ln in t2.splitlines() if ln.startswith("Page ")] == [
        "Page 1 of 1"
    ]


def test_go_page_range_check_matches_reference_message():
    _, text = _drive(_rows(25), "g 3", "g 9", "g x", "q")
    assert "Page 3 of 3" in text
    assert "Page number out of range (1-3)." in text  # ui/results.py:276-279
    assert "Invalid page number." in text             # ui/results.py:283


def test_result_line_render_matches_cli_format():
    _, text = _drive(_rows(1), "q")
    assert "1. Score: 1.0000 doc_id=0" in text


def test_doc_view_and_match_navigation_wraps():
    # open doc 1, search "beta" (lines 0 and 1), m wraps 1→2→1
    _, text = _drive(_rows(3), "1", "/beta", "m", "m", "M", "b", "q")
    assert "Match 1 of 2: alpha beta" in text
    assert "Match 2 of 2: gamma beta" in text
    # wrap forward back to match 1, then M back to 2
    assert text.count("Match 1 of 2: alpha beta") >= 2
    # back lands on the results page again
    assert text.rstrip().splitlines()[-1].startswith("[n]ext")


def test_doc_view_no_match_message():
    _, text = _drive(_rows(1), "1", "/zzz", "m", "b", "q")
    assert text.count("No active search or no matches found.") == 2


def test_out_of_range_result_number():
    _, text = _drive(_rows(3), "7", "q")
    assert "Result number out of range (1-3)." in text


def test_pager_total_pages_empty_floor():
    assert Pager([]).total_pages == 1
    assert Pager(_rows(10)).total_pages == 1
    assert Pager(_rows(11)).total_pages == 2


@pytest.mark.slow
def test_cli_interactive_end_to_end(tmp_path, spark):
    """--search --interactive over a real dataset: piped commands page,
    view a doc, search inside it, and quit with exit code 0."""
    env = dict(os.environ,
               BIDS_DATASET=str(tmp_path / "ds"),
               BIDS_SPARK_CLI_CORES="4",
               PYTHONPATH=REPO)
    pq = str(tmp_path / "docs.parquet")
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").filter(
        "doc_id < 300"
    ).select("doc_id", "text").write.parquet(pq)
    assert subprocess.run(
        [sys.executable, "-m", "bids_spark.cli", "--index-parquet", pq],
        capture_output=True, text=True, env=env, cwd=REPO,
    ).returncode == 0
    r = subprocess.run(
        [sys.executable, "-m", "bids_spark.cli",
         "--search", "data", "--results", "15", "--interactive"],
        input="n\np\n1\n/data\nm\nb\nq\n",
        capture_output=True, text=True, env=env, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr
    assert "Page 1 of" in r.stdout
    assert "Match 1 of" in r.stdout
    assert "Score: " in r.stdout
    # interactive pages exactly the top-`limit` deduped results — the
    # reference truncates to limit BEFORE the TUI pages the collected
    # list (index.py:179-181), so --results 3 shows one page of 3
    r3 = subprocess.run(
        [sys.executable, "-m", "bids_spark.cli",
         "--search", "data", "--results", "3", "--interactive",
         "--offset", "5"],
        input="q\n", capture_output=True, text=True, env=env, cwd=REPO,
    )
    assert r3.returncode == 0, r3.stderr
    assert "Page 1 of 1" in r3.stdout
    assert len([ln for ln in r3.stdout.splitlines()
                if ln.lstrip().startswith(("1.", "2.", "3.", "4."))
                and "Score:" in ln]) == 3
    assert "--offset is ignored with --interactive" in r3.stderr
