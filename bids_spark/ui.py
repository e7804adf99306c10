r"""Interactive result pager — the reference TUI re-expressed for a
pipe-friendly terminal (no curses/textual dependency).

The reference ships a textual app (/root/reference/bids/ui/results.py,
via gui.py:78) whose engine-relevant behaviors were extracted in round
2 (pagination → CLI --offset, highlight → --snippets / webtext.snippet).
This module closes the remaining surface: the interactive loop itself,
mirroring the reference's controls line-for-line where they are
engine-visible:

  results mode (ResultsScreen, ui/results.py:107-284):
    n / p        next / previous page      (next_page/prev_page_button)
    f / l        first / last page         (first/last_page_button)
    g N          go to page N, range-checked with the same
                 "Page number out of range (1-T)." message (:276-279)
    <number>     open that result's document (result selection)
    q            quit
  document mode (LogContainer + search, ui/results.py:286-344):
    /TERM        case-insensitive substring search over document lines
                 (apply_search_and_highlight :325-344)
    m / M        next / previous match, wrapping, reported as
                 "Match i of n" (action_next_match/previous_match
                 :294-314; wrap via modular index)
    b            back to the results page

Everything is a pure function over injected input/output streams, so
tests drive it with StringIO — the same reason the engine ops were
extracted from the TUI in the first place.  Page size 10 matches the
reference (ui/results.py:107).
"""

from __future__ import annotations

import sys
from collections.abc import Callable, Iterable
from typing import TextIO

PAGE_SIZE = 10  # reference: ResultsScreen.page_size (ui/results.py:107)


def format_result_line(idx: int, row: dict) -> str:
    """One results line — identical to the non-interactive CLI render
    (reference search.py:117-134 / ui/results.py:220)."""
    label = row.get("file_path") or f"doc_id={row['doc_id']}"
    line = f"{idx}. Score: {row['score']:.4f} {label}"
    if row.get("snippet"):
        line += f"\n   … {row['snippet']} …"
    return line


class Pager:
    """Paginates collected result rows (already top-k + content-deduped
    — the pager never talks to Spark; it pages DRIVER-side rows exactly
    like the reference pages its collected result list)."""

    def __init__(self, rows: list[dict], page_size: int = PAGE_SIZE):
        self.rows = rows
        self.page_size = page_size
        self.current_page = 0

    @property
    def total_pages(self) -> int:
        # reference ui/results.py:189-192 (min 1 page, even when empty)
        return max(1, (len(self.rows) + self.page_size - 1) // self.page_size)

    def page_rows(self) -> list[tuple[int, dict]]:
        start = self.current_page * self.page_size
        end = min(start + self.page_size, len(self.rows))
        return [(i + 1, self.rows[i]) for i in range(start, end)]

    def goto(self, page_zero_indexed: int) -> bool:
        if 0 <= page_zero_indexed < self.total_pages:
            self.current_page = page_zero_indexed
            return True
        return False


def _find_matches(lines: list[str], term: str) -> list[int]:
    """Case-insensitive substring match per line — reference
    apply_search_and_highlight (ui/results.py:325-344)."""
    t = term.lower()
    return [i for i, ln in enumerate(lines) if t in ln.lower()]


def _render_page(pager: Pager, out: TextIO) -> None:
    out.write(f"Page {pager.current_page + 1} of {pager.total_pages}\n")
    for idx, row in pager.page_rows():
        out.write(format_result_line(idx, row) + "\n")
    out.write(
        "[n]ext [p]rev [f]irst [l]ast  g N: page  NUMBER: view doc  [q]uit\n"
    )


def _doc_mode(
    row: dict, inp: Iterable[str], out: TextIO
) -> None:
    """Document view + in-document search with match navigation."""
    lines = (row.get("text") or "").splitlines() or [""]
    out.write(f"--- {row.get('file_path') or 'doc_id=%s' % row['doc_id']} "
              f"({len(lines)} lines) ---\n")
    for ln in lines[:PAGE_SIZE]:
        out.write(ln + "\n")
    if len(lines) > PAGE_SIZE:
        out.write(f"… {len(lines) - PAGE_SIZE} more line(s)\n")
    out.write("[/TERM: search  m/M: next/prev match  b: back]\n")
    matches: list[int] = []
    cur: int | None = None
    for raw in inp:
        cmd = raw.strip()
        if cmd == "b":
            return
        if cmd.startswith("/"):
            term = cmd[1:].strip()
            matches = _find_matches(lines, term) if term else []
            if matches:
                cur = 0
                out.write(
                    f"Match 1 of {len(matches)}: {lines[matches[0]]}\n"
                )
            else:
                cur = None
                # reference notify (ui/results.py:303,314)
                out.write("No active search or no matches found.\n")
        elif cmd in ("m", "M"):
            if not matches:
                out.write("No active search or no matches found.\n")
                continue
            if cur is None:
                cur = 0 if cmd == "m" else len(matches) - 1
            else:
                step = 1 if cmd == "m" else -1
                cur = (cur + step) % len(matches)  # wraps, like the TUI
            out.write(
                f"Match {cur + 1} of {len(matches)}: {lines[matches[cur]]}\n"
            )
        else:
            out.write("[/TERM: search  m/M: next/prev match  b: back]\n")


def run_pager(
    rows: list[dict],
    inp: TextIO | None = None,
    out: TextIO | None = None,
    page_size: int = PAGE_SIZE,
) -> int:
    """Interactive loop. Returns the CLI exit code (0 results / 2 none,
    search.py:119,139)."""
    inp = inp if inp is not None else sys.stdin
    out = out if out is not None else sys.stdout
    if not rows:
        out.write("No results found\n")
        return 2
    pager = Pager(rows, page_size)
    _render_page(pager, out)
    it = iter(inp)
    for raw in it:
        cmd = raw.strip()
        if cmd == "q":
            break
        elif cmd == "n":
            if pager.goto(pager.current_page + 1):
                _render_page(pager, out)
        elif cmd == "p":
            if pager.goto(pager.current_page - 1):
                _render_page(pager, out)
        elif cmd == "f":
            pager.goto(0)
            _render_page(pager, out)
        elif cmd == "l":
            pager.goto(pager.total_pages - 1)
            _render_page(pager, out)
        elif cmd.startswith("g "):
            try:
                target = int(cmd[2:].strip()) - 1
            except ValueError:
                out.write("Invalid page number.\n")  # ui/results.py:283
                continue
            if pager.goto(target):
                _render_page(pager, out)
            else:
                # reference message, ui/results.py:276-279
                out.write(
                    f"Page number out of range (1-{pager.total_pages}).\n"
                )
        elif cmd.isdigit():
            i = int(cmd) - 1
            if 0 <= i < len(rows):
                _doc_mode(rows[i], it, out)
                _render_page(pager, out)
            else:
                out.write(f"Result number out of range (1-{len(rows)}).\n")
        elif cmd:
            _render_page(pager, out)
    return 0


def rows_from_search(enriched, show_snippets: bool = False) -> list[dict]:
    """Collected cmd_search rows → pager dicts (driver-side only)."""
    out = []
    for r in enriched:
        d = {
            "doc_id": r["doc_id"],
            "score": r["score"],
            "text": r["text"],
            "file_path": r["file_path"] if "file_path" in r.__fields__ else None,
        }
        if show_snippets and "_snippet" in r.__fields__:
            d["snippet"] = r["_snippet"]
        out.append(d)
    return out
