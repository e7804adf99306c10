"""Reference-shaped BIDS JSON document fixtures (FIXTURES.md §3).

Mirrors the unit the reference indexes: one JSON feature document per
binary, shape built at /root/reference/bids/output.py:71-143 and
exemplified by test/test_assets/hello.json — the ENTIRE JSON text is
the indexed content (/root/reference/bids/index.py:112-118).

Deterministic ~20-doc corpus: symbol sets vary so `libc`, `strcpy`,
`malloc` get distinct document frequencies; includes one non-BIDS JSON
(must be filtered by the is_bids sniff, index.py:69-83) and one
duplicate content under two paths (content-dedup semantics,
index.py:164-169).
"""

from __future__ import annotations

import json
import os
import random


def make_bids_doc(name: str, libs: list[str], symbols: list[str],
                  local_syms: list[str]) -> str:
    doc = {
        "metadata": {
            "docFormat": "BIDS",
            "version": "0.0.1",
            "binary": {
                "class": "ELF",
                "architecture": "x86-64",
                "bits": 64,
                "os": "linux",
                "filename": name,
                "filesize": 1000 + len(name) * 17,
                "filedate": "2025-01-01T00:00:00Z",
                "checksum": [{"algorithm": "SHA256", "value": "0" * 64}],
            },
        },
        "components": {
            "dynamiclibrary": sorted(libs),
            "globalsymbol": sorted(symbols),
            "localsymbols": sorted(local_syms),
        },
        "callgraph": [],
        "relationships": {lib: sorted(symbols) for lib in sorted(libs)},
    }
    return json.dumps(doc, indent=2)


def write_fixture_corpus(directory: str, seed: int = 42) -> list[str]:
    """Write ~20 BIDS docs + 1 non-BIDS + 1 duplicate; returns paths."""
    rng = random.Random(seed)
    os.makedirs(directory, exist_ok=True)
    sym_pool = [
        "strcpy", "strlen", "malloc", "free", "printf", "memcpy",
        "open", "close", "read", "write", "socket", "connect",
    ]
    lib_pool = ["libc.so.6", "libpng.so.16", "libssl.so.3", "libz.so.1"]
    paths = []
    for i in range(20):
        libs = rng.sample(lib_pool, rng.randint(1, 3))
        syms = rng.sample(sym_pool, rng.randint(2, 6))
        locs = rng.sample(sym_pool, rng.randint(0, 3))
        p = os.path.join(directory, f"bin{i:02d}.json")
        with open(p, "w") as f:
            f.write(make_bids_doc(f"bin{i:02d}", libs, syms, locs))
        paths.append(p)
    # duplicate content under a second path (content-dedup case)
    with open(paths[0]) as f:
        dup = f.read()
    p_dup = os.path.join(directory, "bin00_copy.json")
    with open(p_dup, "w") as f:
        f.write(dup)
    paths.append(p_dup)
    # non-BIDS JSON (CycloneDX-ish) — must be filtered at ingest
    p_bad = os.path.join(directory, "badfile.json")
    with open(p_bad, "w") as f:
        json.dump({"bomFormat": "CycloneDX", "specVersion": "1.4"}, f)
    paths.append(p_bad)
    # non-JSON file — must be skipped by extension filter
    p_c = os.path.join(directory, "hello.c")
    with open(p_c, "w") as f:
        f.write("int main(){return 0;}")
    return paths
