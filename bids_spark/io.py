r"""Storage seam: table I/O + commit logs (the Iceberg/TableIO layer).

The north-star deployment stores every engine table (postings, blocks,
terms, doclens, ANN buckets/cells) as an **Iceberg table** on an object
store, where there is NO atomic POSIX rename — Iceberg's own snapshot
commit, or a conditional PUT on a metadata key, is the only atomic
primitive (the same strategy Iceberg's HadoopCatalog/S3 commit and
Delta's transaction log use).  This module is the thin seam that lets
the rest of the engine stay storage-agnostic:

TABLE DATA — ``TableIO``:
  * ``ParquetTableIO`` (default, what the sandbox runs): each logical
    table is a parquet directory under a root; behaviour and on-disk
    layout are byte-identical to the pre-seam code, so existing index
    directories stay resumable.
  * ``IcebergTableIO``: routes writes through the DataFrameWriterV2
    (``df.writeTo(catalog.ns.table).createOrReplace()/.append()``) and
    reads through ``spark.read.table``.  Partition pruning on e.g. the
    term-bucket column works the same way (Iceberg identity partitions
    replace the directory-level PartitionFilters of the parquet
    layout).  Atomicity/lineage come from Iceberg snapshots, so the
    manifest files below carry metrics only, not visibility.
    The sandbox has no Iceberg runtime jar, so this class is exercised
    by construction/identifier tests; the call surface is the stock
    public DataFrameWriterV2 API and nothing else.

COMMIT METADATA — ``CommitLog``: small JSON documents whose visibility
gates readers (BlockedIndex's manifest.json, SegmentedIndex's
segments.json, ANN index meta):
  * ``PosixRenameLog``: write-temp + ``os.replace`` — atomic on any
    POSIX filesystem (today's behaviour, same file format).
  * ``ConditionalPutLog``: versioned immutable objects
    ``commit-%020d.json`` over any store with a *conditional put*
    (S3 ``If-None-Match:*``, GCS ``ifGenerationMatch=0``, ABS ETag) —
    ``update()`` is a compare-and-swap loop, so concurrent mutators
    RETRY instead of silently losing each other's writes, and a crash
    between put attempts leaves the previous version serving (readers
    always see the highest complete version; versions are immutable so
    a torn read is impossible).

Reference analogue: the dataset-lifecycle layer of
/root/reference/bids/index.py:17-42,199-213 (tantivy meta.json commits
+ directory management), re-expressed against cloud storage semantics.
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# object stores (commit-metadata backends)
# ---------------------------------------------------------------------------


class ObjectStore:
    """Minimal key→bytes store WITHOUT rename: ``put_if_absent`` is the
    only atomic primitive, mirroring real object stores."""

    def get(self, key: str) -> bytes | None:
        raise NotImplementedError

    def put_if_absent(self, key: str, data: bytes) -> bool:
        """True iff the key was created by THIS call (conditional put)."""
        raise NotImplementedError

    def list(self, prefix: str) -> list[str]:
        raise NotImplementedError


class MemoryStore(ObjectStore):
    """In-memory fake for tests.  ``before_put`` is an interposition
    hook (called with the key before the existence check) used to
    simulate concurrent writers and crashes between operations."""

    def __init__(self):
        self.objects: dict[str, bytes] = {}
        self.before_put: Callable[[str], None] | None = None

    def get(self, key):
        return self.objects.get(key)

    def put_if_absent(self, key, data):
        if self.before_put is not None:
            self.before_put(key)
        if key in self.objects:
            return False
        self.objects[key] = bytes(data)
        return True

    def list(self, prefix):
        return sorted(k for k in self.objects if k.startswith(prefix))


class LocalFsStore(ObjectStore):
    """Object-store semantics on a local directory: put-if-absent via
    ``O_CREAT|O_EXCL`` (atomic on POSIX) — lets the conditional-put
    commit protocol be tested against a real filesystem."""

    def __init__(self, root: str):
        self.root = root

    def _p(self, key: str) -> str:
        return os.path.join(self.root, key)

    def get(self, key):
        try:
            with open(self._p(key), "rb") as f:
                return f.read()
        except FileNotFoundError:
            return None

    def put_if_absent(self, key, data):
        os.makedirs(os.path.dirname(self._p(key)) or self.root, exist_ok=True)
        try:
            fd = os.open(self._p(key), os.O_WRONLY | os.O_CREAT | os.O_EXCL)
        except FileExistsError:
            return False
        with os.fdopen(fd, "wb") as f:
            f.write(data)
        return True

    def list(self, prefix):
        d = os.path.dirname(self._p(prefix))
        if not os.path.isdir(d):
            return []
        base = os.path.relpath(d, self.root)
        base = "" if base == "." else base + "/"
        return sorted(
            base + f
            for f in os.listdir(d)
            if (base + f).startswith(prefix)
        )


# ---------------------------------------------------------------------------
# commit logs
# ---------------------------------------------------------------------------


class CommitLog:
    """A single small JSON document with atomic-visibility updates."""

    def read(self) -> dict | None:
        raise NotImplementedError

    def commit(self, obj: dict) -> None:
        """Blind overwrite — callers must hold the single-writer role."""
        raise NotImplementedError

    def update(self, fn: Callable[[dict | None], dict]) -> dict:
        """Atomic read-modify-write.  ``fn`` receives the current value
        (None if absent) and returns the new one; backends that can
        detect a concurrent write retry ``fn`` on the fresh value."""
        raise NotImplementedError


class PosixRenameLog(CommitLog):
    """Write-temp + os.replace on one JSON file (today's on-disk format
    for manifest.json / segments.json — fully backward compatible).

    ``update`` is read-then-commit WITHOUT a lock: atomic vs readers,
    but concurrent MUTATORS follow the documented single-writer rule
    (SegmentedIndex docstring).  Use ConditionalPutLog where mutator
    races must be detected."""

    def __init__(self, path: str):
        self.path = path

    def read(self):
        if not os.path.exists(self.path):
            return None
        with open(self.path) as f:
            return json.load(f)

    def commit(self, obj):
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(obj, f, indent=2)
        os.replace(tmp, self.path)

    def update(self, fn):
        new = fn(self.read())
        self.commit(new)
        return new


class ConditionalPutLog(CommitLog):
    """Versioned commit log over an ObjectStore: version N lives at
    ``{prefix}commit-{N:020d}.json`` and is IMMUTABLE once put.  The
    current state is the highest version present.  ``update`` is a
    compare-and-swap loop: read version N, apply ``fn``, try to create
    N+1; if another writer won, re-read and retry — no lost updates,
    no torn reads, no rename required."""

    def __init__(self, store: ObjectStore, prefix: str = "", max_retries: int = 50):
        self.store = store
        self.prefix = prefix
        self.max_retries = max_retries

    def _versions(self) -> list[int]:
        pre = self.prefix + "commit-"
        out = []
        for k in self.store.list(pre):
            tail = k[len(pre):]
            if tail.endswith(".json") and tail[:-5].isdigit():
                out.append(int(tail[:-5]))
        return sorted(out)

    def _key(self, version: int) -> str:
        return f"{self.prefix}commit-{version:020d}.json"

    def read(self):
        vs = self._versions()
        if not vs:
            return None
        data = self.store.get(self._key(vs[-1]))
        return None if data is None else json.loads(data)

    def commit(self, obj):
        # blind overwrite still goes through the CAS so concurrent
        # committers serialize; last writer wins on CONTENT (the
        # single-writer rule), but no version is ever half-written
        self.update(lambda _cur: obj)

    def update(self, fn):
        for _ in range(self.max_retries):
            vs = self._versions()
            cur_v = vs[-1] if vs else 0
            raw = self.store.get(self._key(cur_v)) if vs else None
            cur = None if raw is None else json.loads(raw)
            new = fn(cur)
            data = json.dumps(new, indent=2).encode()
            if self.store.put_if_absent(self._key(cur_v + 1), data):
                return new
            # lost the race — loop re-reads the winner's state
        raise RuntimeError(
            f"commit contention: lost {self.max_retries} CAS rounds "
            f"at prefix {self.prefix!r}"
        )


# ---------------------------------------------------------------------------
# table I/O
# ---------------------------------------------------------------------------


class TableIO:
    """Write/read one logical table by short name."""

    def write(
        self,
        df: DataFrame,
        name: str,
        mode: str = "overwrite",
        partition_by: list[str] | None = None,
        options: dict | None = None,
    ) -> None:
        raise NotImplementedError

    def read(self, spark: SparkSession, name: str) -> DataFrame:
        raise NotImplementedError

    def exists(self, name: str) -> bool:
        raise NotImplementedError

    def lineage(self, name: str) -> list[dict]:
        """Per-partition provenance entries (best effort; Iceberg gets
        this from snapshot metadata instead)."""
        return []


class ParquetTableIO(TableIO):
    """Parquet directories under a root — the local/sandbox backend.
    Layout is identical to the pre-seam code (``{root}/{name}``), so
    existing index directories remain valid and resumable."""

    def __init__(self, root: str):
        self.root = root

    def path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def write(self, df, name, mode="overwrite", partition_by=None, options=None):
        w = df.write.mode(mode)
        for k, v in (options or {}).items():
            w = w.option(k, v)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self.path(name))

    def read(self, spark, name):
        return spark.read.parquet(self.path(name))

    def exists(self, name):
        return os.path.isdir(self.path(name))

    def lineage(self, name):
        d = self.path(name)
        out = []
        if os.path.isdir(d):
            for root, _dirs, files in os.walk(d):
                for f in sorted(files):
                    if f.startswith("part-"):
                        p = os.path.join(root, f)
                        out.append(
                            {
                                "file": os.path.relpath(p, d),
                                "bytes": os.path.getsize(p),
                            }
                        )
        return out


class IcebergTableIO(TableIO):
    """Iceberg tables via the DataFrameWriterV2 API.

    ``catalog``: a Spark catalog configured with
    ``spark.sql.catalog.<name> = org.apache.iceberg.spark.SparkCatalog``
    (plus its warehouse/catalog-impl settings) on the session.
    ``namespace.prefix_{name}`` is the table identity; partition
    columns become Iceberg identity partitions, giving the same
    bucket-pruned scans as the parquet directory layout.  Snapshot
    commit makes every write atomic — the engine's JSON manifests then
    carry metrics/fingerprints only, with a ConditionalPutLog (or an
    Iceberg table property) as their store."""

    def __init__(self, spark: SparkSession, catalog: str, namespace: str = "bids",
                 prefix: str = ""):
        self.spark = spark
        self.catalog = catalog
        self.namespace = namespace
        self.prefix = prefix

    def ident(self, name: str) -> str:
        tbl = f"{self.prefix}_{name}" if self.prefix else name
        return f"{self.catalog}.{self.namespace}.{tbl}"

    def write(self, df, name, mode="overwrite", partition_by=None, options=None):
        w = df.writeTo(self.ident(name))
        for k, v in (options or {}).items():
            w = w.option(k, str(v))
        if mode == "append" and self.exists(name):
            w.append()
            return
        if partition_by:
            w = w.partitionedBy(*[F.col(c) for c in partition_by])
        w.createOrReplace()

    def read(self, spark, name):
        return spark.read.table(self.ident(name))

    def exists(self, name):
        return self.spark.catalog.tableExists(self.ident(name))


def iceberg_catalog(spark: SparkSession) -> str | None:
    """Name of the first Iceberg catalog configured on the session
    (``spark.sql.catalog.<name> = ...iceberg...``), or None."""
    try:
        confs = dict(spark.sparkContext.getConf().getAll())
    except Exception:
        confs = {}
    # session-level conf can add catalogs the context conf lacks
    for key in ("spark.bids.io.catalog",):
        try:
            explicit = spark.conf.get(key)
            if explicit:
                return explicit
        except Exception:
            pass
    for k, v in sorted(confs.items()):
        pre = "spark.sql.catalog."
        if k.startswith(pre) and k.count(".") == 3 and "iceberg" in v.lower():
            return k[len(pre):]
    return None


def table_io_for(spark: SparkSession, root: str, prefix: str = "") -> TableIO:
    """The session-driven backend choice the north star asks for:
    Iceberg when an Iceberg catalog is configured on the session,
    parquet directories under ``root`` otherwise."""
    cat = iceberg_catalog(spark)
    if cat:
        ns = "bids"
        try:
            ns = spark.conf.get("spark.bids.io.namespace", "bids")
        except Exception:
            pass
        if not prefix:
            prefix = (
                os.path.basename(os.path.normpath(root))
                .replace("-", "_").replace(".", "_")
            )
        return IcebergTableIO(spark, cat, ns, prefix)
    return ParquetTableIO(root)
