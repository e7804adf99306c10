"""SBOM transform — the reference's `--sbom` surface as DataFrame ops.

The reference walks one parsed BIDS JSON document at a time
(/root/reference/bids/sbom.py:146-240 `process_file`): an application
package from metadata.binary (name/version/release date/checksums/
class-arch-bits-os properties/local symbols), one library package per
components.dynamiclibrary entry (with per-function properties when the
library appears in `relationships`), plus a relationship list —
`Bids_Application DESCRIBES app` and `app DEPENDS_ON lib` per library
(sbom.py:195-238) — then hands both dicts to lib4sbom for SPDX/
CycloneDX serialization.

Here the same transform runs over a corpus of BIDS JSON documents as
pure Catalyst (`from_json` against an explicit schema → explode /
select): at 10^12 documents this is a row-local projection plus one
explode — no shuffle, no UDF, no driver loop.  Serialization stays a
neutral `{"packages": [...], "relationships": [...]}` JSON built with
to_json (lib4sbom's SPDX/CycloneDX writers are out of engine scope —
documented divergence; the DATA is what the driver oracle certifies).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: reference sbom.py:20
PROJECT_NAME = "Bids_Application"

#: reference util.py:12 (matched case-insensitively; the reference's
#: substring test is case-sensitive against generated uppercase names —
#: our normalization is the intent, pinned in tests)
CHECKSUM_ALGORITHMS = [
    "sha256", "sha384", "sha512", "sha3-256", "sha3-384", "sha3-512",
]

#: the BIDS JSON document shape (reference output.py:71-143; fixture
#: twin sources/bids_docs.py) — only the fields the SBOM transform
#: reads, so from_json prunes the rest at parse time.
BIDS_SBOM_SCHEMA = T.StructType([
    T.StructField("metadata", T.StructType([
        T.StructField("docFormat", T.StringType()),
        T.StructField("binary", T.StructType([
            T.StructField("class", T.StringType()),
            T.StructField("architecture", T.StringType()),
            T.StructField("bits", T.LongType()),
            T.StructField("os", T.StringType()),
            T.StructField("filename", T.StringType()),
            T.StructField("filedate", T.StringType()),
            T.StructField("version", T.StringType()),
            T.StructField("description", T.StringType()),
            T.StructField("checksum", T.ArrayType(T.StructType([
                T.StructField("algorithm", T.StringType()),
                T.StructField("value", T.StringType()),
            ]))),
        ])),
    ])),
    T.StructField("components", T.StructType([
        T.StructField("dynamiclibrary", T.ArrayType(T.StringType())),
        T.StructField("localsymbols", T.ArrayType(T.StringType())),
    ])),
    T.StructField(
        "relationships",
        T.MapType(T.StringType(), T.ArrayType(T.StringType())),
    ),
])


def _parsed(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, j) for BIDS-format docs only (the is-BIDS sniff the
    reference applies at ingest, index.py:69-83 — non-BIDS JSON rows
    parse to a struct whose docFormat disagrees and drop here)."""
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.from_json(F.col(text_col), BIDS_SBOM_SCHEMA).alias("j"),
        )
        .filter(F.col("j.metadata.docFormat") == "BIDS")
    )


def _sha256(checksums) -> F.Column:
    """First checksum whose algorithm is a known one, preferring
    sha256 (the fixture's only algorithm) — NULL when absent."""
    known = F.filter(
        checksums,
        lambda c: F.lower(c["algorithm"]).isin(CHECKSUM_ALGORITHMS),
    )
    return F.element_at(known, 1)["value"]


def sbom_packages(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, name, ptype, version, release_date, sha256,
    n_functions, n_localsymbols) — one 'application' row per BIDS doc
    plus one deduped 'library' row per dynamiclibrary entry
    (n_functions = |relationships[lib]|, the reference's function_N
    properties, sbom.py:222-231)."""
    j = _parsed(docs, id_col, text_col)
    b = F.col("j.metadata.binary")
    app = j.select(
        "doc_id",
        b["filename"].alias("name"),
        F.lit("application").alias("ptype"),
        b["version"].alias("version"),
        b["filedate"].alias("release_date"),
        _sha256(b["checksum"]).alias("sha256"),
        F.lit(0).cast("long").alias("n_functions"),
        F.coalesce(
            F.size("j.components.localsymbols"), F.lit(0)
        ).cast("long").alias("n_localsymbols"),
    )
    libs = (
        j.select(
            "doc_id",
            F.col("j.relationships").alias("rels"),
            F.explode(
                F.array_distinct(
                    F.coalesce(
                        F.col("j.components.dynamiclibrary"),
                        F.array().cast("array<string>"),
                    )
                )
            ).alias("name"),
        )
        .select(
            "doc_id",
            "name",
            F.lit("library").alias("ptype"),
            F.lit(None).cast("string").alias("version"),
            F.lit(None).cast("string").alias("release_date"),
            F.lit(None).cast("string").alias("sha256"),
            F.coalesce(F.size(F.col("rels")[F.col("name")]), F.lit(0))
            .cast("long").alias("n_functions"),
            F.lit(0).cast("long").alias("n_localsymbols"),
        )
    )
    return app.unionByName(libs)


def sbom_relationships(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, source, rel_type, target) — `Bids_Application
    DESCRIBES app` plus `app DEPENDS_ON lib` per dynamiclibrary
    (reference sbom.py:195-238)."""
    j = _parsed(docs, id_col, text_col)
    name = F.col("j.metadata.binary.filename")
    describes = j.select(
        "doc_id",
        F.lit(PROJECT_NAME).alias("source"),
        F.lit("DESCRIBES").alias("rel_type"),
        name.alias("target"),
    )
    depends = j.select(
        "doc_id",
        name.alias("source"),
        F.lit("DEPENDS_ON").alias("rel_type"),
        F.explode(
            F.array_distinct(
                F.coalesce(
                    F.col("j.components.dynamiclibrary"),
                    F.array().cast("array<string>"),
                )
            )
        ).alias("target"),
    ).select("doc_id", "source", F.lit("DEPENDS_ON").alias("rel_type"),
             "target")
    return describes.unionByName(depends)


def sbom_json(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, sbom) — the per-doc neutral SBOM JSON document
    (packages + relationships arrays, deterministically ordered) built
    entirely with to_json/collect_list: the serialization analogue of
    the reference's lib4sbom hand-off, minus the SPDX envelope."""
    pk = sbom_packages(docs, id_col, text_col)
    rl = sbom_relationships(docs, id_col, text_col)
    pk_a = pk.groupBy("doc_id").agg(
        F.array_sort(
            F.collect_list(F.struct("ptype", "name", "n_functions"))
        ).alias("packages")
    )
    rl_a = rl.groupBy("doc_id").agg(
        F.array_sort(
            F.collect_list(F.struct("rel_type", "source", "target"))
        ).alias("relationships")
    )
    return pk_a.join(rl_a, "doc_id").select(
        "doc_id",
        F.to_json(F.struct("packages", "relationships")).alias("sbom"),
    )
