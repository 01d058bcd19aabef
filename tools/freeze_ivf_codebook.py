"""Freeze the pyspark.ml KMeans IVF codebook per test scale factor.

``q_knn_ivf_kmeans`` trains its codebook live via ``KMeans(k-means||)``.
Spark's trainer is bit-reproducible for a fixed (data, k, seed): verified
by training under 4 session shapes (tuned 32-core, plain 32-core, plain
8-core, plain rerun) — max abs centroid diff 0.0 across all pairs. That
makes the trained codebook a pure function of the parquet file, so it can
be frozen here and replayed as plan literals by the DuckDB oracle
(the q_lsh_embedding_bucketed pattern), upgrading the query from
rows-only to fully hash-checked.

Each codebook is keyed by a DATA fingerprint, not the sf path: the
1e-6 fixed-point sum of ``embedding[1]`` over the corpus (sf0.001 and
sf0.01 share row counts and vec_ids but differ in values, so row count
alone cannot discriminate). The oracle computes the same fingerprint in
SQL and selects the matching codebook; the freeze tool computes it with
DuckDB itself so there is no cross-engine rounding concern.

Usage: python tools/freeze_ivf_codebook.py  (re-run only if the test
parquet, trainer params, or pyspark version change — the pin test
tests/test_ann_recall.py::test_kmeans_codebook_matches_frozen goes red
first if drift ever appears.)
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

KEY_SQL = (
    "CAST(sum(CAST(round(CAST(embedding[1] AS DOUBLE) * 1000000, 0)"
    " AS BIGINT)) AS BIGINT)"
)

OUT = os.path.join(REPO, "typebus_spark", "queries", "_ivf_codebook.py")

SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",  # bench comparator SF — keeps the DuckDB
    # like-for-like timing of this oracle a real measurement
]


def fingerprint(sf_dir: str) -> int:
    import duckdb

    path = os.path.join(sf_dir, "embeddings.parquet")
    return duckdb.sql(f"SELECT {KEY_SQL} FROM '{path}'").fetchone()[0]


def main() -> None:
    import typebus_spark.suite  # noqa: F401  (registers query modules in order)
    from typebus_spark import get_spark
    from typebus_spark.operators.similarity import train_centroids_kmeans
    from typebus_spark.queries.similarity import IVF_N_CEN, IVF_SEED
    from typebus_spark.session import load_table

    spark = get_spark(app_name="freeze-ivf-codebook")
    spark.sparkContext.setLogLevel("ERROR")
    books: dict[int, list[list[float]]] = {}
    for sf_dir in SF_DIRS:
        key = fingerprint(sf_dir)
        e = load_table(spark, sf_dir, "embeddings")
        books[key] = train_centroids_kmeans(
            e, "embedding", n_centroids=IVF_N_CEN, seed=IVF_SEED
        )
        print(f"{sf_dir}: fingerprint={key}", file=sys.stderr)
    spark.stop()

    with open(OUT, "w") as fh:
        fh.write(
            '"""FROZEN pyspark.ml KMeans IVF codebooks '
            "(generated — do not hand-edit).\n\n"
            "Written by tools/freeze_ivf_codebook.py; see its docstring "
            "for why the\ntrained codebook is a pure function of the "
            "corpus and how the fingerprint\nkey is computed. "
            "repr(float) round-trips bit-exact into both engines.\n"
            '"""\n\n'
            f"KEY_SQL = {KEY_SQL!r}\n\n"
        )
        fh.write("FROZEN_KMEANS_CODEBOOKS = {\n")
        for key, cen in books.items():
            fh.write(f"    {key}: [\n")
            for c in cen:
                fh.write("        [" + ", ".join(repr(x) for x in c) + "],\n")
            fh.write("    ],\n")
        fh.write("}\n")
    print(f"wrote {OUT}", file=sys.stderr)


if __name__ == "__main__":
    main()
