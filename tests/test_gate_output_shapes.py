"""Lint every driver-gate output shape BEFORE the driver does.

The driver canonicalizes each queries() result with a pandas
sort/factorize pass that throws on unhashable cells — any top-level
ArrayType/MapType column crashes the grade (r2 collect_values /
doc_winnow, r3 label_centroids all died this way). Similarly, a DuckDB
oracle whose aggregate lands on HUGEINT (sum over BIGINT) or a nested
type diverges from Spark's schema. This test fails on the SHAPE at
pytest time, so the next regression never reaches the driver
(VERDICT r2 ask #7 / r3 ask #5).

Spark side checks only the analyzed schema — no job runs for pure
plans — but a handful of entries execute eagerly when BUILT (KMeans
fits, streaming to memory sinks); at sf0.001 those stay cheap.
"""

import duckdb
import pytest
from pyspark.sql.types import ArrayType, MapType, StructType

import __spark_entry__ as entrymod

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def _complex_fields(schema):
    return [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]


def test_spark_gate_outputs_are_flat(spark, sf_dir):
    bad = {}
    for name, fn in entrymod.queries().items():
        df = fn(spark, sf_dir)
        hits = _complex_fields(df.schema)
        if hits:
            bad[name] = hits
    assert not bad, f"queries() results with array/map/struct columns: {bad}"


def test_oracle_outputs_have_no_hugeint_or_nested(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    bad = {}
    for name, sql in entrymod.oracle_sql().items():
        # DESCRIBE resolves the output schema without executing the query
        cols = con.execute(f"DESCRIBE {sql}").fetchall()
        hits = [
            f"{c[0]}:{c[1]}"
            for c in cols
            if "HUGEINT" in c[1].upper()
            or "[]" in c[1]
            or c[1].upper().startswith(("STRUCT", "MAP", "LIST", "UNION"))
        ]
        if hits:
            bad[name] = hits
    assert not bad, f"oracle_sql() results with HUGEINT/nested columns: {bad}"


def test_every_query_has_oracle_or_is_known_rows_only():
    """Each queries() key either ships an oracle or is one of the
    explicitly-acknowledged sketch/sample keys the driver grades
    rows-only (each of those is covered by a check_* twin)."""
    rows_only = {
        "dedup_minhash",
        "dedup_incremental_minhash",  # twin: check_incremental_minhash_parity
        "dedup_incremental_embedding",  # twin: check_incremental_embedding
        "dedup_simhash",
        "dedup_embedding_auto",
        "ann_lsh_topk",
        "ann_ivf_topk",
        "doc_fingerprint",
        "doc_winnow",
        "winnow_overlap",  # twin: check_winnow_overlap_bound
        "stream_ingest_neardup",  # twin: check_stream_neardup_parity
        "quality_classifier",  # twin: check_classifier_holdout
        "dedup_binary_minhash",  # twin: check_binary_minhash_subset
        "decontaminate_fuzzy_banded",  # twin: check_banded_decon_subset
        # pagerank_copurchase: promoted to a full DuckDB oracle in r7
        # (unrolled 12-round power iteration); parity twin retained
        "stratified_sample",
        "stream_sessionize",
        "approx_heavy_hitters",
        "approx_percentiles",
        "approx_distinct_parts",
        "hll_sketch_rollup",
    }
    oracles = set(entrymod.oracle_sql())
    missing = set(entrymod.queries()) - oracles - rows_only
    assert not missing, f"queries() keys without an oracle entry: {missing}"
