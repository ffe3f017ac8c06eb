"""Round-9 additions: the deterministic doc-id slice harness
(SPARK_GRAFT_DOC_SLICE_MOD) that makes the duplication-quadratic
pair oracles DuckDB-feasible at sf10, and the staged MinHash index's
subset-serving identity.
"""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from vector_graph_native_database__spark.sources.loaders import load_table

SF = "/root/testdata/sf0.001"


def _sliced_ids_spark(spark, table, key, mod):
    os.environ["SPARK_GRAFT_DOC_SLICE_MOD"] = str(mod)
    try:
        return {
            r[0]
            for r in load_table(spark, SF, table).select(key).collect()
        }
    finally:
        del os.environ["SPARK_GRAFT_DOC_SLICE_MOD"]


@pytest.mark.parametrize(
    "table,key", [("documents", "doc_id"), ("embeddings", "vec_id")]
)
def test_doc_slice_spark_duckdb_hash_parity(spark, table, key):
    # THE load-bearing property of the slice harness: Spark's inlined
    # 60-bit md5-prefix hash and the DuckDB view predicate keep the
    # exact same id set, for every K — otherwise every sliced value
    # check is vacuously wrong
    con = duckdb.connect()
    for mod in (2, 4, 8):
        got = _sliced_ids_spark(spark, table, key, mod)
        want = {
            r[0]
            for r in con.execute(
                f"SELECT {key} FROM read_parquet('{SF}/{table}.parquet') "
                f"WHERE ('0x' || substr(md5(CAST({key} AS VARCHAR)), 1, "
                f"15))::BIGINT % {mod} = 0"
            ).fetchall()
        }
        assert got == want, f"slice mismatch for {table} mod {mod}"
        assert 0 < len(got), "slice must be non-empty at mod <= 8"
    full = {
        r[0] for r in load_table(spark, SF, table).select(key).collect()
    }
    assert _sliced_ids_spark(spark, table, key, 1) == full


def test_doc_slice_off_by_default(spark):
    # no env → loaders pass the table through untouched
    assert os.environ.get("SPARK_GRAFT_DOC_SLICE_MOD") in (None, "", "0")
    n = load_table(spark, SF, "documents").count()
    con = duckdb.connect()
    want = con.execute(
        f"SELECT count(*) FROM read_parquet('{SF}/documents.parquet')"
    ).fetchone()[0]
    assert n == want


def test_minhash_staged_subset_identity(spark):
    # the subset-serving contract minhash_index_stage documents:
    # semi-joining the staged full-corpus signatures to a subset's
    # ids equals building signatures on the subset directly
    from vector_graph_native_database__spark.operators import dedup
    from vector_graph_native_database__spark.registry.common import model

    nodes, _, _ = model(spark, SF)
    _, sig_all = dedup.minhash_index_stage(spark, nodes, SF)
    subset = nodes.filter(F.col("id").cast("long") % 3 == 0)
    served = (
        sig_all.join(subset.select("id"), "id", "left_semi")
        .orderBy("id", "perm")
        .collect()
    )
    built = (
        dedup.minhash_signatures(dedup.shingles(subset, "id", "text", 2), 12)
        .orderBy("id", "perm")
        .collect()
    )
    assert served == built
