"""CRUD as batch DataFrame transitions.

The reference mutates row-at-a-time over SQLite
(``/root/reference/app.py:126-348``); the Spark-native equivalent is
batch state transitions: a mutation batch arrives as a DataFrame and
the new table state is produced with joins — upsert = anti-join +
union (latest wins), partial update = coalesce-merge, cascade delete
= anti-joins, FK validation = semi-joins. On a Delta/Iceberg-backed
deployment these are exactly the MERGE/DELETE plans; here they are
pure DataFrames so they compose with the rest of the engine and with
the DuckDB oracle.

Semantics preserved from the reference:
- node create IS an upsert (INSERT OR REPLACE, ``app.py:131-134``)
  while edge create is insert-only with endpoint validation
  (``app.py:280-283, 843-846``) — quirk §4.8.8, replicated.
- partial updates keep the old value when the new one is NULL
  (``app.py:139-161, 288-308``).
- deleting a node cascades to its embedding and ALL incident edges,
  both directions (``app.py:105,118-119``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def upsert(
    table: DataFrame, batch: DataFrame, key: str, broadcast_batch: bool = True
) -> DataFrame:
    """INSERT OR REPLACE semantics: batch rows win on key collision.

    The anti-join build side is the mutation batch — semantically
    small next to the table — so it is broadcast by default and the
    table side stays a map-only scan (no corpus shuffle). Pass
    ``broadcast_batch=False`` for bulk backfills where the batch
    rivals the table; AQE then picks the join strategy from runtime
    sizes. A malformed batch with duplicate keys is deduped
    deterministically (max over the remaining columns) so the result
    never carries duplicate primary keys.
    """
    from pyspark.sql.types import MapType
    from pyspark.sql.window import Window

    # maps are not orderable — sort their JSON rendering instead so
    # dedup stays deterministic for any schema
    order_cols = [
        F.desc(F.to_json(f.name))
        if isinstance(f.dataType, MapType)
        else F.desc(f.name)
        for f in batch.schema.fields
        if f.name != key
    ]
    w = Window.partitionBy(key).orderBy(*order_cols)
    deduped = (
        batch.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    anti_side = F.broadcast(deduped) if broadcast_batch else deduped
    return table.join(anti_side, key, "left_anti").unionByName(deduped)


def update_partial(
    table: DataFrame, changes: DataFrame, key: str, cols: list[str]
) -> DataFrame:
    """MERGE ... UPDATE SET col = coalesce(new, old) for listed cols.

    ``changes`` carries NULL for "keep existing". Rows not in
    ``changes`` pass through untouched; change rows for missing keys
    are ignored (the reference 404s them at the route layer).
    """
    renamed = changes.select(
        F.col(key), *[F.col(c).alias(f"__new_{c}") for c in cols]
    )
    merged = table.join(F.broadcast(renamed), key, "left_outer")
    for c in cols:
        merged = merged.withColumn(
            c, F.coalesce(F.col(f"__new_{c}"), F.col(c))
        ).drop(f"__new_{c}")
    return merged


def edge_insert_validated(
    edges: DataFrame, nodes: DataFrame, batch: DataFrame
) -> DataFrame:
    """Append edges whose BOTH endpoints exist; rows failing either
    check are rejected (reference 404s them, ``app.py:843-846``).

    Endpoint existence is resolved by probing the nodes table with
    the BROADCAST batch key set first (map-only scan of nodes, small
    result), then semi-joining the batch against that small verified
    set — the corpus-sized id column is never shuffled for a
    mutation-sized batch.
    """
    ids = nodes.select("id")
    src_ok = ids.join(
        F.broadcast(batch.select(F.col("src").alias("id")).distinct()),
        "id",
        "left_semi",
    )
    dst_ok = ids.join(
        F.broadcast(batch.select(F.col("dst").alias("id")).distinct()),
        "id",
        "left_semi",
    )
    valid = batch.join(
        F.broadcast(src_ok), batch["src"] == src_ok["id"], "left_semi"
    ).join(F.broadcast(dst_ok), batch["dst"] == dst_ok["id"], "left_semi")
    return edges.unionByName(valid)


def node_delete_cascade(
    nodes: DataFrame,
    embeddings: DataFrame,
    edges: DataFrame,
    delete_ids: DataFrame,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Delete nodes + cascade: embeddings and ALL incident edges.

    ``delete_ids`` is a 1-column (id) frame; all three results are
    broadcast anti-joins (delete sets are mutation-sized), so each
    table side stays a map-only scan.
    """
    d = F.broadcast(delete_ids.select("id"))
    nodes2 = nodes.join(d, "id", "left_anti")
    emb2 = embeddings.join(
        d, embeddings["node_id"] == d["id"], "left_anti"
    )
    edges2 = edges.join(
        d, (edges["src"] == d["id"]) | (edges["dst"] == d["id"]), "left_anti"
    )
    return nodes2, emb2, edges2


def edge_delete(edges: DataFrame, delete_ids: DataFrame) -> DataFrame:
    return edges.join(F.broadcast(delete_ids.select("id")), "id", "left_anti")
