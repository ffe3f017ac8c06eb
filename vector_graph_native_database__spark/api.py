"""The reference's full API surface as a Python engine facade.

One method per HTTP route of the reference (SURVEY.md §2.9,
``/root/reference/app.py:753-940``), so a user of the reference can
switch to this engine and run every call they run today — with the
same observable semantics (embedding precedence, upsert-on-create,
insert-only edges with endpoint validation, cascade delete, 404 →
``KeyError``) — while state lives in three DataFrames instead of
SQLite and every operation is a distributed plan.

State model: the engine holds the current ``nodes`` / ``embeddings``
/ ``edges`` DataFrames and mutations REASSIGN them (immutable
snapshots, the DataFrame idiom). Single-row convenience methods wrap
the batch operators in ``operators/crud.py``; batch ingestion should
call those operators directly, and a durable deployment writes each
new state (or a Delta MERGE) instead of holding it in memory.
"""

from __future__ import annotations

import uuid
from collections.abc import Mapping

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.textfn import EMBED_DIM, embed_hash_df
from .operators import crud
from .operators.bm25 import bm25_topk
from .operators.graph import graph_search as _graph_search
from .operators.hybrid import hybrid_search as _hybrid_search
from .operators.vector_search import vector_topk

NODES_SCHEMA = "id string, text string, metadata map<string,string>"
EMB_SCHEMA = "node_id string, vector array<double>, dim int"
EDGES_SCHEMA = (
    "id string, src string, dst string, type string, weight double"
)


class VectorGraphEngine:
    """Route-for-route replacement for the reference server."""

    def __init__(
        self,
        spark: SparkSession,
        nodes: DataFrame | None = None,
        embeddings: DataFrame | None = None,
        edges: DataFrame | None = None,
    ):
        self.spark = spark
        self.nodes = (
            nodes
            if nodes is not None
            else spark.createDataFrame([], NODES_SCHEMA)
        )
        self.embeddings = (
            embeddings
            if embeddings is not None
            else spark.createDataFrame([], EMB_SCHEMA)
        )
        self.edges = (
            edges
            if edges is not None
            else spark.createDataFrame([], EDGES_SCHEMA)
        )

    # -- helpers -----------------------------------------------------------

    @staticmethod
    def _commit(df: DataFrame) -> DataFrame:
        """Truncate lineage after a mutation (deferred checkpoint).

        Without this, every single-row mutation stacks another
        upsert/anti-join onto the plan and the Nth operation pays for
        all N-1 before it; with it, each state is a shallow plan over
        the previous checkpoint. A durable deployment writes the new
        state (or a Delta MERGE) here instead.
        """
        return df.localCheckpoint(eager=False)

    def _encode(self, text: str) -> list[float]:
        """Hash-embed one text (the reference's auto-embedding)."""
        row = embed_hash_df(
            self.spark.createDataFrame([("q", text)], "id string, text string")
        ).collect()[0]
        return list(row["vector"])

    def _query_frame(self, text: str) -> DataFrame:
        return self.spark.createDataFrame(
            [(self._encode(text),)], "qvec array<double>"
        )

    def _node_exists(self, node_id: str) -> bool:
        return bool(self.nodes.filter(F.col("id") == node_id).take(1))

    def _put_embedding(self, node_id: str, vector: list[float]) -> None:
        batch = self.spark.createDataFrame(
            [(node_id, [float(v) for v in vector], len(vector))], EMB_SCHEMA
        )
        self.embeddings = self._commit(
            crud.upsert(self.embeddings, batch, "node_id")
        )

    # -- node routes (app.py:753-834) --------------------------------------

    def create_node(
        self,
        text: str,
        metadata: Mapping[str, str] | None = None,
        node_id: str | None = None,
        embedding: list[float] | None = None,
        auto_embed: bool = True,
    ) -> str:
        """POST /nodes — create IS an upsert (app.py:131-134).

        Embedding precedence (app.py:762-766): explicit ``embedding``
        beats ``auto_embed``; neither → no vector stored. Returns the
        node id (UUID when not supplied — SURVEY §4.8.7 replaces the
        reference's collision-prone timestamp ids).
        """
        nid = node_id if node_id is not None else f"node-{uuid.uuid4()}"
        batch = self.spark.createDataFrame(
            [(nid, text, dict(metadata or {}))], NODES_SCHEMA
        )
        self.nodes = self._commit(crud.upsert(self.nodes, batch, "id"))
        if embedding is not None:
            self._put_embedding(nid, embedding)
        elif auto_embed:
            self._put_embedding(nid, self._encode(text))
        return nid

    def get_node(self, node_id: str) -> dict:
        """GET /nodes/{id} → node + has_embedding + outgoing/incoming."""
        rows = self.nodes.filter(F.col("id") == node_id).collect()
        if not rows:
            raise KeyError(node_id)
        n = rows[0]
        has_emb = bool(
            self.embeddings.filter(F.col("node_id") == node_id).take(1)
        )
        outgoing = [
            {"id": r["id"], "target_id": r["dst"], "type": r["type"],
             "weight": r["weight"]}
            for r in self.edges.filter(F.col("src") == node_id).collect()
        ]
        incoming = [
            {"id": r["id"], "source_id": r["src"], "type": r["type"],
             "weight": r["weight"]}
            for r in self.edges.filter(F.col("dst") == node_id).collect()
        ]
        return {
            "id": n["id"],
            "text": n["text"],
            "metadata": dict(n["metadata"] or {}),
            "has_embedding": has_emb,
            "outgoing": outgoing,
            "incoming": incoming,
        }

    def update_node(
        self,
        node_id: str,
        text: str | None = None,
        metadata: Mapping[str, str] | None = None,
        embedding: list[float] | None = None,
        regen_embedding: bool = False,
    ) -> None:
        """PUT /nodes/{id} — partial update; None keeps the old value.

        Embedding precedence (app.py:802-808): explicit >
        ``regen_embedding`` (re-encode the NEW text) > keep.
        """
        if not self._node_exists(node_id):
            raise KeyError(node_id)
        changes = self.spark.createDataFrame(
            [(node_id, text, dict(metadata) if metadata is not None else None)],
            NODES_SCHEMA,
        )
        self.nodes = self._commit(
            crud.update_partial(self.nodes, changes, "id", ["text", "metadata"])
        )
        if embedding is not None:
            self._put_embedding(node_id, embedding)
        elif regen_embedding:
            new_text = (
                text
                if text is not None
                else self.nodes.filter(F.col("id") == node_id)
                .collect()[0]["text"]
            )
            self._put_embedding(node_id, self._encode(new_text))

    def delete_node(self, node_id: str) -> None:
        """DELETE /nodes/{id} — cascade (embedding + incident edges)."""
        if not self._node_exists(node_id):
            raise KeyError(node_id)
        d = self.spark.createDataFrame([(node_id,)], "id string")
        n2, emb2, e2 = crud.node_delete_cascade(
            self.nodes, self.embeddings, self.edges, d
        )
        self.nodes = self._commit(n2)
        self.embeddings = self._commit(emb2)
        self.edges = self._commit(e2)

    # -- edge routes (app.py:839-877) --------------------------------------

    def create_edge(
        self,
        src: str,
        dst: str,
        edge_type: str,
        weight: float = 1.0,
        edge_id: str | None = None,
    ) -> str:
        """POST /edges — insert-only; both endpoints must exist."""
        for endpoint in (src, dst):
            if not self._node_exists(endpoint):
                raise KeyError(endpoint)
        eid = edge_id if edge_id is not None else f"edge-{uuid.uuid4()}"
        batch = self.spark.createDataFrame(
            [(eid, src, dst, edge_type, float(weight))], EDGES_SCHEMA
        )
        self.edges = self._commit(
            crud.edge_insert_validated(self.edges, self.nodes, batch)
        )
        return eid

    def get_edge(self, edge_id: str) -> dict:
        rows = self.edges.filter(F.col("id") == edge_id).collect()
        if not rows:
            raise KeyError(edge_id)
        r = rows[0]
        return {
            "id": r["id"], "source": r["src"], "target": r["dst"],
            "type": r["type"], "weight": r["weight"],
        }

    def update_edge(
        self,
        edge_id: str,
        edge_type: str | None = None,
        weight: float | None = None,
    ) -> None:
        """PUT /edges/{id} — partial update of type/weight."""
        if not self.edges.filter(F.col("id") == edge_id).take(1):
            raise KeyError(edge_id)
        changes = self.spark.createDataFrame(
            [(edge_id, edge_type,
              float(weight) if weight is not None else None)],
            "id string, type string, weight double",
        )
        self.edges = self._commit(
            crud.update_partial(self.edges, changes, "id", ["type", "weight"])
        )

    def delete_edge(self, edge_id: str) -> None:
        if not self.edges.filter(F.col("id") == edge_id).take(1):
            raise KeyError(edge_id)
        self.edges = self._commit(
            crud.edge_delete(
                self.edges,
                self.spark.createDataFrame([(edge_id,)], "id string"),
            )
        )

    # -- search routes (app.py:882-920) ------------------------------------

    def vector_search(
        self,
        query_text: str,
        top_k: int = 10,
        metadata_filter: Mapping[str, str] | None = None,
    ) -> list[dict]:
        """POST /search/vector."""
        df = vector_topk(
            self.nodes,
            self.embeddings,
            self._query_frame(query_text),
            top_k=top_k,
            meta_filter=metadata_filter,
        )
        return [
            {"id": r["id"], "text": r["text"], "vector_score": r["score"]}
            for r in df.collect()
        ]

    def graph_search(
        self, start_id: str, depth: int = 2, edge_type: str | None = None
    ) -> dict:
        """GET /search/graph — envelope like the reference's."""
        if not self._node_exists(start_id):
            raise KeyError(start_id)
        result_nodes, induced = _graph_search(
            self.nodes, self.edges, start_id, depth, edge_type
        )
        return {
            "start_id": start_id,
            "depth": depth,
            "edge_type": edge_type,
            "nodes": [r.asDict() for r in result_nodes.collect()],
            "edges": [r.asDict() for r in induced.collect()],
        }

    def hybrid_search(
        self,
        query_text: str,
        top_k: int = 10,
        vector_weight: float = 0.5,
        graph_weight: float = 0.5,
        graph_start_id: str | None = None,
        graph_depth: int = 2,
    ) -> list[dict]:
        """POST /search/hybrid."""
        if graph_start_id is not None and not self._node_exists(graph_start_id):
            raise KeyError(graph_start_id)
        df = _hybrid_search(
            self.nodes,
            self.embeddings,
            self.edges,
            self._query_frame(query_text),
            vector_weight=vector_weight,
            graph_weight=graph_weight,
            top_k=top_k,
            graph_start_id=graph_start_id,
            graph_depth=graph_depth,
        )
        return [r.asDict() for r in df.collect()]

    def bm25_search(self, query_text: str, top_k: int = 10) -> list[dict]:
        """The standalone BM25 capability (no reference endpoint —
        advertised in its readme but never routed; SURVEY §4.8.3)."""
        return [
            r.asDict()
            for r in bm25_topk(self.nodes, query_text, top_k).collect()
        ]

    # -- misc routes (app.py:923-940) --------------------------------------

    def health(self) -> dict:
        return {"status": "ok"}

    def stats(self) -> dict:
        """GET /stats — one multi-aggregate pass + two counts."""
        return {
            "total_nodes": self.nodes.count(),
            "nodes_with_embeddings": self.embeddings.select(
                "node_id"
            ).distinct().count(),
            "total_edges": self.edges.count(),
        }
