"""Multimodal column queries.

The payload is the document's utf-8 bytes standing in for an image
blob; the decode stage is the DETERMINISTIC FAKE described in
multimodal/columns.py, so even the mapInPandas (Arrow) path is
value-checked against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..multimodal import attach_binary, fake_decode_image_meta, frame_sample
from .common import ORACLE_PRELUDE, model


def q_mm_binary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    nodes, _, _ = model(spark, sf_dir)
    return attach_binary(nodes).select("id", "n_bytes", "content_md5", "mime")


def q_mm_image_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    nodes, _, _ = model(spark, sf_dir)
    return fake_decode_image_meta(attach_binary(nodes))


def q_mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    nodes, _, _ = model(spark, sf_dir)
    return frame_sample(attach_binary(nodes))


QUERIES = {
    "mm_binary_stats": q_mm_binary_stats,
    "mm_image_meta": q_mm_image_meta,
    "mm_frame_sample": q_mm_frame_sample,
}

ORACLES = {
    "mm_binary_stats": ORACLE_PRELUDE
    + """
SELECT id, octet_length(encode(text)) AS n_bytes, md5(text) AS content_md5,
       'application/octet-stream' AS mime
FROM nodes""",
    "mm_image_meta": ORACLE_PRELUDE
    + """
SELECT id, n AS n_bytes, CAST(64 + (n % 577) AS INT) AS width,
       CAST(64 + ((n * 31) % 449) AS INT) AS height, 3 AS channels
FROM (SELECT id, octet_length(encode(text)) AS n FROM nodes)""",
    "mm_frame_sample": ORACLE_PRELUDE
    + """
SELECT id, f.f AS frame_idx, f.f * 64 AS frame_offset
FROM (
  SELECT id, least(8, greatest(1, octet_length(encode(text)) // 64)) AS nf
  FROM nodes
) n CROSS JOIN LATERAL (SELECT unnest(generate_series(0, nf - 1)) AS f) f""",
}
