"""Multimodal column queries.

The payload is the document's utf-8 bytes standing in for an image
blob; the decode stage is the DETERMINISTIC FAKE described in
multimodal/columns.py, so even the mapInPandas (Arrow) path is
value-checked against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..multimodal import (
    attach_binary,
    byte_histogram_features,
    fake_decode_image_meta,
    frame_sample,
    resize_plan,
)
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


def q_mm_feature_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flattened to scalar rows (id, bin, val): complex-typed columns
    are banned from registry outputs (driver canonicalizer sorts with
    pandas, which cannot order lists)."""
    from pyspark.sql import functions as F

    nodes, _, _ = model(spark, sf_dir)
    feats = byte_histogram_features(attach_binary(nodes))
    return feats.select("id", F.posexplode("features").alias("bin", "val"))


def q_mm_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    nodes, _, _ = model(spark, sf_dir)
    return resize_plan(fake_decode_image_meta(attach_binary(nodes)))


def q_mm_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard manifest for the binary tier: blobs dealt into 4 hash
    shards and laid out greedily into 4 KiB bins (the write-plan a
    blob-store exporter consumes). Reuses the generic packing
    operator with weight = payload bytes."""
    from ..operators.sampling import pack_greedy

    nodes, _, _ = model(spark, sf_dir)
    b = attach_binary(nodes).select("id", "n_bytes")
    return pack_greedy(
        b, "n_bytes", budget=4096, n_shards=4, salt="mmshard"
    )


QUERIES = {
    "mm_binary_stats": q_mm_binary_stats,
    "mm_shard_manifest": q_mm_shard_manifest,
    "mm_image_meta": q_mm_image_meta,
    "mm_frame_sample": q_mm_frame_sample,
    "mm_feature_hist": q_mm_feature_hist,
    "mm_resize_plan": q_mm_resize_plan,
}

ORACLES = {
    "mm_shard_manifest": ORACLE_PRELUDE
    + """,
bw AS (SELECT id, octet_length(encode(text)) AS w FROM nodes),
sh AS (
  SELECT id, w,
         ('0x' || substr(md5('mmshard' || id), 1, 15))::BIGINT % 10000 AS bkt,
         CAST((('0x' || substr(md5('mmshard' || id), 1, 15))::BIGINT % 10000)
              % 4 AS INT) AS shard
  FROM bw
),
ofs AS (
  SELECT id, w, shard,
         CAST(coalesce(sum(w) OVER (
           PARTITION BY shard ORDER BY bkt, id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS start_offset
  FROM sh
)
SELECT id, w AS weight, shard, start_offset,
       start_offset // 4096 AS bin_id
FROM ofs""",
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
    # text is ASCII in the harness (verified), so ascii(substr) == byte
    "mm_feature_hist": ORACLE_PRELUDE
    + """,
bytes_ AS (
  SELECT id, ascii(substr(text, i.i, 1)) // 16 AS bin
  FROM nodes CROSS JOIN LATERAL
    (SELECT unnest(generate_series(1, length(text))) AS i) i
  WHERE length(text) > 0
),
counts AS (SELECT id, bin, count(*) AS c FROM bytes_ GROUP BY id, bin),
grid AS (
  SELECT n.id, b.b, length(n.text) AS total
  FROM nodes n CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS b) b
)
SELECT g.id, CAST(g.b AS INT) AS bin,
       round(CASE WHEN g.total > 0
             THEN coalesce(c.c, 0) * 1.0 / g.total
             ELSE 0.0 END, 6) AS val
FROM grid g LEFT JOIN counts c ON c.id = g.id AND c.bin = g.b""",
    "mm_resize_plan": ORACLE_PRELUDE
    + """
SELECT id, width, height,
       greatest(1, CAST(floor(width * s) AS INT)) AS out_w,
       greatest(1, CAST(floor(height * s) AS INT)) AS out_h,
       round(s, 6) AS scale
FROM (
  SELECT id, width, height, least(64.0 / width, 64.0 / height) AS s
  FROM (SELECT id, CAST(64 + (n % 577) AS INT) AS width,
               CAST(64 + ((n * 31) % 449) AS INT) AS height
        FROM (SELECT id, octet_length(encode(text)) AS n FROM nodes))
)""",
}


def q_mm_audio_rms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..multimodal.columns import audio_window_rms

    nodes, _, _ = model(spark, sf_dir)
    return audio_window_rms(attach_binary(nodes))


QUERIES["mm_audio_rms"] = q_mm_audio_rms
# text is ASCII in the harness (verified above), so ascii(substr) == byte
ORACLES["mm_audio_rms"] = ORACLE_PRELUDE + """,
b AS (SELECT id, text, octet_length(encode(text)) AS n FROM nodes),
frames AS (
  SELECT id, text, n,
         unnest(generate_series(
           0, CASE WHEN n < 256 THEN 0 ELSE (n - 256) // 128 END)) AS fi
  FROM b WHERE n > 0
),
vals AS (
  SELECT f.id, f.fi,
         ascii(substr(f.text, f.fi * 128 + i.i, 1)) - 128.0 AS v
  FROM frames f CROSS JOIN LATERAL (
    SELECT unnest(generate_series(
      1, CASE WHEN f.n < 256 THEN f.n ELSE 256 END)) AS i) i
),
rms AS (
  SELECT id, fi, sqrt(avg(v * v)) AS r FROM vals GROUP BY id, fi
),
summary AS (
  SELECT id, count(*) AS n_frames,
         floor(avg(r) * 1000000.0 + 0.5) / 1000000.0 AS mean_rms,
         floor(max(r) * 1000000.0 + 0.5) / 1000000.0 AS max_rms
  FROM rms GROUP BY id
)
SELECT b.id, COALESCE(s.n_frames, 0) AS n_frames,
       COALESCE(s.mean_rms, 0.0) AS mean_rms,
       COALESCE(s.max_rms, 0.0) AS max_rms
FROM b LEFT JOIN summary s ON s.id = b.id"""


def q_mm_video_shots(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..multimodal.columns import video_shot_boundaries

    nodes, _, _ = model(spark, sf_dir)
    return video_shot_boundaries(attach_binary(nodes))


QUERIES["mm_video_shots"] = q_mm_video_shots
# L1 distances are sums of k/64 terms (exact powers of two), so the
# threshold compare is float-exact in both engines
ORACLES["mm_video_shots"] = ORACLE_PRELUDE + """,
b AS (SELECT id, text, octet_length(encode(text)) // 64 AS n FROM nodes),
frames AS (
  SELECT id, text, n, unnest(generate_series(0, n - 1)) AS fi
  FROM b WHERE n > 0
),
pos AS (
  SELECT f.id, f.fi,
         ascii(substr(f.text, f.fi * 64 + i.i, 1)) // 16 AS bin
  FROM frames f CROSS JOIN LATERAL (
    SELECT unnest(generate_series(1, 64)) AS i) i
),
hist AS (
  SELECT id, fi, bin, count(*) / 64.0 AS h FROM pos GROUP BY 1, 2, 3
),
grid AS (
  SELECT DISTINCT f.id, f.fi, g.bin
  FROM frames f CROSS JOIN (
    SELECT unnest(generate_series(0, 15)) AS bin) g
),
hfull AS (
  SELECT g.id, g.fi, g.bin, COALESCE(h.h, 0.0) AS h
  FROM grid g LEFT JOIN hist h
    ON h.id = g.id AND h.fi = g.fi AND h.bin = g.bin
),
dists AS (
  SELECT a.id, a.fi + 1 AS boundary, sum(abs(a.h - nx.h)) AS d
  FROM hfull a JOIN hfull nx
    ON nx.id = a.id AND nx.fi = a.fi + 1 AND nx.bin = a.bin
  GROUP BY a.id, a.fi
),
cuts AS (SELECT id, boundary FROM dists WHERE d > 0.5),
summary AS (
  SELECT b.id, b.n AS n_frames,
         CASE WHEN b.n = 0 THEN 0
              ELSE COALESCE(c.nc, 0) + 1 END AS n_shots,
         COALESCE(c.fb, -1) AS first_boundary
  FROM b LEFT JOIN (
    SELECT id, count(*) AS nc, min(boundary) AS fb FROM cuts GROUP BY id
  ) c ON c.id = b.id
)
SELECT id, n_frames, n_shots, first_boundary FROM summary"""


def q_mm_audio_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio decode-stage plumbing on the fake backend (the real
    backend — soundfile probe → stdlib wave — is pinned by pytest on
    generated WAVs; the gate runs the deterministic fake so results
    value-check without codec libraries)."""
    from ..multimodal.columns import decode_audio_meta

    nodes, _, _ = model(spark, sf_dir)
    return decode_audio_meta(attach_binary(nodes))


QUERIES["mm_audio_meta"] = q_mm_audio_meta
ORACLES["mm_audio_meta"] = ORACLE_PRELUDE + """
SELECT id, n AS n_bytes, CAST(1 + (n % 2) AS INT) AS n_channels,
       16000 AS sample_rate, n // 2 AS n_samples
FROM (SELECT id, octet_length(encode(text)) AS n FROM nodes)"""
