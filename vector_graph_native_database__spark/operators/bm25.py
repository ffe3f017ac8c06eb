"""Okapi BM25 scoring as pure DataFrame aggregations.

The reference delegates to ``rank_bm25.BM25Okapi`` with library
defaults (``/root/reference/app.py:460-489``): k1=1.5, b=0.75, and
the Okapi idf ``ln((N - df + 0.5)/(df + 0.5))`` with negative idfs
floored to ``epsilon * average_idf`` (epsilon=0.25, average over ALL
corpus terms' raw idfs). Query tokens are counted with multiplicity.
Note the reference exposes BM25 via no HTTP endpoint and does NOT
fuse it into hybrid (``app.py:670-671``) — it is a standalone
capability, which we implement faithfully.

Spark shape — the index IS two aggregate DataFrames:
``explode(tokens)`` → per-(doc,term) tf + per-doc length, one
``groupBy(term)`` for document frequencies, one single-row global
aggregate (N, avgdl, avg raw idf) broadcast back. All
map-side-combinable shuffles on compact keys. Scoring stays
broadcast-only on top of those aggregates: idf is materialized ONLY
for the query's terms (a |q|-row frame), so the per-query work after
the corpus stats is two broadcast joins — no full-vocabulary shuffle.
Unlike the reference's rebuild-the-whole-index-per-write, these
aggregates are recomputed lazily per query batch — at 100 TB they can
be persisted and incrementally maintained, but semantics stay
identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..functions.textfn import tokenize

K1 = 1.5
B = 0.75
EPSILON = 0.25


def corpus_stats(
    nodes: DataFrame, persist: bool = False
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """→ (tf(id, tok, tf), doclen(id, dl), df_(tok, df)).

    Raw corpus aggregates; idf derivation (which needs the global
    N / avg-idf scalars) happens in :func:`_query_idf`.

    All three frames descend from ONE ``groupBy(id, tok)`` posting
    frame. ``explode_outer`` keeps zero-token docs as a null-token
    row (tf contribution 0) so they still appear in ``doclen`` with
    dl=0 — rank_bm25 averages doc length over ALL docs, empty ones
    included.

    ``persist`` trades a blocking cache-materialization of the
    posting frame for cheap reuse: one-shot queries (and the bench's
    cold path) should leave it off — on a 32-thread local run the
    3-4 lazy recomputes overlap and finish ~2× faster than the
    serialized cache build — while repeated-query workloads should
    turn it on (or call :func:`build_index` once): warm queries then
    skip the scan+explode entirely. A 100 TB deployment persists
    these aggregates as real tables and maintains them
    incrementally; either way scoring semantics are identical.
    """
    posting = posting_frame(nodes)
    if persist:
        # CacheManager keys on the canonical logical plan, so every
        # query over the same corpus shares one materialization.
        posting = posting.persist(StorageLevel.MEMORY_AND_DISK)
    return stats_from_posting(posting)


def posting_frame(nodes: DataFrame) -> DataFrame:
    """(id, text) → posting list (id, tok, tf); zero-token docs keep a
    null-token row with tf=0 so doc-length stats still see them.
    This is the frame a deployment persists (partitioned by tok) and
    the streaming path maintains incrementally (streaming/ingest.py).
    """
    return (
        nodes.select("id", F.explode_outer(tokenize("text")).alias("tok"))
        .groupBy("id", "tok")
        .agg(F.count(F.col("tok")).alias("tf"))
    )


def stats_from_posting(
    posting: DataFrame,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Posting list → the (tf, doclen, df_) triple scoring consumes."""
    doclen = posting.groupBy("id").agg(F.sum("tf").alias("dl"))
    tf = posting.filter(F.col("tok").isNotNull())
    df_ = tf.groupBy("tok").agg(F.count("*").alias("df"))
    return tf, doclen, df_


def build_index(nodes: DataFrame) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Materialize the corpus stats once for a repeated-query workload.

    The in-memory analog of the persisted posting-list table a
    large-scale deployment maintains; pass the result to
    :func:`bm25_scores` / :func:`bm25_topk` as ``stats=``.
    """
    return corpus_stats(nodes, persist=True)


def staged_index(nodes: DataFrame) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Stats over an eagerly STAGED posting frame — the deployment
    shape where the posting list already exists as a table and a
    query pays only the scoring joins.

    ``localCheckpoint(eager=True)`` materializes the scan → explode →
    groupBy posting build exactly once and truncates lineage, so the
    3-4 downstream consumers (tf, doclen, df_, global idf average)
    read the staged partitions instead of re-deriving them from the
    parquet scan (the cold path's dominant cost). Same staging idiom
    as dedup_cluster_from_pairs. A 100 TB deployment swaps the
    checkpoint for a persisted posting table partitioned by tok,
    incrementally maintained (streaming/ingest.py proves the
    maintained stats equal the recompute); scoring semantics are
    byte-identical either way.
    """
    posting = posting_frame(nodes).localCheckpoint(eager=True)
    return stats_from_posting(posting)


def staged_posting_frame(spark, nodes: DataFrame, cache_key: str) -> DataFrame:
    """Build-once / read-many posting table staged as scratch parquet
    → the (id, tok, tf) frame read back from disk.

    The posting list is a pure function of the corpus text, so it is
    written ONCE per ``cache_key`` (normally the sf_dir, salted with
    the documents parquet's mtime/size) under the shared scratch root
    — the ``ivf_index_stage`` / ``minhash_index_stage`` idiom applied
    to the lexical-search family — and every BM25 consumer reads the
    same files instead of re-tokenizing the corpus per query. The
    doc-length and document-frequency aggregates are staged alongside
    (computed FROM the written posting, so the artifacts are
    consistent by construction); :func:`bm25_index_stage` returns all
    three.

    Postings are row-local per document (tok strings and tf longs
    roundtrip parquet exactly), so a per-id subset serves from the
    SAME staged frame: ``posting.join(ids, "id", "left_semi")`` then
    :func:`stats_from_posting` equals building the index on the
    subset directly — corpus-GLOBAL stats (df, N, avgdl) are
    re-aggregated over the subset's rows, which is exactly the
    honest post-filter collection statistics (this is how the
    deduped hard-negative miner shares the build).
    """
    import os

    from .staging import staged_index_dir, write_staged

    final = staged_index_dir(
        "bm25_index", cache_key, "tok-v2", salt_file="documents.parquet"
    )

    def _write(tmp: str) -> None:
        # token-clustered layout: range-partitioned + sorted by tok,
        # so a query's In(tok, …) predicate skips whole row groups
        # via min/max stats — the posting-table layout a deployment
        # uses (partition/sort by term) so queries read only their
        # terms' posting lists
        posting_frame(nodes).repartitionByRange(8, "tok").sortWithinPartitions(
            "tok"
        ).write.parquet(os.path.join(tmp, "posting"))
        p = spark.read.parquet(os.path.join(tmp, "posting"))
        _, doclen, df_ = stats_from_posting(p)
        doclen.write.parquet(os.path.join(tmp, "doclen"))
        df_.write.parquet(os.path.join(tmp, "df"))

    write_staged(final, _write)
    return spark.read.parquet(os.path.join(final, "posting"))


def bm25_index_stage(
    spark, nodes: DataFrame, cache_key: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """→ (tf, doclen, df_) served entirely from the staged posting
    artifact (:func:`staged_posting_frame`): the full-corpus serving
    path where a query pays ONLY the |q|-row idf derivation plus the
    scoring joins — zero tokenize, zero corpus-wide aggregation. The
    doclen/df aggregates read their own staged parquet (doc-count and
    vocabulary sized — small), not recomputes over the posting. A
    100 TB deployment maintains these as real tables next to the
    corpus (streaming/ingest.py proves the incrementally-maintained
    stats equal the recompute); scoring is value-identical either way
    because longs and tok strings roundtrip parquet bit-exactly.
    """
    import os

    from .staging import staged_index_dir

    posting = staged_posting_frame(spark, nodes, cache_key)
    final = staged_index_dir(
        "bm25_index", cache_key, "tok-v2", salt_file="documents.parquet"
    )
    tf = posting.filter(F.col("tok").isNotNull())
    doclen = spark.read.parquet(os.path.join(final, "doclen"))
    df_ = spark.read.parquet(os.path.join(final, "df"))
    return tf, doclen, df_


def _globals_df(doclen: DataFrame, df_: DataFrame) -> DataFrame:
    """One-row frame (__n_docs, __avgdl, __avg_idf) — broadcast scalar.

    ``__avg_idf`` is the mean RAW Okapi idf over the whole vocabulary
    (the flooring base rank_bm25 uses); computing it here keeps the
    whole plan lazy — no eager ``count()`` job on the driver.
    """
    nd = doclen.agg(
        F.count("*").alias("__n_docs"), F.avg("dl").alias("__avgdl")
    )
    raw = df_.crossJoin(F.broadcast(nd)).withColumn(
        "raw_idf",
        F.log(F.col("__n_docs") - F.col("df") + 0.5)
        - F.log(F.col("df") + 0.5),
    )
    return raw.groupBy("__n_docs", "__avgdl").agg(
        F.avg("raw_idf").alias("__avg_idf")
    )


def query_terms_df(nodes: DataFrame, query_text: str) -> DataFrame:
    """Tokenized query with multiplicity → (tok, qcnt), as a plan node.

    Counted driver-side (a query is a handful of tokens) so the plan
    gets a local relation, not a shuffle stage.
    """
    from collections import Counter

    spark = nodes.sparkSession
    counts = Counter(query_text.lower().split())
    return spark.createDataFrame(
        list(counts.items()), "tok string, qcnt long"
    )


def _query_idf(
    q: DataFrame, df_: DataFrame, globals_df: DataFrame
) -> DataFrame:
    """(tok, qcnt, idf, __avgdl) for the query's terms only.

    |q| rows — always broadcastable, so the scoring join never
    shuffles the vocabulary.
    """
    return (
        df_.join(F.broadcast(q), "tok")
        .crossJoin(F.broadcast(globals_df))
        .withColumn(
            "raw_idf",
            F.log(F.col("__n_docs") - F.col("df") + 0.5)
            - F.log(F.col("df") + 0.5),
        )
        .withColumn(
            "idf",
            F.when(
                F.col("raw_idf") < 0, F.lit(EPSILON) * F.col("__avg_idf")
            ).otherwise(F.col("raw_idf")),
        )
        .select("tok", "qcnt", "idf", "__avgdl")
    )


def _contrib(
    nodes: DataFrame,
    query_text: str,
    stats: tuple[DataFrame, DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """Per-doc summed BM25 contributions → (id, score); docs with no
    matching term are absent (callers decide between outer-join-zero
    and positive-filter semantics)."""
    tf, doclen, df_ = stats if stats is not None else corpus_stats(nodes)
    qidf = _query_idf(
        query_terms_df(nodes, query_text), df_, _globals_df(doclen, df_)
    )
    # The query's terms are known driver-side, so prune the posting
    # frame with a literal In(tok, …) BEFORE the scoring join — rows
    # outside the query's vocabulary can't contribute (the qidf join
    # would drop them), and the literal predicate reaches the parquet
    # scan of a staged posting table (PushedFilters), which at 100 TB
    # is the difference between reading the query's posting lists and
    # reading the corpus. df_/doclen stay unpruned: idf flooring
    # averages over the WHOLE vocabulary and dl is per matched doc.
    tf = tf.filter(F.col("tok").isin(list(set(query_text.lower().split()))))
    return (
        tf.join(F.broadcast(qidf), "tok")
        .join(doclen, "id")
        .withColumn(
            "contrib",
            F.col("qcnt")
            * F.col("idf")
            * (F.col("tf") * (K1 + 1))
            / (
                F.col("tf")
                + F.lit(K1)
                * (1 - B + F.lit(B) * F.col("dl") / F.col("__avgdl"))
            ),
        )
        .groupBy("id")
        .agg(F.sum("contrib").alias("score"))
    )


def bm25_scores(
    nodes: DataFrame,
    query_text: str,
    stats: tuple[DataFrame, DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """Okapi BM25 score of every document → (id, score).

    Documents matching no query term score 0.0 (kept — the top-k
    variant applies the positive filter). Pass ``stats`` from
    :func:`build_index` for repeated-query workloads.
    """
    return (
        nodes.select("id")
        .join(_contrib(nodes, query_text, stats), "id", "left_outer")
        .select("id", F.coalesce("score", F.lit(0.0)).alias("score"))
    )


def bm25_topk(
    nodes: DataFrame,
    query_text: str,
    top_k: int = 10,
    round_scores: int | None = None,
    stats: tuple[DataFrame, DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """Top-k by BM25, zero/negative scores dropped (``app.py:486``).

    Skips :func:`bm25_scores`'s outer-join-to-zero — the positive
    filter would drop those rows anyway, so scoring stays on the
    (small) set of docs sharing a term with the query. Pass
    ``stats`` from :func:`build_index` for repeated-query workloads.
    """
    scored = _contrib(nodes, query_text, stats)
    if round_scores is not None:
        scored = scored.withColumn("score", F.round("score", round_scores))
    return (
        scored.filter(F.col("score") > 0)
        .join(nodes.select("id", "text"), "id")
        .select("id", "text", "score")
        .orderBy(F.desc("score"), F.asc("id"))
        .limit(top_k)
    )


def phrase_search(
    df: DataFrame,
    phrase: list[str],
    id_col: str = "id",
    text_col: str = "text",
    k: int = 20,
) -> DataFrame:
    """Exact phrase search via positional postings →
    (id, n_occurrences, rnk): documents containing the tokens of
    ``phrase`` at consecutive positions, ranked by occurrence count
    (ties by id ASC) — the positional-index feature BM25 bag-of-words
    scoring cannot express ("table hash" ≠ "hash table").

    Scale shape: the positional posting (id, tok, pos) is the same
    explode as the BM25 postings with ``posexplode`` carrying the
    offset; each phrase token FILTERS the posting before any join, so
    the n−1 position equi-joins run over per-token posting slices
    (term-frequency-sized, broadcast-eligible for rare terms — the
    selective-term-first join order a query planner picks from df
    stats). Top-k compiles to TakeOrderedAndProject.
    """
    from pyspark.sql.window import Window

    from ..functions.textfn import tokenize

    posting = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(tokenize(text_col)).alias("pos", "tok"),
    )
    cur = posting.filter(F.col("tok") == phrase[0]).select(
        "id", F.col("pos").alias("p0")
    )
    for i, tok in enumerate(phrase[1:], start=1):
        nxt = posting.filter(F.col("tok") == tok).select(
            "id", (F.col("pos") - i).alias("p0")
        )
        cur = cur.join(nxt, ["id", "p0"])
    counts = cur.groupBy("id").agg(F.count("*").alias("n_occurrences"))
    w = Window.orderBy(F.desc("n_occurrences"), F.asc("id"))
    return (
        counts.orderBy(F.desc("n_occurrences"), F.asc("id"))
        .limit(k)
        .withColumn("rnk", F.row_number().over(w))
    )


def multi_query_terms_df(
    nodes: DataFrame, queries: dict[str, str]
) -> DataFrame:
    """Tokenized query batch with multiplicity → (qid, tok, qcnt).

    Counted driver-side (each query is a handful of tokens; the
    batch is user-request-sized, not data-sized) so the plan gets
    one small local relation for the whole batch.
    """
    from collections import Counter

    rows = []
    for qid, text in queries.items():
        for tok, cnt in Counter(text.lower().split()).items():
            rows.append((qid, tok, cnt))
    return nodes.sparkSession.createDataFrame(
        rows, "qid string, tok string, qcnt long"
    )


def bm25_topk_multi(
    nodes: DataFrame,
    queries: dict[str, str],
    top_k: int = 10,
    round_scores: int | None = None,
    stats: tuple[DataFrame, DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """Top-k BM25 for a BATCH of queries in ONE corpus pass →
    (qid, id, score): the deployment shape for query logs / eval
    sets, where scoring Q queries must not cost Q corpus scans.

    The per-query idf frame generalizes to (qid, tok, qcnt, idf) —
    still |Σq| rows, broadcast — so every query's scoring rides the
    SAME tf join; per-query top-k is a row_number window that Spark
    bounds map-side (WindowGroupLimit). Corpus stats are computed
    once for the whole batch (pass ``stats`` from
    :func:`staged_index` to amortize across batches). Zero/negative
    scores dropped per query, ties break on id ASC — same contract
    as :func:`bm25_topk`.
    """
    from pyspark.sql.window import Window

    tf, doclen, df_ = stats if stats is not None else corpus_stats(nodes)
    q = multi_query_terms_df(nodes, queries)
    qidf = (
        df_.join(F.broadcast(q), "tok")
        .crossJoin(F.broadcast(_globals_df(doclen, df_)))
        .withColumn(
            "raw_idf",
            F.log(F.col("__n_docs") - F.col("df") + 0.5)
            - F.log(F.col("df") + 0.5),
        )
        .withColumn(
            "idf",
            F.when(
                F.col("raw_idf") < 0, F.lit(EPSILON) * F.col("__avg_idf")
            ).otherwise(F.col("raw_idf")),
        )
        .select("qid", "tok", "qcnt", "idf", "__avgdl")
    )
    # literal batch-vocabulary prune, same rationale as _contrib's:
    # the scoring join drops non-query toks anyway; a driver-side
    # In(tok, …) lets the staged posting scan skip them
    batch_toks = {
        tok for text in queries.values() for tok in text.lower().split()
    }
    scored = (
        tf.filter(F.col("tok").isin(list(batch_toks)))
        .join(F.broadcast(qidf), "tok")
        .join(doclen, "id")
        .withColumn(
            "contrib",
            F.col("qcnt")
            * F.col("idf")
            * (F.col("tf") * (K1 + 1))
            / (
                F.col("tf")
                + F.lit(K1)
                * (1 - B + F.lit(B) * F.col("dl") / F.col("__avgdl"))
            ),
        )
        .groupBy("qid", "id")
        .agg(F.sum("contrib").alias("score"))
    )
    if round_scores is not None:
        scored = scored.withColumn("score", F.round("score", round_scores))
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("id"))
    return (
        scored.filter(F.col("score") > 0)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= top_k)
        .drop("__rn")
    )
