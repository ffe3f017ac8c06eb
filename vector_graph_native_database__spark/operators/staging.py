"""Build-once / read-many staged-artifact idiom shared by the index
families (IVF/PQ in ``ann.py``, MinHash shingle/signature in
``dedup.py``).

A staged artifact is a deterministic derived dataset (quantizer
training + assignments, shingle/signature tables) written ONCE per
(dataset, params) under a shared scratch root and read back by every
later consumer — the local stand-in for the persisted index table a
cluster deployment maintains next to its parquet corpus. Staging is
atomic (build into a temp sibling, mark ``_DONE``, rename into
place), so concurrent processes (battery chunks, bench canary JVMs)
can never observe a half-written index, and the cache key is salted
with the source parquet's (mtime, size) so a regenerated dataset
never serves a stale index.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile
import time
import uuid

# Per-process build-cost ledger: staged-family tag -> seconds spent
# inside write_fn (cold builds only; a warm _DONE hit adds nothing).
# bench.py reports this as "staging_build_sec" so every bench number
# that includes a cold staging build is visible as build+serve, not
# a hidden median (round-9 verdict item 1b).
BUILD_SECONDS: dict[str, float] = {}


def staged_index_dir(
    tag: str,
    cache_key: str,
    params: str,
    salt_file: str = "embeddings.parquet",
) -> str:
    """Scratch directory for a staged artifact, keyed by
    (cache_key, params) and salted with ``salt_file``'s
    (mtime, size) under ``cache_key`` so a regenerated dataset never
    serves a stale index. ``salt_file`` is the artifact's SOURCE
    table — ``embeddings.parquet`` for the vector indexes,
    ``documents.parquet`` for the text/MinHash ones."""
    salt = ""
    src = os.path.join(cache_key, salt_file)
    if os.path.exists(src):
        st = os.stat(src)
        salt = f"|{st.st_mtime_ns}|{st.st_size}"
    # a doc-slice run (SPARK_GRAFT_DOC_SLICE_MOD) sees a different
    # effective dataset — its staged artifacts must never be shared
    # with (or poison) the full-corpus ones
    slice_mod = os.environ.get("SPARK_GRAFT_DOC_SLICE_MOD", "")
    if slice_mod and slice_mod != "0":
        salt += f"|slice{slice_mod}"
    key = hashlib.md5(
        f"{cache_key}|{params}{salt}".encode()
    ).hexdigest()[:16]
    root = os.path.join(tempfile.gettempdir(), "vgndb_spark_scratch", tag)
    os.makedirs(root, exist_ok=True)
    return os.path.join(root, key)


def write_staged(final: str, write_fn) -> None:
    """Materialize a staged artifact atomically: build into a temp
    sibling, mark ``_DONE``, rename into place. Concurrent processes
    (battery chunks) cannot observe a half-written index; a lost
    rename race discards the loser and reads the winner's files."""
    if os.path.exists(os.path.join(final, "_DONE")):
        return
    tmp = os.path.join(
        os.path.dirname(final), f"tmp_{uuid.uuid4().hex[:8]}"
    )
    t0 = time.time()
    try:
        write_fn(tmp)
        tag = os.path.basename(os.path.dirname(final))
        BUILD_SECONDS[tag] = round(
            BUILD_SECONDS.get(tag, 0.0) + (time.time() - t0), 3
        )
        with open(os.path.join(tmp, "_DONE"), "w") as fh:
            fh.write("ok\n")
    except BaseException:
        # a failed build (Spark job error, ^C) must not orphan a
        # partial tmp_* dir under the shared scratch root per retry
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    try:
        os.rename(tmp, final)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)  # lost the race
