"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin
on DuckDB at the given sf dir, then compares row count, column-name
set, and order-insensitive values (sorted rows, floats compared
exactly after both sides' agreed rounding).

Usage: python tools/oracle_check.py [--resume FILE] [--max N] [sf_dir] [name ...]

``--resume FILE`` records one ``<name> OK|FAIL`` line per compared
entry; on restart, entries already marked OK are skipped (FAILs are
re-run). ``--max N`` exits with code 3 after N comparisons when work
remains, so a wrapper loop can re-invoke a FRESH process per chunk —
the round-6 sf1 post-mortem showed a single long-lived process (one
Spark JVM + one DuckDB connection across 330 heavy oracles) degrades
to a crawl from accumulated state; chunked fresh processes do not.
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    # Heavy sf1 oracles (within-cluster pairwise cosine, recursive
    # reach) need tens of GB of workspace: pin the budget high so
    # DuckDB prefers RAM, spill OUTSIDE the repo tree, and bound the
    # spill so a runaway oracle fails its own entry instead of
    # filling the device for everyone (the round-7 battery crash).
    # Env-overridable so parallel battery workers can split the box
    # instead of each claiming the whole budget.
    con.execute(
        "PRAGMA memory_limit="
        f"'{os.environ.get('ORACLE_DUCK_MEM', '96GB')}'"
    )
    con.execute(
        "PRAGMA temp_directory="
        f"'{os.environ.get('ORACLE_DUCK_TMP', '/tmp/duckdb_spill')}'"
    )
    con.execute(
        "PRAGMA max_temp_directory_size="
        f"'{os.environ.get('ORACLE_DUCK_SPILL_MAX', '50GiB')}'"
    )
    # Doc-id slice parity: when SPARK_GRAFT_DOC_SLICE_MOD=K is set,
    # the engine's loaders restrict documents/embeddings to
    # stable_hash60(id) % K == 0 at the source (sources/loaders.py);
    # the oracle views apply the identical predicate so both engines
    # compare over the same sliced dataset. This is the harness that
    # makes the duplication-quadratic pair oracles DuckDB-feasible at
    # sf10 (pair outputs are closed under the slice).
    slice_mod = int(os.environ.get("SPARK_GRAFT_DOC_SLICE_MOD", "0") or 0)
    slice_keys = {"documents": "doc_id", "embeddings": "vec_id"}
    for t in TABLES:
        pred = ""
        if slice_mod and t in slice_keys:
            pred = (
                f" WHERE ('0x' || substr(md5(CAST({slice_keys[t]} AS "
                f"VARCHAR)), 1, 15))::BIGINT % {slice_mod} = 0"
            )
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet'){pred}"
        )
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith(("float", "Float")):
            df[c] = df[c].astype("float64").round(9)
        elif str(df[c].dtype).startswith(("int", "Int", "uint")):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


def main() -> int:
    argv = sys.argv[1:]
    resume_path = None
    max_entries = None
    stride = 1
    offset = 0
    reverse = False
    pos = []
    i = 0
    while i < len(argv):
        if argv[i] == "--resume":
            resume_path = argv[i + 1]
            i += 2
        elif argv[i] == "--max":
            max_entries = int(argv[i + 1])
            i += 2
        elif argv[i] == "--stride":
            # Partition the registry across parallel workers: this
            # worker compares entries whose registry index satisfies
            # idx % stride == offset. Workers share one resume file.
            stride = int(argv[i + 1])
            i += 2
        elif argv[i] == "--offset":
            offset = int(argv[i + 1])
            i += 2
        elif argv[i] == "--reverse":
            # Walk the registry tail-first: lets a helper worker eat
            # a straggler's partition from the other end (shared
            # resume file bounds duplicated work to one entry).
            reverse = True
            i += 1
        else:
            pos.append(argv[i])
            i += 1
    if stride < 1 or not (0 <= offset < stride):
        # A bad partition (offset >= stride, or duplicated offsets)
        # would silently skip entries yet still print ALL OK — fail
        # loudly instead of green-lighting an empty scope.
        print(
            f"ERROR: require 0 <= offset < stride, got "
            f"--stride {stride} --offset {offset}",
            file=sys.stderr,
        )
        return 2
    sf_dir = pos[0] if pos else "/root/testdata/sf0.01"
    only = set(pos[1:])

    # Skip every RECORDED entry — OK, FAIL, or TIMEOUT (written by
    # tools/run_slice.sh when a per-entry `timeout` kills the
    # process) — a battery run should surface ALL failures in one
    # pass, not stop at the first, and a shared resume must not
    # re-run a doomed timed-out entry with no timeout. After fixing
    # an entry, delete its FAIL/TIMEOUT line to re-check it.
    done_ok = set()
    prior_fails = set()
    if resume_path and os.path.exists(resume_path):
        with open(resume_path) as fh:
            for line in fh:
                parts = line.split()
                if len(parts) == 2 and parts[1] == "OK":
                    done_ok.add(parts[0])
                elif len(parts) == 2 and parts[1] in ("FAIL", "TIMEOUT"):
                    prior_fails.add(parts[0])
    done_ok |= prior_fails

    import __spark_entry__ as mod
    from vector_graph_native_database__spark.session import get_spark

    spark = get_spark("oracle-check")
    con = duck_con(sf_dir)
    qs, os_ = mod.queries(), mod.oracle_sql()
    failed = []
    n_run = 0
    n_compared = 0
    remaining_after_cut = False
    items = list(enumerate(qs.items()))
    if reverse:
        items.reverse()
    for idx, (name, fn) in items:
        if idx % stride != offset:
            continue
        if only and name not in only:
            continue
        if name in done_ok:
            continue
        if max_entries is not None and n_compared >= max_entries:
            remaining_after_cut = True
            break
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # engine-side error: record, move on
            if "stopped SparkContext" in str(exc):
                # The JVM is gone — nothing after this can run. Exit
                # as a checkpoint WITHOUT recording this entry so the
                # wrapper's fresh process retries it for real.
                print(f"  {name:28s} SKIP session dead — chunk restart",
                      flush=True)
                return 3
            print(f"  {name:28s} FAIL engine: {type(exc).__name__}: "
                  f"{str(exc)[:200]} [{time.time()-t0:.1f}s]", flush=True)
            n_compared += 1
            failed.append(name)
            if resume_path:
                with open(resume_path, "a") as fh:
                    fh.write(f"{name} FAIL\n")
            continue
        if name not in os_:
            print(f"  {name:28s} rows={len(sdf):6d}  (rows-only, no oracle) "
                  f"[{time.time()-t0:.1f}s]", flush=True)
            n_compared += 1
            if resume_path:
                with open(resume_path, "a") as fh:
                    fh.write(f"{name} OK\n")
            continue
        # Recycle the DuckDB connection periodically: one connection
        # accumulating 300+ heavy oracle executions grows to tens of
        # GB RSS and the battery tail crawls (round-6 sf1 post-mortem
        # — entries that pass in minutes fresh took hours late in a
        # shared connection). Cheap: views are rebuilt from parquet.
        n_run += 1
        if n_run % 25 == 0:
            con.close()
            con = duck_con(sf_dir)
        try:
            odf = con.sql(os_[name]).df()
        except Exception as exc:
            # One doomed oracle (OOM, spill cap, interrupt) must fail
            # its OWN entry, not the battery: record, rebuild the
            # connection (it may be poisoned), continue.
            print(f"  {name:28s} FAIL oracle: {type(exc).__name__}: "
                  f"{str(exc)[:200]} [{time.time()-t0:.1f}s]", flush=True)
            n_compared += 1
            failed.append(name)
            if resume_path:
                with open(resume_path, "a") as fh:
                    fh.write(f"{name} FAIL\n")
            try:
                con.close()
            except Exception:
                pass
            con = duck_con(sf_dir)
            continue
        a, b = canon(sdf), canon(odf)
        ok = True
        why = ""
        if list(a.columns) != list(b.columns):
            ok, why = False, f"schema {list(a.columns)} vs {list(b.columns)}"
        elif len(a) != len(b):
            ok, why = False, f"rows {len(a)} vs {len(b)}"
        elif not a.equals(b):
            ok = False
            neq = (a != b) & ~(a.isna() & b.isna())
            bad_cols = [c for c in a.columns if neq[c].any()]
            i = neq.any(axis=1).idxmax()
            why = f"values differ cols={bad_cols} first@{i}: " \
                  f"{a.loc[i].to_dict()} vs {b.loc[i].to_dict()}"
        status = "OK  " if ok else "FAIL"
        print(f"  {name:28s} {status} rows={len(a):6d} [{time.time()-t0:.1f}s] {why}",
              flush=True)
        n_compared += 1
        if resume_path:
            with open(resume_path, "a") as fh:
                fh.write(f"{name} {'OK' if ok else 'FAIL'}\n")
        if not ok:
            failed.append(name)
    if remaining_after_cut:
        print(f"\nCHECKPOINT: {n_compared} compared this chunk, more remain"
              + (f" (failed so far: {', '.join(failed)})" if failed else ""))
        return 3
    failed = sorted(set(failed) | prior_fails)
    in_scope = sum(
        1
        for idx, (name, _) in enumerate(qs.items())
        if idx % stride == offset and (not only or name in only)
    )
    print(
        f"\npartition {offset + 1}/{stride}: {in_scope} entries in scope, "
        f"{n_compared} compared this run"
    )
    print(f"{'ALL OK' if not failed else 'FAILED: ' + ', '.join(failed)}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
