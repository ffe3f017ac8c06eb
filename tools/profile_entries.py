"""Build-vs-exec split profiler for registry entries.

For each named entry, times (a) the query-function call — which
includes any eager work: staged builds, localCheckpoints, streaming
replays — and (b) the noop-sink execution of the returned frame
(guide §1.4). Reps > 1 show warm-vs-cold behaviour for entries that
stage artifacts.

Usage: SPARK_GRAFT_SF_DIR=... python tools/profile_entries.py [--reps N] name [name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    args = sys.argv[1:]
    reps = 1
    if args and args[0] == "--reps":
        reps = int(args[1])
        args = args[2:]
    names = args

    from vector_graph_native_database__spark import registry
    from vector_graph_native_database__spark.session import get_spark

    spark = get_spark("profile")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.all_queries()
    spark.range(1000).count()

    out: dict[str, list[dict[str, float]]] = {}
    for rep in range(reps):
        for n in names:
            spark.sparkContext.setJobDescription(f"profile:{n}:r{rep}")
            t0 = time.time()
            df = qs[n](spark, SF_DIR)
            t1 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            out.setdefault(n, []).append(
                {"build": round(t1 - t0, 3), "exec": round(t2 - t1, 3)}
            )
            spark.sparkContext.setJobDescription(None)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
