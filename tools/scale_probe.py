"""Spark-side scaling probe: time named registry entries across a
ladder of scaled testdata dirs (no oracle — the DuckDB gate runs
separately; this measures the ENGINE's scaling curve).

For each (entry, sf_dir) the query plan is built fresh and fully
materialized through the same noop sink bench.py uses (count of a
select(*) — every output column computed, nothing collected to the
driver). Prints one JSON line per entry:

    {"name": ..., "times": {"<dir>": sec, ...}, "rows": {...}}

Usage:
    python tools/scale_probe.py DIR1 DIR2 [DIR3 ...] -- name [name ...]

A super-linear engine plan (all-pairs blowup, unpartitioned window,
driver-side loop) shows up as time ratios growing faster than the
data ratio; TESTDATA ladders are 10× apart so the smoking gun is a
ratio well past ~10 between adjacent rungs.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str]) -> int:
    sep = argv.index("--")
    dirs, names = argv[:sep], argv[sep + 1 :]

    from vector_graph_native_database__spark import registry
    from vector_graph_native_database__spark.session import get_spark

    spark = get_spark("scale-probe", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.all_queries()

    for name in names:
        fn = qs[name]
        times: dict[str, float] = {}
        rows: dict[str, int] = {}
        for d in dirs:
            t0 = time.monotonic()
            n = fn(spark, d).select("*").count()
            times[os.path.basename(d.rstrip("/"))] = round(
                time.monotonic() - t0, 3
            )
            rows[os.path.basename(d.rstrip("/"))] = n
        print(
            json.dumps({"name": name, "times": times, "rows": rows}),
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
