"""Dump .explain("formatted") for named queries into plans/r10/.

Usage: python tools/dump_plans_r10.py before|after name [name ...]

Same protocol as the r09 dumps: sf0.001, formatted explain of the
query frame as the registry returns it (pre-execution plan).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    "r10",
)


def main() -> None:
    from vector_graph_native_database__spark import registry
    from vector_graph_native_database__spark.session import get_spark

    suffix = sys.argv[1]
    names = sys.argv[2:]
    assert suffix in ("before", "after"), suffix
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark("dump-plans", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.all_queries()
    for name in names:
        df = qs[name](spark, SF_DIR)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(OUT, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path} ({len(txt)} chars)")


if __name__ == "__main__":
    main()
