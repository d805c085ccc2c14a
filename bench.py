"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from gazelle_plugin_spark import get_spark
    from gazelle_plugin_spark.plans import all_queries

    spark = get_spark(
        app_name="gazelle-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    queries = all_queries()
    names = sys.argv[1:] or sorted(queries)

    # warm the JVM + parquet footer caches once with the cheapest query
    queries["q6"](spark, sf_dir).collect()

    timings: dict[str, float] = {}
    for name in names:
        start = time.perf_counter()
        df = queries[name](spark, sf_dir)
        rows = df.collect()
        timings[name] = round(time.perf_counter() - start, 4)
        del rows

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "total_query_wall_time",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
