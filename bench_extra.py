"""Round-7 optimization measurement harness (guide §1).

NOT the driver bench (`bench.py` is frozen); this isolates each
declared gate query with the noop sink so we time computation, not the
sink or `.count()`'s column pruning, and optionally dumps
`.explain("formatted")` for each query to plans/r07/.

Usage:
  python bench_extra.py [--sf DIR] [--repeats N] [--plans TAG]
                        [--only name1,name2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from anserini_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0"))
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--plans", default=None,
                    help="dump explain('formatted') to plans/r07/<name>_<TAG>.txt")
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app="anserini-bench-extra", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    qs = entry.queries()
    if args.only:
        keep = set(args.only.split(","))
        qs = {k: v for k, v in qs.items() if k in keep}

    plans_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "plans", "r07")
    if args.plans:
        os.makedirs(plans_dir, exist_ok=True)

    timings: dict[str, list[float]] = {}
    for name, fn in qs.items():
        spark.sparkContext.setJobDescription(f"gate:{name}")
        walls = []
        for rep in range(args.repeats):
            t0 = time.time()
            df = fn(spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            walls.append(round(time.time() - t0, 3))
        timings[name] = walls
        if args.plans:
            df = fn(spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(
                    plans_dir, f"{name}_{args.plans}.txt"), "w") as f:
                f.write(plan)
        print(json.dumps({"query": name, "walls": walls,
                          "min": min(walls)}), flush=True)
    spark.sparkContext.setJobDescription(None)
    total_min = round(sum(min(w) for w in timings.values()), 3)
    print(json.dumps({"sf_dir": args.sf, "total_min": total_min,
                      "queries_min": {k: min(v) for k, v in timings.items()}}))
    spark.stop()


if __name__ == "__main__":
    main()
