"""Profile a single declared query: cold + warm noop-sink timings, job
and stage counts, and the formatted physical plan.

Usage: python tools/prof_query.py <query> [query2 ...] [--sf DIR]
       [--plans OUTDIR] [--runs N]

Writes <query>_before.txt / _after.txt style plan dumps only when
--plans is given (the caller picks the suffix via --suffix).
"""

from __future__ import annotations

import io
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:]]
    sf_dir = "/root/testdata/sf0.1"
    plans_dir = None
    suffix = "before"
    runs = 3
    names = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--sf":
            sf_dir = args[i + 1]
            i += 2
        elif a == "--plans":
            plans_dir = args[i + 1]
            i += 2
        elif a == "--suffix":
            suffix = args[i + 1]
            i += 2
        elif a == "--runs":
            runs = int(args[i + 1])
            i += 2
        else:
            names.append(a)
            i += 1

    import __spark_entry__ as entrymod
    from graphlite_spark.session import get_spark

    spark = get_spark(app_name="graphlite-spark-prof")
    spark.sparkContext.setLogLevel("ERROR")

    from graphlite_spark.datasets.tpch import load_tables

    for df in load_tables(spark, sf_dir).values():
        df.count()
    entrymod._db(spark, sf_dir).query(
        "MATCH (r:Region) RETURN count(*) AS n"
    ).collect()

    qs = entrymod.queries()
    st = spark.sparkContext.statusTracker()
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"prof:{name}:cold")
        t0 = time.time()
        df = fn(spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        cold = time.time() - t0
        warms = []
        jobs_before = max(st.getJobIdsForGroup() or [0])
        for r in range(runs):
            spark.sparkContext.setJobDescription(f"prof:{name}:warm{r}")
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            warms.append(time.time() - t0)
        jobs_after = max(st.getJobIdsForGroup() or [0])
        n_jobs = (jobs_after - jobs_before) / max(runs, 1)
        if plans_dir:
            os.makedirs(plans_dir, exist_ok=True)
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(plans_dir, f"{name}_{suffix}.txt"), "w") as f:
                f.write(buf.getvalue())
        print(
            f"RESULT {name}: cold={cold:.2f}s warm_min={min(warms):.2f}s "
            f"warm_all={[round(w, 2) for w in warms]} jobs/run~{n_jobs:.0f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
