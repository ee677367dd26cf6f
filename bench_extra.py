#!/usr/bin/env python
"""Per-query measurement harness for the optimization rounds.

NOT the driver bench (bench.py is frozen for measurement) — this file
exists so individual queries can be isolated (guide §1.4: noop sink),
re-timed quickly during optimization, and their ``explain("formatted")``
plans captured into plans/r07/ for the judge.

Usage::

    python bench_extra.py q1 q2 ...        # time + plan for named queries
    python bench_extra.py --all            # every bench.py-timed query
    python bench_extra.py --plans-tag before q1 q2   # also write
        plans/r07/<q>_<tag>.txt
    python bench_extra.py --passes 4 ...   # best-of-N (default 3)

Prints one JSON line {"q": {name: [best, ...passes]}, ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from bench import CPUS, SF_DIR, _spin_sample, make_session  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:]]
    passes = 3
    tag = None
    names = []
    run_all = False
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--passes":
            passes = int(args[i + 1]); i += 2
        elif a == "--plans-tag":
            tag = args[i + 1]; i += 2
        elif a == "--all":
            run_all = True; i += 1
        else:
            names.append(a); i += 1

    import __spark_entry__ as e
    qs = dict(e.queries())
    if run_all:
        names = [n for n in qs]

    spark = make_session(CPUS)
    out: dict[str, list[float]] = {}
    try:
        for n in names:
            if n not in qs:
                print(f"!! unknown query {n}", file=sys.stderr)
                continue
            if tag:
                os.makedirs(os.path.join(REPO, "plans", "r07"),
                            exist_ok=True)
                df = qs[n](spark, SF_DIR)
                with open(os.path.join(REPO, "plans", "r07",
                                       f"{n}_{tag}.txt"), "w") as f:
                    f.write(df._sc._jvm.PythonSQLUtils.explainString(
                        df._jdf.queryExecution(), "formatted"))
            times = []
            for _ in range(passes):
                spark.sparkContext.setJobDescription(f"bench_extra:{n}")
                t0 = time.time()
                qs[n](spark, SF_DIR).write.format("noop") \
                    .mode("overwrite").save()
                times.append(round(time.time() - t0, 3))
            spin = _spin_sample(CPUS, 2_000_000)
            out[n] = [min(times)] + times + [spin]
            print(f"{n}: {out[n]}", file=sys.stderr)
    finally:
        spark.stop()
    print(json.dumps({"q": out, "sf_dir": SF_DIR, "cpus": CPUS}))


if __name__ == "__main__":
    main()
