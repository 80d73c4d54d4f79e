"""Dump explain('formatted') for named keys to plans/r16/<key>_<tag>.txt.

Usage: python tools/dump_plans_r16.py <before|after> key [key ...]
"""

from __future__ import annotations

import os
import sys

here = os.path.dirname(os.path.abspath(__file__))
repo = os.path.join(here, "..")
sys.path.insert(0, repo)


def main() -> int:
    tag = sys.argv[1]
    keys = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as e
    from reactor_window_like_flink_spark.session import get_spark

    spark = get_spark(app_name="dump_plans")
    qs = e.queries()
    out_dir = os.path.join(repo, "plans", "r16")
    os.makedirs(out_dir, exist_ok=True)
    for key in keys:
        df = qs[key](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{key}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
