"""Print the executed-plan snapshot for one queries() entry at sf0.001.

PLANS.md is assembled from these snapshots (plan SHAPE is scale-invariant;
AQE numbers are not). Usage:

    python scripts/gen_plan_snapshot.py lsh_verified_pairs [more ...]

Prints each query's `.explain(extended=False)` formatted the way PLANS.md
embeds it (first 40 plan lines, trimmed to 160 cols).
"""
import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod  # noqa: E402
from gchq_data_quality_spark.sources.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


def main() -> None:
    names = sys.argv[1:]
    if not names:
        print(__doc__)
        return
    spark = get_spark(cores=8, app_name="gen-plans")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "simple"
    )
    for name in names:
        df = queries[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(mode)
        print(f"## {name}\n")
        print("```")
        for line in plan.splitlines()[:40]:
            print(line[:160])
        print("```")
    spark.stop()


if __name__ == "__main__":
    main()
