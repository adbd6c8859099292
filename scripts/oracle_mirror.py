"""Driver-gate mirror: run EVERY queries() entry on Spark and its
oracle_sql() twin on DuckDB at an arbitrary SF dir (the in-repo pytest
mirror is pinned to sf0.001; the driver runs sf0.01), comparing rows /
columns / order-insensitive values AND arrow types — the closest local
reproduction of CORRECTNESS_r{N}.json.

    python scripts/oracle_mirror.py               # sf0.01 (driver scale)
    SF_DIR=/root/testdata/sf0.1 python scripts/oracle_mirror.py
"""
import json
import math
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402
import pyarrow as pa  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from gchq_data_quality_spark.sources.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _normalise(value):
    if value is None:
        return None
    if isinstance(value, float):
        return None if math.isnan(value) else round(value, 4)
    if isinstance(value, int):
        return float(value)
    return str(value)


def _multiset(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(tuple(_normalise(row[i]) for i in order) for row in rows)


def main():
    con = duckdb.connect()
    for t in TABLES:
        path = f"{SF_DIR}/{t}.parquet"
        if Path(path).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    spark = get_spark(cores=int(os.environ.get("CPUS", "32")), app_name="oracle-mirror")
    spark.sparkContext.setLogLevel("ERROR")
    if os.environ.get("ANSI") == "1":
        # Simulate the DRIVER's session: Spark 4 defaults to ANSI mode there,
        # so a wrapping multiply raises ARITHMETIC_OVERFLOW. The query surface
        # must be overflow-free by construction (CLAUDE.md invariants).
        spark.conf.set("spark.sql.ansi.enabled", "true")
    oracle = entry_mod.oracle_sql()
    queries = entry_mod.queries()
    results = {}
    n_fail = 0
    for name, fn in queries.items():
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            sa = sdf.toArrow()
            srows = [tuple(r) for r in sa.to_pandas().itertuples(index=False)]
            scols = sa.schema.names
            rec = {"spark_rows": len(srows), "sec": round(time.time() - t0, 2)}
            if name in oracle:
                res = con.execute(oracle[name])
                oa = res.fetch_arrow_table()
                ocols = oa.schema.names
                orows = [tuple(r) for r in oa.to_pandas().itertuples(index=False)]
                rec["oracle_rows"] = len(orows)
                rec["rows_match"] = len(srows) == len(orows)
                rec["schema_match"] = sorted(c.lower() for c in scols) == sorted(
                    c.lower() for c in ocols
                )
                types_ok = True
                stypes = {f.name.lower(): f.type for f in sa.schema}
                otypes = {f.name.lower(): f.type for f in oa.schema}
                for col, stype in stypes.items():
                    otype = otypes.get(col)
                    if otype is None:
                        types_ok = False
                    elif pa.types.is_timestamp(stype) and pa.types.is_timestamp(otype):
                        types_ok = types_ok and stype.unit == otype.unit
                    else:
                        types_ok = types_ok and stype == otype
                rec["arrow_types_match"] = types_ok
                rec["hash_match"] = _multiset(scols, srows) == _multiset(ocols, orows)
                ok = all(
                    rec[k]
                    for k in ("rows_match", "schema_match", "arrow_types_match", "hash_match")
                )
            else:
                ok = True
            rec["ok"] = ok
            if not ok:
                n_fail += 1
        except Exception as e:  # report, keep going
            rec = {"ok": False, "err": f"{type(e).__name__}: {e}"[:300]}
            n_fail += 1
        results[name] = rec
        status = "ok" if rec.get("ok") else "FAIL"
        print(f"  {name}: {status} ({rec.get('sec', '?')}s)", file=sys.stderr)
    print(json.dumps({"sf_dir": SF_DIR, "n_queries": len(results),
                      "n_fail": n_fail, "results": results}))
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
