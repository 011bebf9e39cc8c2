"""Local mimic of the driver's correctness gate.

Runs every ``queries()`` entry on Spark at the given sf dir and the matching
``oracle_sql()`` on DuckDB over the same parquet files, then compares:
row count, sorted column names, and an order-insensitive value hash
(values stringified with float rounding, rows sorted).

Usage: python scripts/check_correctness.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def value_hash(df) -> str:
    import numpy as np
    import pandas as pd
    pdf = df if isinstance(df, pd.DataFrame) else df.toPandas()
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)

    def norm(v):
        if v is None or (isinstance(v, float) and np.isnan(v)):
            return "∅"
        if isinstance(v, (np.floating, float)):
            return f"{float(v):.6g}"
        if isinstance(v, (np.integer, int)):
            return str(int(v))
        if isinstance(v, (np.bool_, bool)):
            return str(bool(v))
        return str(v)

    rows = sorted(",".join(norm(v) for v in row)
                  for row in pdf.itertuples(index=False, name=None))
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    import __spark_entry__ as entrymod
    from crawler_seo_spark.session import get_spark

    spark = get_spark("correctness-check", cores=16, shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in sorted(queries.items()):
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"✗ {name}: SPARK ERROR {e}")
            continue
        if name not in oracles:
            print(f"• {name}: rows-only ({len(sdf)} rows, "
                  f"{time.monotonic()-t0:.1f}s)")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            failures.append(name)
            print(f"✗ {name}: DUCKDB ERROR {e}")
            continue
        ok_rows = len(sdf) == len(odf)
        ok_cols = sorted(sdf.columns) == sorted(odf.columns)
        ok_hash = ok_rows and ok_cols and value_hash(sdf) == value_hash(odf)
        status = "✓" if (ok_rows and ok_cols and ok_hash) else "✗"
        if status == "✗":
            failures.append(name)
        print(f"{status} {name}: rows {len(sdf)}/{len(odf)} cols_ok={ok_cols} "
              f"hash_ok={ok_hash} ({time.monotonic()-t0:.1f}s)")
        if status == "✗" and ok_cols and ok_rows:
            cols = sorted(sdf.columns)
            s = sdf.reindex(cols, axis=1).sort_values(cols).head(3)
            o = odf.reindex(cols, axis=1).sort_values(cols).head(3)
            print("  spark:", s.to_dict("records"))
            print("  duck :", o.to_dict("records"))
    print(f"\n{len(failures)} failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
