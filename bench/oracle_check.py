#!/usr/bin/env python3
"""Cross-check Verify output against DuckDB, like the driver does.

Usage: python3 bench/oracle_check.py <sfDir> <verifyOutDir>

For each entry in <verifyOutDir>/oracle_sql.json: run the SQL in DuckDB
over views named after the parquet tables in <sfDir>, sort columns by
name and rows by value, and compare with the parquet result written
under <verifyOutDir>/<name>/.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # ignore_index=True already resets the index
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    failed = []
    for name in sorted(oracle):
        try:
            exp = canon(con.execute(oracle[name]).df())
            got = canon(con.execute(
                f"SELECT * FROM parquet_scan('{out_dir}/{name}/*.parquet')").df())
            exp.columns = list(range(len(exp.columns)))
            got.columns = list(range(len(got.columns)))
            if len(exp) != len(got):
                failed.append((name, f"rows {len(got)} != {len(exp)}"))
                continue
            pd.testing.assert_frame_equal(got, exp, check_dtype=False,
                                          check_exact=False, rtol=1e-9, atol=1e-12)
            print(f"OK    {name} ({len(got)} rows)")
        except AssertionError as e:
            failed.append((name, str(e).splitlines()[0]))
        except Exception as e:  # noqa: BLE001 - report and continue
            failed.append((name, f"error: {e}"))
    for name, why in failed:
        print(f"FAIL  {name}: {why}")
    print(f"\n{len(oracle) - len(failed)}/{len(oracle)} oracle-exact")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
