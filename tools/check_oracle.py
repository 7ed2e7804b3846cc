#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>

Reads each <out_dir>/<name>/ parquet (Spark result) and runs the matching
oracle SQL from <out_dir>/oracle_sql.json in DuckDB over <sf_dir>'s tables.
Sorts columns by name, sorts rows by all columns, compares values exactly.
"""
import sys, json, math, pathlib
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def cmp_cell(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if a != a and b != b:  # pandas NaN/NaT
            return True
    except Exception:
        pass
    return a == b


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if pathlib.Path(p).exists():
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name in sorted(oracle):
        spark_path = pathlib.Path(out_dir) / name
        if not spark_path.exists():
            print(f"FAIL {name}: spark result missing")
            failures += 1
            continue
        try:
            srel = con.sql(f"SELECT * FROM '{spark_path}/*.parquet'")
            orel = con.sql(oracle[name])
            # Driver-parity guard: the driver's hasher compares decimals
            # exactly, but .df() coerces DECIMAL -> float64 and would mask
            # any representation difference here. Outputs must cast
            # decimals to double at the edge (SparkEntry.decimalsToDouble).
            dec = [f"spark {c}:{t}" for c, t in zip(srel.columns, srel.types)
                   if str(t).startswith("DECIMAL")]
            dec += [f"oracle {c}:{t}" for c, t in zip(orel.columns, orel.types)
                    if str(t).startswith("DECIMAL")]
            if dec:
                print(f"FAIL {name}: raw decimal output column(s): {', '.join(dec)}")
                failures += 1
                continue
            sdf = norm(srel.df())
            odf = norm(orel.df())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            failures += 1
            continue
        if list(sdf.columns) != list(odf.columns):
            print(f"FAIL {name}: columns spark={list(sdf.columns)} oracle={list(odf.columns)}")
            failures += 1
            continue
        if len(sdf) != len(odf):
            print(f"FAIL {name}: rows spark={len(sdf)} oracle={len(odf)}")
            failures += 1
            continue
        if [str(t) for t in sdf.dtypes] != [str(t) for t in odf.dtypes]:
            print(f"FAIL {name}: dtypes spark={list(map(str, sdf.dtypes))} oracle={list(map(str, odf.dtypes))}")
            failures += 1
            continue
        bad = None
        for ci, c in enumerate(sdf.columns):
            sv, ov = sdf[c].tolist(), odf[c].tolist()
            for ri in range(len(sv)):
                if not cmp_cell(sv[ri], ov[ri]):
                    bad = (c, ri, sv[ri], ov[ri])
                    break
            if bad:
                break
        if bad:
            c, ri, a, b = bad
            print(f"FAIL {name}: first diff col={c} row={ri} spark={a!r} oracle={b!r}")
            failures += 1
        else:
            print(f"OK   {name}: {len(sdf)} rows x {len(sdf.columns)} cols")
    print(f"\n{'ALL PASS' if failures == 0 else f'{failures} FAILURES'} / {len(oracle)} queries")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
