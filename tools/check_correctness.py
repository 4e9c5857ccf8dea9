"""Local replica of the driver's CORRECTNESS gate.

Runs every `__spark_entry__.queries()` entry on Spark at sf0.01 and its
`oracle_sql()` twin on DuckDB over the same parquet, then compares:
row count, column-name set, and a value hash over (columns sorted by
name, rows sorted). Dtype-sensitive on purpose — the round-1 simhash
failure was DuckDB HUGEINT->float64 vs Spark int64 with identical
values, and this check must catch that class before the driver does.

Usage: python tools/check_correctness.py [query ...]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def value_hash(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for c in df.columns:
        col = df[c]
        if np.issubdtype(col.dtype, np.floating):
            h.update(np.round(col.to_numpy(), 6).tobytes())
        elif np.issubdtype(col.dtype, np.number) or col.dtype == bool:
            h.update(col.to_numpy().tobytes())
        else:
            h.update("\x1f".join(col.astype(str)).encode())
    return h.hexdigest()


def main() -> None:
    only = set(sys.argv[1:])
    import __spark_entry__ as entry
    from linkgraph.session import get_spark

    spark = get_spark(app_name="check-correctness", master="local[8]",
                      shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = entry.queries(), entry.oracle_sql()
    report = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        rec = {"rows_match": None, "schema_match": None, "hash_match": None,
               "dtype_match": None, "err": None}
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
            rec["spark_wall_s"] = round(time.time() - t0, 2)
            if name not in oracles:
                rec["err"] = "no_oracle"
                rec["spark_rows"] = len(sdf)
                report[name] = rec
                print(f"{name:24s} rows-only spark_rows={len(sdf)}")
                continue
            odf = con.execute(oracles[name]).fetchdf()
            rec["spark_rows"], rec["oracle_rows"] = len(sdf), len(odf)
            rec["rows_match"] = len(sdf) == len(odf)
            rec["schema_match"] = sorted(sdf.columns) == sorted(odf.columns)
            s, o = canon(sdf), canon(odf)
            rec["dtype_match"] = all(
                str(s[c].dtype) == str(o[c].dtype) for c in s.columns
            ) if rec["schema_match"] else False
            rec["hash_match"] = (rec["schema_match"]
                                 and value_hash(s) == value_hash(o))
            if not rec["hash_match"] and rec["schema_match"]:
                for c in s.columns:
                    if str(s[c].dtype) != str(o[c].dtype):
                        rec.setdefault("dtype_diffs", []).append(
                            f"{c}: spark={s[c].dtype} oracle={o[c].dtype}")
                diff = (s != o)
                bad = [c for c in s.columns if diff[c].any()] if len(s) == len(o) else list(s.columns)
                rec["diff_cols"] = bad[:5]
        except Exception as exc:  # noqa: BLE001
            rec["err"] = f"{type(exc).__name__}: {exc}"[:300]
        ok = rec["rows_match"] and rec["schema_match"] and rec["hash_match"]
        print(f"{name:24s} {'OK' if ok else 'FAIL'} {json.dumps({k: v for k, v in rec.items() if k != 'err' or v})}")
        report[name] = rec
    spark.stop()
    bad = [n for n, r in report.items()
           if r.get("err") not in (None, "no_oracle")
           or (r.get("hash_match") is False)]
    out = os.environ.get("CHECK_CORRECTNESS_OUT")
    if out and not only:
        with open(out, "w") as fh:
            json.dump({"sf_dir": SF_DIR, "failed": bad, "report": report},
                      fh, indent=1, sort_keys=True)
    print(json.dumps({"failed": bad}))
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
