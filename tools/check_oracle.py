#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfdir> <verify_outdir>

Reads <verify_outdir>/oracle_sql.json (written by graft.Verify), runs each SQL
in DuckDB against the parquet tables in <sfdir>, and compares against the
Spark-written parquet in <verify_outdir>/<name>/. Columns are sorted by name;
rows compared in order (queries are expected to ORDER BY deterministically).
"""
import json
import sys
from pathlib import Path

import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# The 7 side-table replay gates (learned IVF / PQ / IVF-PQ / SemDeDup /
# deflate / bloom) used to be pinned to sf0.01 here: their SQL named ONE
# static aux path. graft.Verify now rewrites the aux-path suffix to the
# scale it runs at when dumping oracle_sql.json (identity at the driver's
# sf0.01), so the SQL in <outdir>/oracle_sql.json always reads the aux
# tables the verify run itself just dumped — every gate compares at every
# scale, no skips.


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].reset_index(drop=True)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
    return df


def compare(name: str, spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> str:
    a, b = norm(spark_df), norm(duck_df)
    if list(a.columns) != list(b.columns):
        return f"COLS   spark={list(a.columns)} duck={list(b.columns)}"
    if len(a) != len(b):
        return f"ROWS   spark={len(a)} duck={len(b)}"
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            av = av.astype(float); bv = bv.astype(float)
            neq = ~((av == bv) | (av.isna() & bv.isna()))
            if neq.any():
                i = int(np.argmax(neq.values))
                return (f"VAL    col={c} row={i} spark={av.iloc[i]!r} "
                        f"duck={bv.iloc[i]!r} diff={av.iloc[i]-bv.iloc[i]!r}")
        else:
            an = av.isna() if av.dtype == object or av.hasnans else pd.Series(False, index=av.index)
            bn = bv.isna() if bv.dtype == object or bv.hasnans else pd.Series(False, index=bv.index)
            neq = ~(((av == bv) & ~an & ~bn) | (an & bn))
            # list-typed cells: elementwise == yields arrays; fall back
            try:
                bad = bool(neq.any())
            except ValueError:
                bad = any(not np.array_equal(x, y) for x, y in zip(av, bv))
                neq = None
            if bad:
                if neq is not None:
                    i = int(np.argmax(neq.values))
                else:
                    i = next(k for k, (x, y) in enumerate(zip(av, bv))
                             if not np.array_equal(x, y))
                return (f"VAL    col={c} row={i} spark={a[c].iloc[i]!r} "
                        f"duck={b[c].iloc[i]!r}")
    return "OK"


def duck_fetch(con, sql, timeout):
    """Run one oracle with an optional wall budget: the full-surface sf1
    run includes quadratic replays (all-pairs Jaccard over 50k docs) that
    DuckDB can grind on for tens of minutes — a budget turns 'the run
    hung' into an explicit SKIP row. Each budgeted gate runs on its OWN
    cursor (a duplicate connection over the same catalog, so the table
    views are visible): interrupting the shared connection could race a
    just-finished query (a pending interrupt killing the NEXT gate) or
    leave a slow-to-die worker serializing later gates behind it —
    cursor isolation keeps one gate's timeout from contaminating the
    rest of the run."""
    if not timeout:
        return con.execute(sql).fetchdf()
    import threading
    cur = con.cursor()
    box = {}
    def run():
        try:
            box["df"] = cur.execute(sql).fetchdf()
        except Exception as e:  # surfaced to the caller below
            box["err"] = e
    t = threading.Thread(target=run, daemon=True)
    try:
        t.start()
        t.join(timeout)
        if "df" in box:  # finished at the boundary — a result beats a timeout
            return box["df"]
        if t.is_alive():
            cur.interrupt()
            t.join(60)
            # the query may have FINISHED between the is_alive check and
            # the interrupt landing — a populated result still beats the
            # timeout verdict (discarding it would record a false SKIP)
            if "df" in box:
                return box["df"]
            raise TimeoutError(f"oracle exceeded {timeout}s")
        if "err" in box:
            raise box["err"]
        if "df" not in box:  # worker died without setting either key
            raise RuntimeError("oracle worker thread died without a result")
        return box["df"]
    finally:
        # a cursor whose worker refused to die after interrupt+join(60) is
        # the one case left open (close() could block behind it); every
        # normal path releases its duplicate connection here
        if not t.is_alive():
            cur.close()


def main():
    # --json <path>: also dump {gate: verdict-string} for artifact capture
    # (the sf1 correctness run commits its result as CORRECTNESS_sf1.json)
    # --timeout <sec>: per-gate DuckDB budget; over-budget gates record
    # "SKIP oracle timeout" (explicit, never counted as pass)
    args = [a for a in sys.argv[1:]]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        del args[i:i + 2]
    timeout = None
    if "--timeout" in args:
        i = args.index("--timeout")
        timeout = float(args[i + 1])
        del args[i:i + 2]
    sfdir, outdir = args[0], args[1]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if Path(p).is_dir():  # Spark-written table (e.g. the ScaleUp sf1)
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.loads(Path(f"{outdir}/oracle_sql.json").read_text())
    results = {}
    only = args[2:] or None
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        spark_path = Path(outdir) / name
        if not spark_path.exists():
            results[name] = "MISSING spark output"
            continue
        try:
            spark_df = pd.concat(
                [pd.read_parquet(f) for f in sorted(spark_path.glob("*.parquet"))],
                ignore_index=True)
        except ValueError:
            results[name] = "EMPTY spark output"
            continue
        try:
            duck_df = duck_fetch(con, sql, timeout)
        except TimeoutError as e:
            results[name] = f"SKIP {e}"
            continue
        except Exception as e:
            results[name] = f"DUCKSQL {type(e).__name__}: {e}"
            continue
        try:
            results[name] = compare(name, spark_df, duck_df)
        except Exception as e:
            results[name] = f"CMPERR {type(e).__name__}: {e}"
    ok = sum(1 for v in results.values() if v == "OK")
    skip = sum(1 for v in results.values() if v.startswith("SKIP"))
    for name, v in sorted(results.items()):
        tag = "PASS" if v == "OK" else ("SKIP" if v.startswith("SKIP") else "FAIL")
        print(f"{tag:4s}  {name:28s} {'' if v == 'OK' else v}")
    print(f"\n{ok}/{len(results)} queries match"
          + (f" ({skip} skipped: scale-pinned or over oracle budget)"
             if skip else ""))
    if json_out:
        Path(json_out).write_text(json.dumps(
            {k: ("pass" if v == "OK" else v) for k, v in sorted(results.items())},
            indent=1) + "\n")
    sys.exit(0 if ok + skip == len(results) else 1)


if __name__ == "__main__":
    main()
