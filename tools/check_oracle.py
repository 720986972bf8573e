#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify output
against DuckDB oracle SQL and diff exactly (column-name-sorted, value-level).

Usage: python3 tools/check_oracle.py <sfdir> <verify_outdir>
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def _kind_class(dtype):
    """Collapse a pandas/numpy dtype to the class the driver's hash is
    sensitive to: int-vs-float-vs-bool-vs-string-vs-datetime. Width within a
    class (int32 vs int64) hashes identically driver-side, so widths are
    folded; signedness likewise."""
    k = getattr(dtype, "kind", None)
    if k in ("i", "u"):
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    if k == "M":
        return "datetime"
    return "obj"

def _connect(sfdir):
    """Fresh connection with the fixture views, a spill directory, and a
    bounded memory limit. One shared connection accumulated buffer-pool
    memory across 200+ oracle replays at sf0.1 until late queries died
    with DuckDB OOM ("failed to allocate 16 KB") — errors of the HARNESS,
    not the answers. Per-query connections keep each replay's footprint
    its own; the spill dir lets the heavy pair CTEs go out-of-core."""
    con = duckdb.connect()
    con.execute("SET temp_directory='/tmp/duckdb_oracle_spill'")
    con.execute(f"SET memory_limit='{os.environ.get('ORACLE_MEM', '24GB')}'")
    for t in TABLES:
        p = os.path.join(sfdir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con

def main(sfdir, outdir):
    con = _connect(sfdir)
    with open(os.path.join(outdir, "oracle_sql.json")) as f:
        oracle = json.load(f)
    n_pass = n_fail = 0
    # ORACLE_SKIP: comma-separated names to skip — used for the handful of
    # pairwise oracles whose single-node DuckDB replay at sf0.1 spills
    # beyond the disk (the hot-token postings self-join has no cost-based
    # fallback there); the driver's gate runs everything at sf0.01.
    skip = set(filter(None,
        os.environ.get("ORACLE_SKIP", "").split(",")))
    for name, sql in sorted(oracle.items()):
        if name in skip:
            print(f"SKIP {name} (ORACLE_SKIP)")
            continue
        con.close()
        con = _connect(sfdir)
        spark_dir = os.path.join(outdir, name)
        files = glob.glob(os.path.join(spark_dir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = con.execute(f"SELECT * FROM '{files[0]}'").df()
            want = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        got = got.reindex(sorted(got.columns), axis=1)
        want = want.reindex(sorted(want.columns), axis=1)
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
            n_fail += 1
            continue
        bad = []
        for c in got.columns:
            a, b = got[c], want[c]
            # Type-strict gate (mirrors the driver's hash compare): an int64
            # spark column vs a float64 oracle column has equal VALUES under
            # pandas (104 == 104.0) but different hashes driver-side. Fail on
            # dtype-class mismatch before any value compare.
            ka, kb = _kind_class(a.dtype), _kind_class(b.dtype)
            if ka != kb:
                bad.append((c, f"dtype-class mismatch: spark={a.dtype}({ka}) "
                               f"oracle={b.dtype}({kb})"))
                continue
            try:
                if str(a.dtype).startswith("datetime") or str(b.dtype).startswith("datetime"):
                    # tz-awareness must MATCH — the driver's comparator may
                    # not normalize aware-vs-naive like we do
                    a_tz = getattr(a.dtype, "tz", None)
                    b_tz = getattr(b.dtype, "tz", None)
                    if (a_tz is None) != (b_tz is None):
                        bad.append((c, f"tz-awareness mismatch: spark={a.dtype} oracle={b.dtype}"))
                        continue
                    eq = pd.to_datetime(a).astype("int64") // 1000 == pd.to_datetime(b).astype("int64") // 1000
                else:
                    eq = (a == b) | (a.isna() & b.isna())
            except Exception as e:
                bad.append((c, f"cmp error {e}"))
                continue
            if not eq.all():
                i = int((~eq).idxmax())
                bad.append((c, f"row {i}: spark={a.iloc[i]!r} oracle={b.iloc[i]!r} "
                               f"({int((~eq).sum())} diffs)"))
        if bad:
            print(f"FAIL {name}: " + "; ".join(f"{c}: {m}" for c, m in bad))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    # rows-only queries: just report row counts of spark output
    for d in sorted(os.listdir(outdir)):
        full = os.path.join(outdir, d)
        if os.path.isdir(full) and d not in oracle:
            files = glob.glob(os.path.join(full, "*.parquet"))
            if files:
                n = con.execute(f"SELECT count(*) FROM '{files[0]}'").fetchone()[0]
                print(f"ROWS {d}: {n}")
            else:
                print(f"ROWS {d}: NO OUTPUT")
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
