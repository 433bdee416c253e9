#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run each oracle SQL in
DuckDB against the sf parquet tables and diff against the Verify parquet
output (columns sorted by name, rows sorted by all columns)."""
import sys, os, json, glob
import duckdb
import pandas as pd

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        k = df[c].dtype.kind
        if k in 'iu':
            df[c] = df[c].astype('int64')
        elif k == 'f':
            df[c] = df[c].astype('float64')
        elif k == 'b':
            df[c] = df[c].astype(bool)
        else:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def main(sfdir: str, outdir: str, json_out: str = None) -> int:
    results = {}
    con = duckdb.connect()
    for f in glob.glob(os.path.join(sfdir, "*.parquet")):
        name = os.path.basename(f)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")
    oracles = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for q, sql in sorted(oracles.items()):
        out_glob = os.path.join(outdir, q, "*.parquet")
        try:
            got = norm(pd.concat([pd.read_parquet(p) for p in glob.glob(out_glob)]))
            want = norm(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {q}: error {e}")
            results[q] = {"status": "fail", "detail": f"error {e}"[:300]}
            n_fail += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {q}: columns {list(got.columns)} vs {list(want.columns)}")
            results[q] = {"status": "fail", "detail": "column mismatch"}
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {q}: rows {len(got)} vs {len(want)}")
            results[q] = {"status": "fail", "detail": f"rows {len(got)} vs {len(want)}"}
            n_fail += 1
            continue
        eq = True
        for c in got.columns:
            a, b = got[c], want[c]
            if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                import numpy as np
                if not np.allclose(a.astype(float), b.astype(float), rtol=0, atol=0, equal_nan=True):
                    # exact compare (hash-style); report max diff
                    diff = (a.astype(float) - b.astype(float)).abs().max()
                    print(f"FAIL {q}: col {c} maxdiff={diff}")
                    eq = False
                    break
            else:
                if not a.equals(b):
                    bad = (a != b)
                    if bad.any():
                        i = bad[bad].index[0]
                        print(f"FAIL {q}: col {c} row {i}: {a[i]!r} vs {b[i]!r}")
                    else:
                        print(f"FAIL {q}: col {c} dtype {a.dtype} vs {b.dtype}")
                    eq = False
                    break
        if eq:
            print(f"PASS {q} ({len(got)} rows)")
            results[q] = {"status": "pass", "rows": len(got)}
            n_pass += 1
        else:
            results[q] = {"status": "fail", "detail": "value mismatch"}
            n_fail += 1
    # rows-only queries (no oracle)
    for d in sorted(os.listdir(outdir)):
        qdir = os.path.join(outdir, d)
        if os.path.isdir(qdir) and d not in oracles:
            try:
                n = sum(len(pd.read_parquet(p)) for p in glob.glob(os.path.join(qdir, "*.parquet")))
                print(f"ROWS {d}: {n} rows {'(>0 ok)' if n > 0 else '(EMPTY!)'}")
                results[d] = {"status": "rows_only" if n > 0 else "fail", "rows": n}
                if n == 0:
                    n_fail += 1
            except Exception as e:
                print(f"ROWS {d}: unreadable {e}")
                n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    if json_out:
        import subprocess
        commit = subprocess.run(["git", "rev-parse", "HEAD"], capture_output=True,
                                text=True).stdout.strip()
        json.dump({"sf_dir": sfdir, "commit": commit,
                   "n_pass": n_pass, "n_fail": n_fail,
                   "queries": results}, open(json_out, "w"), indent=1)
        print(f"wrote {json_out}")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
