#!/usr/bin/env python3
"""Out-of-band validation of the clean-room mbtiles writer: open the file
with the SYSTEM sqlite3 module (a fully independent SQLite implementation)
and exercise schema, full scans, an index-backed point lookup, and gzip
payload decode. Usage: python3 tools/check_mbtiles.py [path]."""
import gzip
import json
import sqlite3
import sys

path = sys.argv[1] if len(sys.argv) > 1 else "target/mbtiles_sample.mbtiles"
db = sqlite3.connect(path)
ok = True

def check(name, cond, detail=""):
    global ok
    print(("PASS" if cond else "FAIL"), name, detail)
    ok = ok and cond

schema = dict((r[1], r[4]) for r in db.execute(
    "SELECT * FROM sqlite_master").fetchall())
check("schema", "metadata" in schema and "tiles" in schema
      and "tile_index" in schema, str(sorted(schema)))
check("integrity_check", db.execute("PRAGMA integrity_check").fetchone()[0] == "ok")
meta = dict(db.execute("SELECT name, value FROM metadata").fetchall())
check("metadata", meta.get("format") == "json", str(meta))
n = db.execute("SELECT count(*) FROM tiles").fetchone()[0]
check("tiles_count", n > 0, f"n={n}")
z, x, y = db.execute(
    "SELECT zoom_level, tile_column, tile_row FROM tiles LIMIT 1").fetchone()
blob = db.execute(
    "SELECT tile_data FROM tiles WHERE zoom_level=? AND tile_column=? AND tile_row=?",
    (z, x, y)).fetchone()[0]
stats = json.loads(gzip.decompress(blob))
check("indexed_lookup+gzip_payload", stats["n_segments"] >= 1, str(stats))
plan = db.execute(
    "EXPLAIN QUERY PLAN SELECT tile_data FROM tiles "
    "WHERE zoom_level=? AND tile_column=? AND tile_row=?", (z, x, y)).fetchall()
check("uses_tile_index", any("tile_index" in str(r) for r in plan), str(plan))
print("== OK ==" if ok else "== FAILED ==")
sys.exit(0 if ok else 1)
