#!/usr/bin/env python3
"""Out-of-band validation of the clean-room mbtiles writer: open the file
with the SYSTEM sqlite3 module (a fully independent SQLite implementation)
and exercise schema, integrity_check, full scans, an index-backed point
lookup, and — where the metadata declares a decodable format — the payload
itself (format=json: gzip+JSON decode; format=pbf: gzip decode; format=png:
PNG magic bytes). Usage: python3 tools/check_mbtiles.py [path...]."""
import gzip
import json
import sqlite3
import sys

paths = sys.argv[1:] or ["target/mbtiles_sample.mbtiles"]
ok = True

def check(name, cond, detail=""):
    global ok
    print(("PASS" if cond else "FAIL"), name, detail)
    ok = ok and cond

for path in paths:
    print(f"-- {path}")
    db = sqlite3.connect(path)
    schema = dict((r[1], r[4]) for r in db.execute(
        "SELECT * FROM sqlite_master").fetchall())
    check("schema", "metadata" in schema and "tiles" in schema
          and "tile_index" in schema, str(sorted(schema)))
    check("integrity_check",
          db.execute("PRAGMA integrity_check").fetchone()[0] == "ok")
    meta = dict(db.execute("SELECT name, value FROM metadata").fetchall())
    n = db.execute("SELECT count(*) FROM tiles").fetchone()[0]
    check("tiles_count", n > 0, f"n={n} format={meta.get('format')}")
    z, x, y = db.execute(
        "SELECT zoom_level, tile_column, tile_row FROM tiles LIMIT 1").fetchone()
    blob = db.execute(
        "SELECT tile_data FROM tiles WHERE zoom_level=? AND tile_column=? "
        "AND tile_row=?", (z, x, y)).fetchone()[0]
    fmt = meta.get("format")
    if fmt == "json":
        stats = json.loads(gzip.decompress(blob))
        check("indexed_lookup+gzip_json_payload", stats["n_segments"] >= 1,
              str(stats))
    elif fmt == "pbf":
        raw = gzip.decompress(blob)
        check("indexed_lookup+gzip_pbf_payload", len(raw) > 0,
              f"mvt_bytes={len(raw)}")
    elif fmt == "png":
        check("indexed_lookup+png_payload",
              blob[:8] == b"\x89PNG\r\n\x1a\n", f"png_bytes={len(blob)}")
    else:
        check("indexed_lookup", len(blob) > 0,
              f"opaque payload ({len(blob)} bytes, format={fmt})")
    plan = db.execute(
        "EXPLAIN QUERY PLAN SELECT tile_data FROM tiles "
        "WHERE zoom_level=? AND tile_column=? AND tile_row=?",
        (z, x, y)).fetchall()
    check("uses_tile_index", any("tile_index" in str(r) for r in plan),
          str(plan))
    db.close()
print("== OK ==" if ok else "== FAILED ==")
sys.exit(0 if ok else 1)
