#!/usr/bin/env python3
"""Validate a graft-written SQLite file with the REAL sqlite3 engine
(Python stdlib). Run: python3 tools/check_sqlite.py <path.db>

Checks: integrity_check, schema presence, row counts, and that the
FDO metadata rows match the reference's content (map2db.py:129-255).
Exit 0 on success.
"""
import sqlite3
import sys


def main(path):
    con = sqlite3.connect(path)
    cur = con.cursor()

    (ic,) = cur.execute("PRAGMA integrity_check").fetchone()
    assert ic == "ok", f"integrity_check: {ic}"

    names = {r[0] for r in cur.execute(
        "SELECT name FROM sqlite_master WHERE type='table'")}
    expected = {"geometry_columns", "spatial_ref_sys", "README",
                "points", "lines", "areas", "subfiles", "limits"}
    assert expected <= names, f"missing tables: {expected - names}"

    gc = cur.execute(
        "SELECT f_table_name, geometry_type FROM geometry_columns"
        " ORDER BY geometry_type").fetchall()
    assert gc == [("points", 4), ("lines", 5), ("areas", 6)], gc

    srs = cur.execute(
        "SELECT srid, auth_name, auth_srid FROM spatial_ref_sys"
    ).fetchall()
    assert srs == [(1, "EPSG", 4326)], srs

    limits = dict(cur.execute("SELECT key, value FROM limits"))
    assert set(limits) == {"minlat", "minlon", "maxlat", "maxlon"}, limits

    for t in ("points", "lines", "areas", "subfiles", "README"):
        (n,) = cur.execute(f"SELECT COUNT(*) FROM {t}").fetchone()
        print(f"  {t}: {n} rows")

    # geometry blobs must be readable WKB prefixes (byte order marker)
    for t in ("points", "lines", "areas"):
        for (blob,) in cur.execute(f"SELECT m2db_geometry FROM {t}"):
            assert blob is None or blob[0] in (0, 1), f"bad WKB in {t}"

    print(f"OK: {path}")
    con.close()


if __name__ == "__main__":
    main(sys.argv[1])
