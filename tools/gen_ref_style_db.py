#!/usr/bin/env python3
"""Generate the RefStyleDbSpec fixture with the REAL sqlite3 engine
(Python stdlib). Run: python3 tools/gen_ref_style_db.py [/tmp/ref_style.db]

Writes a database shaped like the ones the reference produces
(map2db.py:129-255 + the ALTER TABLE vtag migration at 865/945/1051):

- `points` with INTEGER UNIQUE id (creates a sqlite_autoindex row in
  sqlite_master, exercising non-table master entries),
- one row inserted BEFORE the ALTER TABLE ADD COLUMN migrations, so
  its stored record is NARROWER than the final schema (SQLite keeps
  pre-ALTER records short; readers must NULL-pad the tail),
- vtag columns added via ALTER TABLE, including one with an embedded
  double quote (stored escaped as "" in the CREATE sql) to exercise
  identifier unescaping,
- a `limits` table with REAL values.

RefStyleDbSpec invokes this script and then reads the file back with
graft's from-scratch SQLite reader.
"""
import os
import sqlite3
import sys


def main(path):
    if os.path.exists(path):
        os.remove(path)
    con = sqlite3.connect(path)
    cur = con.cursor()
    cur.execute(
        "CREATE TABLE points (m2db_pnum INTEGER UNIQUE,"
        " m2db_level INTEGER, m2db_minz INTEGER, m2db_maxz INTEGER,"
        " m2db_geometry BLOB, m2db_layer_num INTEGER, m2db_tags TEXT)")
    # short record: inserted before the vtag columns exist, never
    # updated afterwards -> its on-disk record keeps the 7-column width
    cur.execute(
        "INSERT INTO points VALUES (2000, 1, 9, 13, X'0EFF', 2, 'old')")
    cur.execute('ALTER TABLE points ADD COLUMN "m2db_name" TEXT')
    cur.execute('ALTER TABLE points ADD COLUMN "name:en" TEXT')
    # vtag key with an embedded double quote: stored escaped ("")
    cur.execute('ALTER TABLE points ADD COLUMN "tag""x" TEXT')
    cur.execute(
        "INSERT INTO points VALUES"
        " (7, 0, 6, 8, X'0104', 0, 'place=town', 'Dortmund',"
        " 'Dortmund', 'qv')")
    cur.execute(
        "INSERT INTO points VALUES"
        " (1002, 1, 9, 13, NULL, 5, 'amenity=cafe', NULL, NULL, NULL)")
    cur.execute("CREATE TABLE limits (key TEXT, value REAL)")
    cur.executemany("INSERT INTO limits VALUES (?, ?)",
                    [("minlat", 51.5), ("maxlon", 7.6)])
    con.commit()
    con.close()
    print(f"wrote {path}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/ref_style.db")
