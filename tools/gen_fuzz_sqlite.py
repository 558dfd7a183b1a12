#!/usr/bin/env python3
"""Randomized real-engine SQLite fixture for the reader fuzz spec.

Usage: python3 tools/gen_fuzz_sqlite.py <db> <dump.jsonl> <seed>

Writes a database with the stdlib sqlite3 engine containing randomized
tables that exercise every reader path: INTEGER PRIMARY KEY rowid
aliases, quoted identifiers (colons, embedded double quotes), NULLs,
negative/huge integers, floats, multi-KB strings (overflow chains),
blobs, and ALTER TABLE ADD COLUMN mid-insert (short records). Beside
it, a JSON-lines dump of the expected rows, one object per row:
{"t": table, "r": rowid, "c": [cell, ...]} with cells type-tagged
("n" null, "i:<dec>" integer, "f:<16-hex>" float bits, "s:<str>"
text, "b:<hex>" blob) so the Scala side compares exactly.
"""
import json
import random
import sqlite3
import struct
import sys


def main(db_path, dump_path, seed):
    rng = random.Random(int(seed))
    import os
    if os.path.exists(db_path):
        os.remove(db_path)
    con = sqlite3.connect(db_path)
    cur = con.cursor()
    dump = []

    def rand_ident(k):
        base = f"col_{k}"
        extra = rng.choice(["", ":ns", 'q"q', " sp"])
        return base + extra

    def rand_value(typ, big):
        if rng.random() < 0.2:
            return None
        if typ == "INTEGER":
            return rng.choice([
                0, 1, -1, rng.randint(-2**31, 2**31),
                rng.randint(-2**62, 2**62)])
        if typ == "REAL":
            return rng.choice([0.0, -1.5, rng.random() * 1e12,
                               -rng.random()])
        if typ == "TEXT":
            n = rng.choice([0, 3, 40, 5000 if big else 80])
            return "".join(rng.choice("abcXYZ 0129é中")
                           for _ in range(n))
        n = rng.choice([0, 8, 3000 if big else 64])
        return bytes(rng.randrange(256) for _ in range(n))

    for t in range(3):
        tname = f"t{t}"
        ncols = rng.randint(2, 5)
        types = [rng.choice(["INTEGER", "REAL", "TEXT", "BLOB"])
                 for _ in range(ncols)]
        names = [rand_ident(k) for k in range(ncols)]
        use_ipk = rng.random() < 0.5
        defs = []
        if use_ipk:
            defs.append('"id" INTEGER PRIMARY KEY')
        defs += [f'"{n.replace(chr(34), chr(34)*2)}" {ty}'
                 for n, ty in zip(names, types)]
        cur.execute(f"CREATE TABLE {tname} ({', '.join(defs)})")
        nrows = rng.randint(0, 120)
        alter_at = rng.randint(0, nrows) if nrows else 0
        altered = False
        for i in range(nrows):
            if i == alter_at and rng.random() < 0.7:
                cur.execute(
                    f'ALTER TABLE {tname} ADD COLUMN "extra:v" TEXT')
                altered = True
            vals = [rand_value(ty, big=(i % 17 == 0))
                    for ty in types]
            if altered:
                vals = vals + [rand_value("TEXT", False)]
            cols = ncols + (1 if altered else 0)
            if use_ipk:
                ph = ", ".join(["?"] * (cols + 1))
                cur.execute(f"INSERT INTO {tname} VALUES ({ph})",
                            [i + 1] + vals)
            else:
                ph = ", ".join(["?"] * cols)
                cur.execute(f"INSERT INTO {tname} VALUES ({ph})", vals)
        con.commit()
        for row in cur.execute(
                f"SELECT rowid, * FROM {tname} ORDER BY rowid"):
            cells = []
            for v in row[1:]:
                if v is None:
                    cells.append("n")
                elif isinstance(v, int):
                    cells.append(f"i:{v}")
                elif isinstance(v, float):
                    cells.append(
                        "f:" + struct.pack(">d", v).hex())
                elif isinstance(v, bytes):
                    cells.append("b:" + v.hex())
                else:
                    cells.append("s:" + v)
            dump.append({"t": tname, "r": row[0], "c": cells})
    con.close()
    with open(dump_path, "w") as f:
        for d in dump:
            f.write(json.dumps(d) + "\n")
    print(f"wrote {db_path} + {len(dump)} dump rows")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3])
