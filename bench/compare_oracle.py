"""Local mirror of the driver's correctness gate: run every
__spark_entry__ query on Spark AND its oracle_sql on DuckDB at
sf0.01, compare row count, column names, and an order-insensitive
value hash. Run: python bench/compare_oracle.py [sf_dir]
"""

from __future__ import annotations

import datetime as dt
import hashlib
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def canon(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    if isinstance(v, bool):
        return "T" if v else "F"
    if isinstance(v, (dt.datetime,)):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def table_hash(cols: list[str], rows: list[tuple]) -> tuple[str, int, list[str]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]
    return h, len(rows), sorted(cols)


def main(sf_dir: str = "/root/testdata/sf0.01") -> int:
    import duckdb

    import __spark_entry__ as entrymod
    from parquet_converter_spark.session import get_spark

    spark = get_spark(app="oracle-compare", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name:28s} spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            # rows-only queries have no SQL oracle (seeded-hash ops DuckDB
            # can't express) — each is independently checked by a
            # known-answer pytest instead (tests/test_known_answers.py)
            sh, sn, sc = table_hash(scols, srows)
            print(
                f"rows  {name:28s} rows={sn:6d} hash={sh} "
                f"(rows-only; known-answer tested) {time.time()-t0:.1f}s"
            )
            continue
        try:
            rel = con.sql(oracles[name])
            orows = rel.fetchall()
            ocols = [d[0] for d in rel.description]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name:28s} duckdb error: {e}")
            failures.append(name)
            continue
        sh, sn, sc = table_hash(scols, srows)
        oh, on, oc = table_hash(ocols, orows)
        ok = (sh, sn, sc) == (oh, on, oc)
        status = "OK  " if ok else "FAIL"
        print(f"{status}  {name:28s} rows={sn}/{on} hash={sh}/{oh} {time.time()-t0:.1f}s")
        if not ok:
            failures.append(name)
            if sc != oc:
                print(f"      cols spark={sc}\n      cols duck ={oc}")
            elif sn == on and sn <= 20:
                order = sorted(range(len(scols)), key=lambda i: scols[i])
                sl = sorted("|".join(canon(r[i]) for i in order) for r in srows)
                oorder = sorted(range(len(ocols)), key=lambda i: ocols[i])
                ol = sorted("|".join(canon(r[i]) for i in oorder) for r in orows)
                for a, b in zip(sl, ol):
                    if a != b:
                        print(f"      spark: {a}\n      duck : {b}")
                        break
    print(f"\n{len(qs) - len(failures)}/{len(qs)} queries consistent")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
