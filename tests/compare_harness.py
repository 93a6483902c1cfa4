"""Local mirror of the driver's DuckDB-vs-Spark comparison.

Compares row count, column names, and sorted values (exact for
strings/ints, 1e-9 for floats) for every (queries, oracle_sql) pair.
Usable as a script for fast iteration and imported by the pytest suite.
"""

from __future__ import annotations

import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def duck_connection(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"create view {t} as select * from '{p}'")
    return con


def normalize(rows: list[tuple], cols: list[str]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def norm_cell(v):
        if isinstance(v, bool):
            return int(v)
        if isinstance(v, float):
            return round(v, 9)
        if hasattr(v, "__int__") and not isinstance(v, (int, float, str)):
            try:
                return int(v)
            except Exception:
                return str(v)
        return v

    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


def compare_one(
    name: str, spark, con, sf_dir: str, queries=None, oracle=None
) -> tuple[bool, str]:
    from vietnamese_ocr_spark.plans.queries import ORACLE_SQL, QUERIES

    queries = queries if queries is not None else QUERIES
    oracle = oracle if oracle is not None else ORACLE_SQL
    sdf = queries[name](spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    res = con.execute(oracle[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()

    if sorted(scols) != sorted(dcols):
        return False, f"columns differ: spark={scols} duck={dcols}"
    if len(srows) != len(drows):
        return False, f"row count: spark={len(srows)} duck={len(drows)}"
    sn, dn = normalize(srows, scols), normalize(drows, dcols)
    for i, (a, b) in enumerate(zip(sn, dn)):
        for x, y in zip(a, b):
            if isinstance(x, float) or isinstance(y, float):
                fx, fy = float(x), float(y)
                if not (math.isclose(fx, fy, rel_tol=0, abs_tol=1e-9) or (math.isnan(fx) and math.isnan(fy))):
                    return False, f"row {i}: {a} != {b}"
            elif x != y:
                return False, f"row {i}: {a} != {b}"
    return True, f"{len(srows)} rows"


def main(sf_dir: str, only: list[str] | None = None) -> int:
    # the golden-parquet oracles must be generated from the SAME sf_dir
    # the Spark side reads (entry's default is the driver's sf0.01)
    os.environ["SPARK_GRAFT_CORRECTNESS_SF_DIR"] = sf_dir
    import __spark_entry__ as entrymod
    from vietnamese_ocr_spark.config import get_spark

    queries, oracle = entrymod.queries(), entrymod.oracle_sql()
    # the secondary registry (outside the driver's 50-row window) is
    # compared through the same machinery
    from vietnamese_ocr_spark.plans.queries import EXTRA_QUERIES, ORACLE_SQL

    queries = {**queries, **EXTRA_QUERIES}
    oracle = {**{k: v for k, v in ORACLE_SQL.items() if k in EXTRA_QUERIES}, **oracle}
    # COMPARE_PARTS lets the partition-layout-invariance sweep rerun the
    # whole comparison at an adversarial shuffle_partitions (e.g. 3)
    parts = int(os.environ.get("COMPARE_PARTS", "8"))
    spark = get_spark("compare", master="local[8]", shuffle_partitions=parts)
    con = duck_connection(sf_dir)
    failed = []
    names = only or list(queries)
    for name in names:
        if name not in oracle:
            print(f"  (rows-only) {name}")
            continue
        try:
            ok, msg = compare_one(name, spark, con, sf_dir, queries, oracle)
        except Exception as ex:
            ok, msg = False, f"EXC {type(ex).__name__}: {str(ex)[:300]}"
        print(("PASS" if ok else "FAIL"), name, "—", msg)
        if not ok:
            failed.append(name)
    spark.stop()
    print(f"\n{len(names) - len(failed)}/{len(names)} pass")
    return 1 if failed else 0


if __name__ == "__main__":
    sf = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
    sys.exit(main(sf, sys.argv[1:] or None))
