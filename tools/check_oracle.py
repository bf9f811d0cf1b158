"""Local stand-in for the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and the matching
``oracle_sql()`` on DuckDB at sf0.01, then compares row count, column
names, and order-insensitive values (string-normalized, sorted).

Usage: python tools/check_oracle.py [qid ...]
"""

from __future__ import annotations

import math
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from data_toolz_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def normalize(value) -> str:
    """Exact-value rendering (mimics the driver's value hasher).

    Floats render at FULL precision (repr), not %.9g — the driver
    hashes exact values, so a DuckDB HUGEINT/floor() that arrives as
    float64 (``6.0``) must NOT silently equal a Spark long (``6``).
    """
    import decimal

    if value is None:
        return "NULL"
    if isinstance(value, decimal.Decimal):
        # HUGEINT / un-cast floor() surface as decimal128 through
        # Arrow; rendering them distinctly forces the oracle SQL to
        # CAST to BIGINT/DOUBLE explicitly (what the driver needs).
        return f"dec({value})"
    if isinstance(value, float):
        if math.isnan(value):
            return "NaN"
        return repr(value)
    if isinstance(value, bool):
        return str(value).lower()
    if isinstance(value, list):
        return "[" + ",".join(normalize(v) for v in value) + "]"
    return str(value)


def frame_signature(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    cols = [columns[i] for i in order]
    body = sorted(
        tuple(normalize(row[i]) for i in order) for row in rows
    )
    return cols, body


def main() -> int:
    only = set(sys.argv[1:])
    # unique warehouse per run: table-building qids (text_search,
    # incremental_novel_docs) must not collide with a concurrently
    # running pytest suite or another sweep (see tests/conftest.py)
    warehouse = tempfile.mkdtemp(prefix="dts-oracle-warehouse-")
    spark = get_spark(
        app_name="oracle-check",
        master="local[8]",
        shuffle_partitions=16,
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.sql.warehouse.dir": warehouse,
        },
    )
    con = duckdb.connect()
    for table in entrymod.TABLES:
        con.execute(
            f"CREATE VIEW {table} AS SELECT * FROM "
            f"'{SF_DIR}/{table}.parquet'"
        )

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for qid, fn in queries.items():
        if only and qid not in only:
            continue
        try:
            sdf = fn(spark, SF_DIR)
            s_rows = sdf.collect()
            s_cols = sdf.columns
        except Exception as exc:
            print(f"FAIL {qid}: spark error: {exc}")
            failures.append(qid)
            continue
        if qid not in oracles:
            print(f"ok?  {qid}: rows-only check, {len(s_rows)} rows")
            continue
        try:
            # fetch through Arrow: DuckDB coerces HUGEINT (SUM of
            # BIGINT) and floor() to float64 on this path, exactly as
            # the driver sees them — fetchall() would hand back python
            # ints and hide the type divergence.
            tbl = con.execute(oracles[qid]).arrow()
            d_cols = tbl.column_names
            cols_py = [tbl.column(i).to_pylist() for i in range(tbl.num_columns)]
            d_rows = list(zip(*cols_py)) if cols_py else []
        except Exception as exc:
            print(f"FAIL {qid}: duckdb error: {exc}")
            failures.append(qid)
            continue
        s_sig = frame_signature(s_cols, [tuple(r) for r in s_rows])
        d_sig = frame_signature(d_cols, d_rows)
        if s_sig[0] != d_sig[0]:
            print(f"FAIL {qid}: columns {s_sig[0]} vs {d_sig[0]}")
            failures.append(qid)
        elif len(s_sig[1]) != len(d_sig[1]):
            print(
                f"FAIL {qid}: rowcount {len(s_sig[1])} vs {len(d_sig[1])}"
            )
            failures.append(qid)
        elif s_sig[1] != d_sig[1]:
            diff = [
                (a, b)
                for a, b in zip(s_sig[1], d_sig[1])
                if a != b
            ][:3]
            print(f"FAIL {qid}: value mismatch, first diffs: {diff}")
            failures.append(qid)
        else:
            print(f"PASS {qid}: {len(s_rows)} rows")

    print()
    if failures:
        print(f"{len(failures)} FAILURES: {failures}")
        return 1
    print("all queries match the oracle")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
