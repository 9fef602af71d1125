#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify at a
given SF, then compare each query's parquet output against its DuckDB
oracle (columns sorted by name, rows sorted, exact value compare).

Usage: python3 tools/check.py [sfdir] [--skip-verify] [--only q1,q2]
"""
import json
import math
import subprocess
import sys
from pathlib import Path

import duckdb

SFDIR = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") \
    else "/root/testdata/sf0.01"
OUT = "/tmp/graft_verify_out"
ONLY = None
for a in sys.argv:
    if a.startswith("--only"):
        ONLY = set(a.split("=", 1)[1].split(","))

if "--self-test" not in sys.argv and "--skip-verify" not in sys.argv:
    r = subprocess.run(
        ["sbt", "-batch", f'runMain graft.Verify {SFDIR} {OUT}'],
        cwd="/root/repo", capture_output=True, text=True)
    tail = (r.stdout + r.stderr)[-3000:]
    if r.returncode != 0:
        print("VERIFY FAILED\n", tail)
        sys.exit(1)
    for line in (r.stdout + r.stderr).splitlines():
        if "[verify]" in line:
            print(line)

con = duckdb.connect()
if "--self-test" not in sys.argv:
    oracle = json.loads(Path(f"{OUT}/oracle_sql.json").read_text())
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SFDIR}/{t}.parquet')")
# The driver's events.parquet carries ts as TIMESTAMP(NANOS); the
# derived sf1 fixture (graft.tools.ScaleGen) writes the same values as
# int64 nanos (Spark can't author nanos timestamps). Normalize the view
# so every oracle's epoch(ts)/date math sees a timestamp either way.
ts_type = str(con.execute(
    "SELECT data_type FROM information_schema.columns "
    "WHERE table_name = 'events' AND column_name = 'ts'").fetchone()[0])
if ts_type.upper().startswith("BIGINT"):
    con.execute("CREATE OR REPLACE VIEW events AS SELECT * REPLACE "
                f"(make_timestamp(ts // 1000) AS ts) FROM "
                f"read_parquet('{SFDIR}/events.parquet')")


def typecat(t, duck=False):
    t = str(t).lower()
    # hugeint (int128) is its own category: the driver hash is
    # encoding-strict, so a DuckDB windowed sum() left uncast fails the
    # gate even when values match (round-1 sessionize_events lesson).
    if t in ("hugeint", "uhugeint", "int128"):
        return "i128"
    # 'int8' is source-dependent: DuckDB's alias for BIGINT (8 bytes) vs
    # pyarrow's 8-BIT integer — categorize by origin so an Arrow byte
    # column flags drift instead of silently passing as i64
    if t == "int8":
        return "i64" if duck else "i8"
    if t in ("bigint", "int64", "long", "ubigint"):
        return "i64"
    if t in ("integer", "int", "int32", "int4"):
        return "i32"
    if t in ("smallint", "int16", "int2"):
        return "i16"
    if t in ("tinyint", "int1"):
        return "i8"
    if t in ("double", "float8", "float64"):
        return "f64"
    if t in ("float", "real", "float4", "float32"):
        return "f32"
    if "varchar" in t or t in ("string", "text", "large_string"):
        return "str"
    if "bool" in t:
        return "bool"
    if t.startswith("date"):
        return "date"
    if "timestamp" in t:
        return "ts"
    if "list" in t or "array" in t:
        return "arr"
    return "other:" + t


def type_mismatches(name, pdir):
    """Column-type drift between our parquet and the oracle result —
    a dtype-strict driver compare would flag these even when values
    match."""
    import pyarrow.parquet as pq
    import glob as g
    sch = pq.read_schema(g.glob(f"{pdir}/*.parquet")[0])
    st = {n: typecat(t) for n, t in zip(sch.names, sch.types)}
    rows = con.execute(
        f"DESCRIBE SELECT * FROM ({oracle[name]}) LIMIT 0").fetchall()
    dt = {r[0]: typecat(r[1], duck=True) for r in rows}
    return [f"{c}: spark={st[c]} duck={dt.get(c)}"
            for c in st if st.get(c) != dt.get(c)]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float) and math.isnan(v):
                v = "NaN"
            vals.append(repr(v))
        out.append(tuple(vals))
    out.sort()
    return [cols[i] for i in order], out


def self_test():
    """Prove the int8 disambiguation end-to-end: a pyarrow int8 (8-BIT)
    column against a DuckDB bigint oracle must flag type drift, while a
    DuckDB-described 'int8' (its BIGINT alias) must categorize as i64."""
    import tempfile
    import pyarrow as pa
    import pyarrow.parquet as pq
    assert typecat("int8") == "i8", "pyarrow int8 must be 8-bit"
    assert typecat("int8", duck=True) == "i64", "duck int8 alias is bigint"
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(
            pa.table({"x": pa.array([1, 2], type=pa.int8())}),
            f"{d}/part.parquet")
        sch = pq.read_schema(f"{d}/part.parquet")
        st = {n: typecat(t) for n, t in zip(sch.names, sch.types)}
        drows = con.execute(
            "DESCRIBE SELECT cast(1 as bigint) AS x").fetchall()
        dt = {r[0]: typecat(r[1], duck=True) for r in drows}
        drift = [c for c in st if st[c] != dt.get(c)]
        assert drift == ["x"], f"int8-vs-bigint drift not flagged: {st} {dt}"
    print("self-test pass: pyarrow int8 flags drift vs duck bigint")


if "--self-test" in sys.argv:
    self_test()
    sys.exit(0)

n_pass = n_fail = 0
fails = []
for name in sorted(oracle):
    if ONLY and name not in ONLY:
        continue
    pdir = Path(OUT) / name
    if not pdir.exists():
        print(f"MISS  {name}: no spark output")
        n_fail += 1
        fails.append(name)
        continue
    try:
        got_rel = con.execute(
            f"SELECT * FROM read_parquet('{pdir}/*.parquet')")
        got_cols = [c[0] for c in got_rel.description]
        got = got_rel.fetchall()
        exp_rel = con.execute(oracle[name])
        exp_cols = [c[0] for c in exp_rel.description]
        exp = exp_rel.fetchall()
    except Exception as e:
        print(f"ERR   {name}: {str(e)[:200]}")
        n_fail += 1
        fails.append(name)
        continue
    gc, gr = canon(got, got_cols)
    ec, er = canon(exp, exp_cols)
    if gc != ec:
        print(f"FAIL  {name}: cols {gc} != {ec}")
        n_fail += 1
        fails.append(name)
    elif gr != er:
        diff_g = [r for r in gr if r not in set(er)][:3]
        diff_e = [r for r in er if r not in set(gr)][:3]
        print(f"FAIL  {name}: rows {len(gr)} vs {len(er)}; "
              f"spark-only={diff_g} oracle-only={diff_e}")
        n_fail += 1
        fails.append(name)
    else:
        tm = type_mismatches(name, pdir)
        if tm:
            print(f"FAIL  {name}: type drift {tm}")
            n_fail += 1
            fails.append(name)
        else:
            print(f"pass  {name} ({len(gr)} rows)")
            n_pass += 1

print(f"\n{n_pass} pass, {n_fail} fail" + (f": {fails}" if fails else ""))
sys.exit(1 if n_fail else 0)
