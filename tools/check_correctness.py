#!/usr/bin/env python3
"""Local pre-flight mirror of the driver's correctness gate.

Usage: python3 tools/check_correctness.py [sfDir] [outDir]

Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` has already run
(or run with --run-verify to invoke it). For each query in
outDir/oracle_sql.json: run the SQL in DuckDB over the sfDir parquet
tables, load the Spark parquet result, sort columns by name + rows by
values, and compare cell-by-cell (exact for non-floats, tiny-rel-tol
report for floats so we can see how close "exact" is).

Driver-side python (duckdb/pandas/pyarrow) is allowed for tooling;
the engine itself is pure Scala/Spark.
"""
import json
import math
import subprocess
import sys
import time

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def gate_incompatible_cols(df: pd.DataFrame):
    """Columns the DRIVER gate cannot sort (raw arrays/bytes from pyarrow).

    Round 8 lesson: this mirror used to tuple-ize arrays, passing locally
    what the driver then failed with `unhashable type: numpy.ndarray`
    (q91/q92/q98). The mirror must be exactly as strict as the gate."""
    bad = []
    for c in df.columns:
        if df[c].dtype == object:
            # scan the WHOLE column, not a prefix: a column whose first
            # rows are NULL but later rows hold arrays/bytes must not
            # slip past the mirror and die in the real gate (ADVICE r9)
            for v in df[c]:
                if v is None or (isinstance(v, float) and v != v):
                    continue
                if isinstance(v, (list, tuple, bytes, bytearray, dict)) or hasattr(v, "tolist"):
                    bad.append(c)
                    break
    return bad


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    # NO array coercion here — mirror the driver's pandas sort_values
    # exactly; arrays must be stringified upstream (q35 pattern).
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), key=lambda s: s.map(str)).reset_index(drop=True)
    return df


def compare(name, spark_df, oracle_df):
    problems = []
    if sorted(spark_df.columns) != sorted(oracle_df.columns):
        return [f"columns differ: spark={sorted(spark_df.columns)} oracle={sorted(oracle_df.columns)}"]
    s, o = normalize(spark_df), normalize(oracle_df)
    if len(s) != len(o):
        return [f"row count differs: spark={len(s)} oracle={len(o)}"]
    for c in s.columns:
        sv, ov = s[c], o[c]
        if pd.api.types.is_float_dtype(sv) or pd.api.types.is_float_dtype(ov):
            for i, (a, b) in enumerate(zip(sv.astype(float), ov.astype(float))):
                if (math.isnan(a) and math.isnan(b)):
                    continue
                if a != b:
                    problems.append(f"col {c} row {i}: spark={a!r} oracle={b!r} (diff={a-b:.3e})")
                    if len(problems) > 5:
                        return problems
        else:
            neq = sv.astype(str) != ov.astype(str)
            if neq.any():
                i = int(neq.idxmax())
                problems.append(f"col {c} first mismatch row {i}: spark={sv[i]!r} oracle={ov[i]!r} ({int(neq.sum())} rows)")
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    if "--run-verify" in sys.argv:
        subprocess.run(["sbt", "-batch", f'runMain graft.Verify {sf_dir} {out_dir}'],
                       check=True, cwd="/root/repo")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    # --- Toolchain pin + materialization canary (r12 verdict ask #6) ---
    # The oracle's correctness depends on DuckDB CTE-materialization
    # semantics: round-13 hit INTERNAL "Failed to bind column reference"
    # when unnest(generate_series) shared a SELECT with a pushed WHERE,
    # and many oracles rely on AS MATERIALIZED evaluating exactly once.
    # A silent DuckDB upgrade could re-break the gate with phantom
    # failures attributed to the engine. So: (a) record the exact DuckDB
    # version in the gate sidecar; (b) run a canary exercising the two
    # hazardous shapes and HARD-FAIL the gate with a loud toolchain
    # message if either misbehaves — a toolchain break must never be
    # read as an engine break.
    canary_sql = (
        "WITH nums AS MATERIALIZED (SELECT unnest(generate_series(1, 8)) AS n), "
        "toks AS MATERIALIZED (SELECT n, n * n AS sq FROM nums WHERE n % 2 = 0) "
        "SELECT count(*) AS c, sum(sq) AS s FROM toks"
    )
    canary_ok = False
    try:
        c, s = con.execute(canary_sql).fetchone()
        canary_ok = (int(c) == 4 and int(s) == 120)
        if not canary_ok:
            print(f"CANARY FAIL: materialized-CTE canary returned c={c} s={s}, expected c=4 s=120")
    except Exception as e:
        print(f"CANARY FAIL: materialized-CTE canary raised: {e}")
    print(f"oracle toolchain: duckdb {duckdb.__version__}, canary {'ok' if canary_ok else 'FAIL'}")
    if not canary_ok:
        print("TOOLCHAIN BREAK: the DuckDB oracle no longer evaluates the "
              "materialized-CTE shape the gate depends on. Any failures "
              "below are suspect — pin/downgrade DuckDB before trusting them.")
        sys.exit(2)

    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle_sql = json.load(f)

    def fresh_con():
        c = duckdb.connect()
        for t in TABLES:
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
        return c

    n_pass = n_fail = 0
    oracle_sec = {}  # per-query DuckDB wall time: the gate's cost ledger
    for name, sql in sorted(oracle_sql.items()):
        try:
            t0 = time.monotonic()
            oracle_df = con.execute(sql).df()
            oracle_sec[name] = round(time.monotonic() - t0, 3)
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            # a DuckDB INTERNAL error invalidates the connection and
            # every later query would fail with "unsuccessful or closed
            # pending query result" — reconnect so one bad oracle can't
            # cascade into 100+ phantom failures (round-12 lesson)
            try:
                con.close()
            except Exception:
                pass
            con = fresh_con()
            continue
        try:
            spark_df = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            n_fail += 1
            continue
        bad = sorted(set(gate_incompatible_cols(spark_df)) | set(gate_incompatible_cols(oracle_df)))
        if bad:
            print(f"FAIL {name}: gate-incompatible (array/bytes) columns {bad} — stringify (q35 pattern)")
            n_fail += 1
            continue
        # dtype drift is a warning: the driver's hash may be type-sensitive
        for c in sorted(set(spark_df.columns) & set(oracle_df.columns)):
            if str(spark_df[c].dtype) != str(oracle_df[c].dtype):
                print(f"WARN {name}: col {c} dtype spark={spark_df[c].dtype} oracle={oracle_df[c].dtype}")
        problems = compare(name, spark_df, oracle_df)
        if problems:
            print(f"FAIL {name}: ({len(spark_df)} rows)")
            for p in problems[:6]:
                print(f"    {p}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_df)} rows, oracle {oracle_sec[name]}s)")
            n_pass += 1
    # surface the expensive oracles the round they land, not when the
    # gate times out (r11 verdict ask): top offenders + a full sidecar
    if oracle_sec:
        top = sorted(oracle_sec.items(), key=lambda kv: -kv[1])[:8]
        total = sum(oracle_sec.values())
        print(f"\noracle wall time: {total:.1f}s total; top: "
              + ", ".join(f"{k}={v}s" for k, v in top))
        with open(f"{out_dir}/oracle_sec.json", "w") as f:
            json.dump(dict(sorted(oracle_sec.items(), key=lambda kv: -kv[1])), f, indent=1)
    # version-pinned gate environment sidecar (r12 verdict ask #6): which
    # toolchain produced this gate result, and did the canary hold
    with open(f"{out_dir}/oracle_env.json", "w") as f:
        json.dump({"duckdb_version": duckdb.__version__,
                   "pandas_version": pd.__version__,
                   "materialization_canary": "ok" if canary_ok else "fail",
                   "n_pass": n_pass, "n_fail": n_fail}, f, indent=1)
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
