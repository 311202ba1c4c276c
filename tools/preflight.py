#!/usr/bin/env python3
"""Local pre-flight diff: the inner dev loop (SURVEY.md §5 item 1).

Usage:
    sbt 'runMain graft.Verify /root/testdata/sf0.01 /tmp/verify'
    python3 tools/preflight.py /root/testdata/sf0.01 /tmp/verify [name_filter]

Mimics the driver's compare: for each entry in oracle_sql.json, run the SQL
in DuckDB over views named after the fixture tables, load the Spark result
parquet, sort columns by name, and require exact value equality row by row.
"""
import sys, json, glob

import duckdb
import pyarrow as pa

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def has_toplevel_order_by(sql):
    """True iff an ORDER BY appears at paren depth 0 — i.e. a total outer
    sort. A substring check would be fooled by OVER (ORDER BY ...) or a
    subquery's sort, which order nothing in the outer result. Quoted
    string literals are skipped (a paren inside '...' must not skew the
    depth count) and whitespace runs are collapsed so ORDER\\n  BY still
    matches. Mirrored in Scala by OracleLintSpec.hasToplevelOrderBy."""
    s = " ".join(sql.lower().split())
    depth, i, n = 0, 0, len(s)
    while i < n:
        ch = s[i]
        if ch == "'":  # skip the literal ('' escapes a quote inside it)
            i += 1
            while i < n:
                if s[i] == "'" and i + 1 < n and s[i + 1] == "'":
                    i += 2
                elif s[i] == "'":
                    break
                else:
                    i += 1
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0 and s.startswith("order by", i):
            return True
        i += 1
    return False


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    name_filter = sys.argv[3] if len(sys.argv) > 3 else ""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    with open(f"{outdir}/oracle_sql.json") as f:
        oracle = json.load(f)
    failures = 0
    for name in sorted(oracle):
        if name_filter and name_filter not in name:
            continue
        sql = oracle[name]
        files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no result parquet (query errored in Verify?)")
            failures += 1
            continue
        got = con.execute(
            "SELECT * FROM read_parquet(?)", [files]).fetch_arrow_table()
        try:
            exp = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        gcols, ecols = sorted(got.column_names), sorted(exp.column_names)
        if gcols != ecols:
            print(f"FAIL {name}: columns spark={gcols} duckdb={ecols}")
            failures += 1
            continue
        # The driver's compare is pandas-based: it sort_values/hashes cell
        # VALUES, and a nested cell (list/struct/map → numpy.ndarray/dict)
        # is unhashable there even though arrow handles it fine here (r6:
        # q_dedup_shingle_stage died driver-side with 'unhashable type:
        # numpy.ndarray' while this preflight passed it). Flatten nested
        # columns to scalars (e.g. concat_ws / to_json) before shipping.
        nested = [c for c in gcols if pa.types.is_nested(got.schema.field(c).type)]
        if nested:
            print(f"FAIL {name}: nested result columns {nested} — the "
                  "driver's pandas compare cannot hash them; project scalars")
            failures += 1
            continue
        gtypes = [str(got.schema.field(c).type) for c in gcols]
        etypes = [str(exp.schema.field(c).type) for c in ecols]
        if gtypes != etypes:
            # The driver's compare includes schema_match — type drift that
            # "looks OK" locally would still fail the round, so fail here.
            drift = [(c, a, b) for c, a, b in zip(gcols, gtypes, etypes) if a != b]
            print(f"FAIL {name}: type drift {drift}")
            failures += 1
            continue
        g = got.select(gcols).to_pylist()
        e = exp.select(ecols).to_pylist()
        if len(g) != len(e):
            print(f"FAIL {name}: rows spark={len(g)} duckdb={len(e)}")
            failures += 1
            continue
        # Row-order-sensitive on purpose: every oracle query must end in a
        # total ORDER BY (SURVEY §2 rule 1). Lint that multi-row oracles
        # actually have one, so a forgotten sort fails loudly here instead
        # of flaking across SPARK_GRAFT_CPUS settings.
        if len(e) > 1 and not has_toplevel_order_by(sql):
            print(f"FAIL {name}: {len(e)}-row oracle has no top-level ORDER "
                  "BY (total order required by SURVEY §2 rule 1; ORDER BY "
                  "inside OVER(...) or a subquery does not count)")
            failures += 1
            continue
        if g != e:
            for i, (a, b) in enumerate(zip(g, e)):
                if a != b:
                    print(f"FAIL {name}: first diff at row {i}:")
                    print(f"  spark : {a}")
                    print(f"  duckdb: {b}")
                    break
            failures += 1
            continue
        print(f"OK   {name} ({len(g)} rows)")
    checked = len([n for n in oracle if not name_filter or name_filter in n])
    print(f"== {checked - failures}/{checked} OK ==")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
