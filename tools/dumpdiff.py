#!/usr/bin/env python3
"""Value-level compare of two graft.Verify dump trees (the cross-core
determinism gate): for every query directory present in DIR_A, assert
the parquet content of DIR_B is identical — same column names, same
dtypes, same rows IN ORDER (every catalog row ends in a total sort, so
order is part of the contract).

Why value-level, not byte-level: Spark 4.1.2's parquet writer emits the
column-chunk encodings list in a nondeterministic order inside the
thrift footer, so two runs of the same query produce byte-different
files with identical schema, metadata and data pages. The driver's
correctness gate hashes VALUES (sorted columns), so values are what
determinism must hold over.

Usage: dumpdiff.py DIR_A DIR_B   → exit 0 and "== N/N identical ==",
or exit 1 listing the differing queries.
"""
import glob
import os
import sys

import pyarrow.parquet as pq


def read(d, q):
    files = sorted(glob.glob(os.path.join(d, q, "*.parquet")))
    if not files:
        return None
    return pq.read_table(files).to_pandas()


def main(a, b):
    qs = sorted(x for x in os.listdir(a) if x.startswith("q_"))
    bad = []
    for q in qs:
        ta, tb = read(a, q), read(b, q)
        if ta is None or tb is None:
            bad.append(f"{q}: missing dump ({'A' if ta is None else 'B'})")
        elif list(ta.columns) != list(tb.columns):
            bad.append(f"{q}: columns {list(ta.columns)} != {list(tb.columns)}")
        elif list(ta.dtypes) != list(tb.dtypes):
            bad.append(f"{q}: dtypes differ")
        elif not ta.equals(tb):
            bad.append(f"{q}: values differ")
    if bad:
        for x in bad:
            print("DIFF", x)
        print(f"== {len(qs) - len(bad)}/{len(qs)} identical, {len(bad)} differ ==")
        return 1
    print(f"== {len(qs)}/{len(qs)} identical ==")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
