#!/usr/bin/env python3
"""Dev-only: split each single-file test table into an 8-file parquet
directory (same rows, same schema — pyarrow preserves
TIMESTAMP(NANOS) exactly), to gate the board against a realistic
multi-file table layout (r9 verdict item 4): Spark reads the 8 splits
in parallel with nondeterministic partition order, flushing any
residual single-file ordering/width assumptions.

Usage: python3 tools/split8.py <srcSfDir> <dstDir> [nFiles]
Then:  sbt -batch "runMain graft.Verify <dstDir> /tmp/out_multi"
       python3 tools/check.py <srcSfDir> /tmp/out_multi   # oracle on the ORIGINAL
"""
import os
import sys

import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    src, dst = sys.argv[1], sys.argv[2]
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    for t in TABLES:
        tbl = pq.read_table(f"{src}/{t}.parquet")
        d = f"{dst}/{t}.parquet"
        os.makedirs(d, exist_ok=True)
        n = tbl.num_rows
        for i in range(k):
            lo, hi = i * n // k, (i + 1) * n // k
            if hi > lo:
                pq.write_table(tbl.slice(lo, hi - lo), f"{d}/part-{i:05d}.parquet")
        print(f"{t}: {n} rows -> {min(k, n)} files")


if __name__ == "__main__":
    main()
