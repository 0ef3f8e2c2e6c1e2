#!/usr/bin/env python3
"""Per-key DuckDB parity with a per-key timeout — the sf1.0 spot-parity
runner (round 18, VERDICT r17 next #1).

Unlike tools/parity.py (one process, whole key set), each key's oracle
runs in its own subprocess under a wall-clock cap, so one pathological
oracle cannot wedge the gate; a TIMEOUT is reported per key instead.
The child mirrors parity.py's compare exactly: column-name set check
first, then the sorted/stringified value compare. Keys without an
oracle entry are reported (and counted) as no-oracle, like parity.py.

Usage:
  # 1. generate the repo-local sf1 fixtures (deterministic, ~158 MB)
  sbt "runMain graft.tools.GenScale testdata_sf1"
  # 2. run the shape-sensitive keys through Verify at sf1
  sbt "runMain graft.Verify testdata_sf1 /tmp/vsf1 <key,key,...>"
  # 3. compare per key — pass the SAME key list so a key whose Verify
  #    run failed (Verify swallows per-key errors to stderr) is counted
  #    as MISSING instead of silently skipped
  python3 tools/spot_parity.py /tmp/vsf1 testdata_sf1 [timeout_sec] [key,key,...]

The round-18 spot list (banded dedup/vec + sketches + asof/interval —
25 keys, all green at sf1; see DECISIONS r18):
  dedup_minhash_lsh dedup_lsh_cc dedup_band_sweep dedup_simhash
  dedup_winnow_pairs dedup_containment dedup_survivors dedup_incremental
  dedup_minhash_estimate dedup_substring dedup_embedding_cosine
  vec_dedup_semantic vec_threshold_pairs text_fingerprint
  text_segment_dedup agg_hll_merge agg_approx_distinct
  agg_approx_percentile agg_bitmap_distinct agg_cms_freq join_asof
  join_asof_forward join_asof_tolerance join_interval join_range_bucketed
Deliberately excluded (DECISIONS r18): text_jaccard_dup,
text_jaccard_indexed, dedup_cc_components — the EXACT-pairwise control
contracts, whose oracles are O(n²·|set|) by definition; their banded
twins cover the sf1 scale.
"""
import os
import subprocess
import sys
import time

CHILD = r'''
import sys, os, json, duckdb, pandas as pd
out, sf, name = sys.argv[1], sys.argv[2], sys.argv[3]
con = duckdb.connect(); con.execute("SET TimeZone='UTC'")
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    p = f"{sf}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
oracle = json.load(open(os.path.join(out, "oracle_sql.json")))
if name not in oracle:
    print("NO-ORACLE " + name); sys.exit(3)
got = pd.read_parquet(os.path.join(out, name))
exp = con.sql(oracle[name]).df()
if sorted(got.columns) != sorted(exp.columns):
    print(f"FAIL {name} schema {sorted(got.columns)} != {sorted(exp.columns)}")
    sys.exit(1)
def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns))
    cols = [df[c].astype(str).tolist() for c in df.columns]
    return [tuple(c[i] for c in cols) for i in range(len(df))]
ok = canon(got) == canon(exp)
print(("OK " if ok else "FAIL ") + name, len(got), len(exp))
sys.exit(0 if ok else 1)
'''


def main(out_dir, sf_dir, timeout, keys=None):
    have = sorted(d for d in os.listdir(out_dir)
                  if os.path.isdir(os.path.join(out_dir, d)))
    missing = []
    if keys:
        want = sorted(keys)
        missing = [k for k in want if k not in have]
        names = [k for k in want if k in have]
    else:
        names = have
    n_ok = n_fail = n_to = n_noracle = 0
    for name in names:
        t0 = time.time()
        try:
            r = subprocess.run([sys.executable, "-c", CHILD,
                                out_dir, sf_dir, name],
                               capture_output=True, text=True, timeout=timeout)
            line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else \
                (r.stderr.strip().splitlines() or ["no-output"])[-1]
            if r.returncode == 0:
                n_ok += 1
            elif r.returncode == 3:
                n_noracle += 1
            else:
                n_fail += 1
            print(f"{time.time() - t0:7.1f}s {line}", flush=True)
        except subprocess.TimeoutExpired:
            n_to += 1
            print(f"{time.time() - t0:7.1f}s TIMEOUT {name}", flush=True)
    for k in missing:
        print(f"MISSING {k} (no Verify output — check Verify stderr)")
    print(f"\n{n_ok} ok, {n_fail} fail, {n_to} timeout, "
          f"{n_noracle} no-oracle, {len(missing)} missing-output")
    return 1 if (n_fail or n_to or missing) else 0


if __name__ == "__main__":
    if len(sys.argv) < 3:
        print(__doc__)
        sys.exit(2)
    sys.exit(main(sys.argv[1], sys.argv[2],
                  int(sys.argv[3]) if len(sys.argv) > 3 else 420,
                  sys.argv[4].split(",") if len(sys.argv) > 4 else None))
