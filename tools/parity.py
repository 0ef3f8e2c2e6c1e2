#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle compare (SURVEY.md §5 layer 1).

Usage: python3 tools/parity.py <verifyOutDir> <sfDir>

Reads each <outDir>/<name>/ parquet (written by `graft.Verify`), runs the
matching SQL from <outDir>/oracle_sql.json in DuckDB against views over the
sfDir parquet tables, sorts columns by name (the driver does), and compares
row-by-row. Reports value mismatches and type differences separately.
"""
import sys, os, json
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    return v


def cells_equal(a, b):
    if a is None or b is None:
        return a is None and b is None
    # Decimal == int/Decimal is value-based; float == float must be exact.
    try:
        return a == b
    except Exception:
        return False


def main(out_dir, sf_dir):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)

    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_ok = n_fail = n_noracle = 0
    for name in names:
        if name not in oracle:
            print(f"  [no-oracle] {name} (rows-only check)")
            n_noracle += 1
            continue
        try:
            got_rel = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            got_cols = list(got_rel.columns)
            got_types = [str(t) for t in got_rel.types]
            got = got_rel.fetchall()
            exp_rel = con.sql(oracle[name])
            exp_cols = list(exp_rel.columns)
            exp_types = [str(t) for t in exp_rel.types]
            exp = exp_rel.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: exec error: {e}")
            n_fail += 1
            continue

        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL  {name}: columns {sorted(got_cols)} != {sorted(exp_cols)}")
            n_fail += 1
            continue
        # driver sorts columns by name before hashing
        gperm = sorted(range(len(got_cols)), key=lambda i: got_cols[i])
        eperm = sorted(range(len(exp_cols)), key=lambda i: exp_cols[i])
        gt = [got_types[i] for i in gperm]
        et = [exp_types[i] for i in eperm]
        type_note = "" if gt == et else f"  [type-diff: {gt} vs {et}]"
        if len(got) != len(exp):
            print(f"FAIL  {name}: rowcount {len(got)} != {len(exp)}{type_note}")
            n_fail += 1
            continue
        bad = None
        for ri, (gr, er) in enumerate(zip(got, exp)):
            g = [norm(gr[i]) for i in gperm]
            e = [norm(er[i]) for i in eperm]
            if not all(cells_equal(a, b) for a, b in zip(g, e)):
                bad = (ri, g, e)
                break
        if bad:
            ri, g, e = bad
            print(f"FAIL  {name}: row {ri} differs{type_note}\n"
                  f"      got: {g}\n      exp: {e}")
            n_fail += 1
        else:
            print(f"ok    {name} ({len(got)} rows){type_note}")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_fail} fail, {n_noracle} no-oracle, "
          f"{len(oracle) - n_ok - n_fail} missing-output")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
