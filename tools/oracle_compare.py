#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare.

Usage: oracle_compare.py <sf_dir> <verify_out_dir> [name ...]

For each query with an entry in <verify_out_dir>/oracle_sql.json (or the
names given), runs the oracle SQL in DuckDB with every <sf_dir>/*.parquet
registered as a view, loads the Spark parquet output from
<verify_out_dir>/<name>/, sorts columns by name, canonicalizes values, and
compares row sequences. Prints one line per query and a final summary.
"""
import sys, os, json, glob, math
import duckdb


def canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # driver-style canonical text for doubles: repr round-trips exactly
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    # timestamps/dates/decimals -> str
    return str(v)


def rows_of(cur):
    cols = [d[0] for d in cur.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon(r[i]) for i in order) for r in cur.fetchall()]
    return [cols[i] for i in order], out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[: -len(".parquet")]
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    names = sorted(n for n in oracle if not only or n in only)
    n_pass = n_fail = n_skip = 0
    fails = []
    for name in names:
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            print(f"SKIP  {name} (no spark output)")
            n_skip += 1
            continue
        try:
            cur = con.execute(oracle[name])
            ocols, orows = rows_of(cur)
            cur = con.execute(
                f"SELECT * FROM read_parquet('{qdir}/*.parquet')")
            scols, srows = rows_of(cur)
        except Exception as e:
            print(f"ERR   {name}: {e}")
            fails.append(name)
            n_fail += 1
            continue
        if [c.lower() for c in ocols] != [c.lower() for c in scols]:
            print(f"FAIL  {name}: schema {scols} vs oracle {ocols}")
            fails.append(name)
            n_fail += 1
        elif srows != orows:
            diff = next(
                (i for i, (a, b) in enumerate(zip(srows, orows)) if a != b),
                min(len(srows), len(orows)))
            print(f"FAIL  {name}: rows {len(srows)} vs {len(orows)}; "
                  f"first diff at {diff}:")
            if diff < len(srows):
                print(f"      spark : {srows[diff]}")
            if diff < len(orows):
                print(f"      oracle: {orows[diff]}")
            fails.append(name)
            n_fail += 1
        else:
            print(f"ok    {name} ({len(srows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} skip of {len(names)}")
    if fails:
        print("failures:", " ".join(fails))
        sys.exit(1)


if __name__ == "__main__":
    main()
