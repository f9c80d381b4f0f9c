#!/usr/bin/env python3
"""Local differential check: Spark Verify output vs DuckDB oracle.

Replicates the driver's compare as closely as we can infer: for each
query, load the Spark-written parquet and the DuckDB result of the
oracle SQL over the same sf dir, sort columns by name, sort rows, and
compare cell-by-cell (exact; floats compared bit-exact first, then with
tolerance reported separately).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, os, json, math
import duckdb
import pyarrow.parquet as pq
import pyarrow as pa

def load_spark(path):
    # Verify writes a directory with part files
    return pq.read_table(path)

def main(sf_dir, out_dir, events_ns_long=False):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        if t == "events" and events_ns_long:
            # GenScale-replicated data (.sfscale/*) writes events.ts as
            # plain INT64 nanos (the generating Spark session reads
            # nanos-as-long); restore TIMESTAMP semantics in the view so
            # every oracle's epoch_us/date math applies unchanged. The
            # micros truncation matches the Spark side's `ts div 1000`.
            con.execute(
                f"CREATE VIEW {t} AS SELECT * REPLACE "
                f"(make_timestamp(ts // 1000) AS ts) "
                f"FROM '{sf_dir}/{t}.parquet'")
            continue
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name in sorted(oracles):
        sql = oracles[name]
        spath = os.path.join(out_dir, name)
        if not os.path.isdir(spath):
            print(f"FAIL {name}: no spark output dir"); n_fail += 1; continue
        try:
            got = load_spark(spath)
            want = con.execute(sql).arrow()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        ok, msg = compare(got, want)
        if ok:
            n_pass += 1
            print(f"PASS {name} ({got.num_rows} rows){': '+msg if msg else ''}")
        else:
            n_fail += 1
            print(f"FAIL {name}: {msg}")
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

def compare(got, want):
    gcols, wcols = sorted(got.column_names), sorted(want.column_names)
    if gcols != wcols:
        return False, f"columns differ: spark={gcols} duckdb={wcols}"
    if got.num_rows != want.num_rows:
        return False, f"rowcount differs: spark={got.num_rows} duckdb={want.num_rows}"
    # schema compare (after name sort)
    gs = {n: got.schema.field(n).type for n in gcols}
    ws = {n: want.schema.field(n).type for n in wcols}
    type_notes = [f"{n}: {gs[n]} vs {ws[n]}" for n in gcols if gs[n] != ws[n]]
    grows = sorted(zip(*[norm_col(got.column(n)) for n in gcols]), key=sort_key)
    wrows = sorted(zip(*[norm_col(want.column(n)) for n in gcols]), key=sort_key)
    approx = 0
    for i, (gr, wr) in enumerate(zip(grows, wrows)):
        for cname, gv, wv in zip(gcols, gr, wr):
            if gv == wv:
                continue
            if isinstance(gv, float) and isinstance(wv, float):
                if math.isclose(gv, wv, rel_tol=1e-9, abs_tol=1e-9):
                    approx += 1; continue
            return False, f"row {i} col {cname}: spark={gv!r} duckdb={wv!r}"
    # approx-equal is a HARD FAIL: the driver hashes exact cell values,
    # so a float that differs in the last bits fails its compare even
    # though it is "close". Treating it as a local pass is exactly how
    # the s05 divergence survived two rounds (local gate green, driver
    # red) — the local gate must be at least as strict as the driver's.
    if approx:
        return False, (f"{approx} float cells only approx-equal "
                       "(driver hash compare would fail)")
    notes = []
    if type_notes: notes.append("TYPE MISMATCH " + "; ".join(type_notes))
    return True, "; ".join(notes)

def norm_col(c):
    vals = c.to_pylist()
    t = c.type
    if pa.types.is_timestamp(t):
        return [v.isoformat() if v is not None else None for v in vals]
    if pa.types.is_decimal(t):
        return [float(v) if v is not None else None for v in vals]
    return vals

def sort_key(row):
    return tuple((v is None, str(type(v)), v) for v in row)

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  events_ns_long="--events-ns-long" in sys.argv[3:]))
