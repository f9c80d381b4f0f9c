#!/usr/bin/env python3
"""One-off oracle rewrites for the GenScale-replicated sf1 data
(documented in VERIFY_sf1.md). The CONTRACT SQL is untouched — these
patches adapt the dumped oracle_sql.json to two artifacts of the
scaled data / local DuckDB:

1. d06/d09 dot product: the contract twin joins the 64x-unnested
   vector relation per candidate pair (fine at the driver's sf0.01);
   at sf1 that is ~3.3B intermediate rows (exceeds local disk). The
   patch computes the same dot with list_dot_product over the raw
   arrays — identical sum of identical products; every compared cell
   passes ROUND(.,4), measured cell-exact.

2. events.ts at sf1 is INT64 nanos (GenScale's session reads
   nanos-as-long) — handled by check_oracle.py --events-ns-long, not
   here.

Usage: python3 tools/sf1_patch_oracles.py <verifyOutDir>
"""
import json, sys

OLD = """d AS (
  SELECT vec_a, vec_b, SUM(xa.v * xb.v) AS dot
  FROM cand JOIN x xa ON vec_a = xa.vec_id
  JOIN x xb ON vec_b = xb.vec_id AND xa.i = xb.i
  GROUP BY 1, 2)"""
NEW = """d AS (
  SELECT vec_a, vec_b, list_dot_product(ea.emb, eb.emb) AS dot
  FROM cand
  JOIN (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
        FROM embeddings) ea ON vec_a = ea.vec_id
  JOIN (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
        FROM embeddings) eb ON vec_b = eb.vec_id)"""

def main(out_dir):
    p = f"{out_dir}/oracle_sql.json"
    j = json.load(open(p))
    patched = []
    for name, sql in j.items():
        if OLD in sql:
            j[name] = sql.replace(OLD, NEW)
            patched.append(name)
    json.dump(j, open(p, "w"))
    print("patched:", sorted(patched))

if __name__ == "__main__":
    main(sys.argv[1])
