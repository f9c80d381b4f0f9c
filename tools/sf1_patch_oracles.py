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

# d13's in-cell pair distance: same unnest-join blowup shape as d06 at
# sf1 (25M in-cell pairs x 64 dims). The list form floors per element
# and sums BIGINTs — integer sums are order-independent, so this is
# bit-identical to the contract CTE, not merely ROUND-equal.
OLD_D13 = """pd AS (
  SELECT a.vec_id AS va, b.vec_id AS vb,
    CAST(SUM(CAST(FLOOR((xa.v - xb.v) * (xa.v - xb.v) * 1048576) AS BIGINT)) AS BIGINT) AS d
  FROM assigned a JOIN assigned b
    ON a.cell = b.cell AND a.vec_id < b.vec_id
  JOIN x xa ON xa.vec_id = a.vec_id
  JOIN x xb ON xb.vec_id = b.vec_id AND xa.i = xb.i
  GROUP BY 1, 2)"""
NEW_D13 = """pd AS (
  SELECT a.vec_id AS va, b.vec_id AS vb,
    CAST(list_sum(list_transform(generate_series(1, len(ea.emb)),
      i -> CAST(FLOOR((ea.emb[i] - eb.emb[i]) * (ea.emb[i] - eb.emb[i])
        * 1048576) AS BIGINT))) AS BIGINT) AS d
  FROM assigned a JOIN assigned b
    ON a.cell = b.cell AND a.vec_id < b.vec_id
  JOIN (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
        FROM embeddings) ea ON ea.vec_id = a.vec_id
  JOIN (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
        FROM embeddings) eb ON eb.vec_id = b.vec_id)"""

# s01/s09 brute-force dot: 400 queries x 20k corpus x 64 dims unnest
# join at sf1 — list_dot_product over the raw arrays, same sum of the
# same products, every compared cell passes ROUND(.,4) (d06 treatment).
OLD_BF = """d AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, SUM(q.v * c.v) AS dot
  FROM x q JOIN x c ON q.i = c.i AND q.vec_id <> c.vec_id
  WHERE q.vec_id % 50 = 0 AND q.vec_id < 50000
  GROUP BY 1, 2)"""
NEW_BF = """d AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
    list_dot_product(q.emb, c.emb) AS dot
  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
        FROM embeddings) q
  JOIN (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
        FROM embeddings) c ON q.vec_id <> c.vec_id
  WHERE q.vec_id % 50 = 0 AND q.vec_id < 50000)"""

# s19's all-corpus in-cell kNN graph: ~50M candidate pairs x 64 dims
# unnest join at sf1 (the d06 shape, corpus-sized) — same
# list_dot_product treatment, cells compared after ROUND(.,4).
OLD_S19 = """d AS (
  SELECT cand.vec_id, cand.cell, cand.neighbor_id,
    SUM(qx.v * cx.v) AS dot
  FROM cand JOIN x qx ON qx.vec_id = cand.vec_id
            JOIN x cx ON cx.vec_id = cand.neighbor_id AND qx.i = cx.i
  GROUP BY 1, 2, 3)"""
NEW_S19 = """d AS (
  SELECT cand.vec_id, cand.cell, cand.neighbor_id,
    list_dot_product(ea.emb, eb.emb) AS dot
  FROM cand
  JOIN (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
        FROM embeddings) ea ON cand.vec_id = ea.vec_id
  JOIN (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
        FROM embeddings) eb ON cand.neighbor_id = eb.vec_id)"""

REWRITES = [(OLD, NEW), (OLD_D13, NEW_D13), (OLD_BF, NEW_BF),
            (OLD_S19, NEW_S19)]

def main(out_dir):
    p = f"{out_dir}/oracle_sql.json"
    j = json.load(open(p))
    patched = []
    matched = [False] * len(REWRITES)
    for name, sql in j.items():
        for k, (old, new) in enumerate(REWRITES):
            if old in sql:
                matched[k] = True
                sql = sql.replace(old, new)
                if name not in patched:
                    patched.append(name)
        j[name] = sql
    # A textual rewrite that matches nothing is a silent no-op that
    # leaves that oracle on the quadratic unnest join — the exact
    # straggler class this file exists to avoid (ADVICE r9). Fail loud
    # so generated-SQL drift is caught at patch time, not 500s into
    # the DuckDB run.
    unmatched = [i for i, m in enumerate(matched) if not m]
    if unmatched:
        for i in unmatched:
            head = REWRITES[i][0].splitlines()[0:2]
            print(f"UNMATCHED rewrite #{i}: {' / '.join(head)}",
                  file=sys.stderr)
        sys.exit(1)
    json.dump(j, open(p, "w"))
    print("patched:", sorted(patched))

if __name__ == "__main__":
    main(sys.argv[1])
