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

3. the sized IVF chain (s19/s20, r10) computes its cell count as a
   scalar subquery `(SELECT n_cells FROM nc)`; DuckDB cannot push a
   subquery-dependent filter into the seed scan (measured: the literal
   plan FILTERs under the unnest join, the subquery plan post-joins —
   105 GB RSS at sf1 before being killed), so the patch inlines the
   LITERAL cell count computed from the corpus COUNT(*) with the same
   cellsParamsFor formula. Requires the <sfDir> argument. The driver
   gate (sf0.01) keeps the in-SQL formula — this is local-sweep only.

Usage: python3 tools/sf1_patch_oracles.py <verifyOutDir> [<sfDir>]
"""
import json, math, sys

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

# (target queries, old, new): targets name the oracles each rewrite
# MUST hit — used to fail loud when a target is present in the dump
# but the pattern no longer matches its generated SQL (a silent no-op
# leaves that oracle on the quadratic unnest join, ADVICE r9). A
# restricted Verify dump that omits a target skips that check.
REWRITES = [
    ({"d06_embedding_cosine", "d09_multi_signal"}, OLD, NEW),
    ({"d13_semdedup"}, OLD_D13, NEW_D13),
    ({"s01_topk_bruteforce", "s09_ann_recall"}, OLD_BF, NEW_BF),
    ({"s19_knn_graph"}, OLD_S19, NEW_S19),
]

NC_REF = "(SELECT n_cells FROM nc)"
TS_REF = "(SELECT train_stride FROM ts)"
# s21's two-level chain (r11): sub-cell count + both training strides
NSX_REF = "(SELECT n_sub FROM nsx)"
TS1_REF = "(SELECT ts1 FROM ts1x)"
TS2_REF = "(SELECT ts2 FROM ts2x)"
SS1_REF = "(SELECT ss1 FROM ss1x)"

def geometry_constants(sql):
    """Parse (numCells, maxCells, targetCellSize, trainTarget) out of the
    DUMPED nc/ts CTE text instead of re-declaring them here: the dump is
    generated from Similarity.scala's sizedCellsSql, so the literals it
    carries ARE the engine's current constants — a hardcoded copy would
    silently inline stale values if cellsParamsFor/trainStrideFor ever
    change (ADVICE r10). Fails loud when the CTE shape itself drifts."""
    import re
    m_clamp = re.search(r"GREATEST\((\d+), LEAST\((\d+),", sql)
    m_tgt = re.search(r"AS DOUBLE\) / (\d+)\)", sql)
    m_train = re.search(r"// \((\d+) \*", sql)
    if not (m_clamp and m_tgt and m_train):
        print("could not parse geometry constants from the dumped nc/ts "
              "CTE — sizedCellsSql's shape drifted; update "
              "geometry_constants()", file=sys.stderr)
        sys.exit(1)
    return (int(m_clamp.group(1)), int(m_clamp.group(2)),
            int(m_tgt.group(1)), int(m_train.group(1)))

def sized_cells(n, num_cells, max_cells, target_cell_size):
    """cellsParamsFor twin over the PARSED constants:
    next-pow2(ceil(n/target)) clamped [num_cells, max_cells]."""
    target = max(1, math.ceil(n / target_cell_size))
    nc = 1 << (target - 1).bit_length()
    return max(num_cells, min(max_cells, nc))

def train_stride(n, nc, train_target):
    """trainStrideFor twin: max(1, n // (trainTarget * nCells))."""
    return max(1, n // (train_target * nc))

def main(out_dir, sf_dir=None):
    p = f"{out_dir}/oracle_sql.json"
    j = json.load(open(p))
    patched = []
    failures = []
    if any(NC_REF in s for s in j.values()):
        if sf_dir is None:
            print("sized-cell oracles present: pass <sfDir> so the "
                  "literal cell count can be computed", file=sys.stderr)
            sys.exit(1)
        import duckdb
        n = duckdb.query(
            f"SELECT COUNT(*) FROM '{sf_dir}/embeddings.parquet'"
        ).fetchone()[0]
        carrier = next(s for s in j.values() if NC_REF in s)
        num_cells, max_cells, tgt, train_tgt = geometry_constants(carrier)
        nc = sized_cells(n, num_cells, max_cells, tgt)
        ts = train_stride(n, nc, train_tgt)
        for name in list(j):
            if NC_REF in j[name]:
                j[name] = (j[name].replace(NC_REF, str(nc))
                                  .replace(TS_REF, str(ts)))
                patched.append(name)
        print(f"inlined n_cells={nc} train_stride={ts} (n={n}, constants "
              f"parsed from dump: [{num_cells},{max_cells}]/{tgt}/{train_tgt}) "
              f"into:", sorted(set(patched)))
    if any(NSX_REF in s for s in j.values()):
        if sf_dir is None:
            print("hier-sized oracles present: pass <sfDir> so the "
                  "literal sub-cell count can be computed", file=sys.stderr)
            sys.exit(1)
        import duckdb, re
        n = duckdb.query(
            f"SELECT COUNT(*) FROM '{sf_dir}/embeddings.parquet'"
        ).fetchone()[0]
        carrier = next(s for s in j.values() if NSX_REF in s)
        # parse the hier constants out of the dumped nsx/ts1x text (the
        # same no-redeclared-literals rule as geometry_constants)
        m_clamp = re.search(r"GREATEST\((\d+), LEAST\((\d+),", carrier)
        m_per = re.search(r"AS DOUBLE\) / (\d+)\)", carrier)
        m_t1 = re.search(r"// \((\d+) \* (\d+)\)", carrier)
        if not (m_clamp and m_per and m_t1):
            print("could not parse hier geometry constants from the "
                  "dumped nsx/ts1x CTEs — hierSizedSql's shape drifted",
                  file=sys.stderr)
            sys.exit(1)
        min_sub, max_sub = int(m_clamp.group(1)), int(m_clamp.group(2))
        per = int(m_per.group(1))
        train_tgt, n_super = int(m_t1.group(1)), int(m_t1.group(2))
        ns = max(min_sub, min(max_sub,
                              1 << (max(1, math.ceil(n / per)) - 1).bit_length()))
        ts1 = max(1, n // (train_tgt * n_super))
        ts2 = max(1, n // (train_tgt * n_super * ns))
        ss1 = max(1, n // n_super)
        hier_patched = []
        for name in list(j):
            if NSX_REF in j[name]:
                j[name] = (j[name].replace(NSX_REF, str(ns))
                                  .replace(TS1_REF, str(ts1))
                                  .replace(TS2_REF, str(ts2))
                                  .replace(SS1_REF, str(ss1)))
                hier_patched.append(name)
                if name not in patched:
                    patched.append(name)
        print(f"inlined n_sub={ns} ts1={ts1} ts2={ts2} ss1={ss1} (n={n}, constants "
              f"parsed from dump: [{min_sub},{max_sub}]/{per}/"
              f"{train_tgt}x{n_super}) into:", sorted(hier_patched))
    for name, sql in j.items():
        for targets, old, new in REWRITES:
            if old in sql:
                sql = sql.replace(old, new)
                if name not in patched:
                    patched.append(name)
            elif name in targets and new not in sql:
                # `new` already present = an already-patched dump (the
                # tool re-ran on its own output) — idempotent no-op, not
                # generated-SQL drift (ADVICE r10); only a dump matching
                # NEITHER form fails loud.
                failures.append(
                    f"UNMATCHED rewrite for {name}: "
                    f"{' / '.join(old.splitlines()[0:2])}")
        j[name] = sql
    if failures:
        for f in failures:
            print(f, file=sys.stderr)
        sys.exit(1)
    json.dump(j, open(p, "w"))
    print("patched:", sorted(patched))

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2] if len(sys.argv) > 2 else None)
