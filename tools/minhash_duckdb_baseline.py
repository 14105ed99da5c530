#!/usr/bin/env python
"""Independent DuckDB baseline for the `minhash_dedup` bench row.

Replays the IDENTICAL algorithm the Spark operator runs — word 3-gram
distinct shingles, a 64-function seeded-rehash MinHash signature (explode
+ 64 MIN aggregates: the classic one-shuffle formulation), 16-band × 4-row
LSH banding, banded equi-self-join candidate pairs (id_a < id_b, distinct),
signature-agreement Jaccard estimate, keep-one anti-join — as one DuckDB
query over the same parquet file. The hash family differs (DuckDB `hash`
vs Spark `xxhash64`) so survivor SETS differ slightly; the WORK (shingle
count, signature width, band-join shape, verify comps) is identical, which
is what a throughput baseline needs. Correctness of the Spark operator is
separately oracle-checked against the literal-table python model
(queries/pyoracle.py).

Prints per-run seconds and the median; paste the median into
bench.py:DLAYER_BASELINES_S["minhash_dedup"].
"""
from __future__ import annotations

import os
import statistics
import sys
import time

import duckdb

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_HASHES = 64
BANDS = 16
ROWS = NUM_HASHES // BANDS
THRESHOLD = 0.7  # bench.py minhash_dedup_q uses jaccard_threshold=0.7


def build_sql(docs_path: str | None = None) -> str:
    docs_path = docs_path or f"{SF_DIR}/documents.parquet"
    mins = ",\n         ".join(
        f"min(hash(h + {i})) as h{i}" for i in range(NUM_HASHES)
    )
    band_rows = []
    for b in range(BANDS):
        parts = " || ',' || ".join(
            f"cast(h{b * ROWS + r} as varchar)" for r in range(ROWS)
        )
        band_rows.append(f"select doc_id, {b} as band, hash({parts}) as bh from sig")
    bands_sql = "\n  union all\n  ".join(band_rows)
    agree = " + ".join(f"cast(sa.h{i} = sb.h{i} as int)" for i in range(NUM_HASHES))
    return f"""
with toks as (
  select doc_id, string_split_regex(lower(text), '\\s+') as w
  from read_parquet('{docs_path}')
),
grams as (
  select doc_id,
         list_distinct(list_transform(
           generate_series(1, greatest(len(w) - 2, 1)),
           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]
         )) as gs
  from toks
),
ex as (select doc_id, unnest(list_transform(gs, g -> hash(g))) as h from grams),
sig as (
  select doc_id,
         {mins}
  from ex group by doc_id
),
bb as (
  {bands_sql}
),
pairs as (
  select distinct a.doc_id as id_a, b.doc_id as id_b
  from bb a join bb b on a.band = b.band and a.bh = b.bh
  where a.doc_id < b.doc_id
),
est as (
  select id_a, id_b, ({agree}) / {NUM_HASHES}.0 as ej
  from pairs
  join sig sa on sa.doc_id = id_a
  join sig sb on sb.doc_id = id_b
),
losers as (select distinct id_b from est where ej >= {THRESHOLD})
select count(*)
from read_parquet('{docs_path}') d
anti join losers l on d.doc_id = l.id_b
"""


def main() -> None:
    con = duckdb.connect()
    con.execute(f"SET threads = {os.environ.get('SPARK_GRAFT_CPUS', '32')}")
    sql = build_sql()
    times = []
    survivors = None
    for i in range(5):
        t0 = time.perf_counter()
        survivors = con.execute(sql).fetchone()[0]
        dt = time.perf_counter() - t0
        times.append(dt)
        print(f"run {i}: {dt:.3f}s  survivors={survivors}", file=sys.stderr)
    print(
        f"median {statistics.median(times):.3f}s over {SF_DIR} "
        f"(survivors={survivors})"
    )


if __name__ == "__main__":
    main()
