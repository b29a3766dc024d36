"""Dev scratch: run selected oracle SQL on DuckDB with per-query timing.

Usage: python -u scripts/dev_oracle_check.py [names...]
"""
import sys
import time

import duckdb

sys.path.insert(0, ".")
import __spark_entry__ as em  # noqa: E402

con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '/root/testdata/sf0.01/{t}.parquet'")

names = sys.argv[1:] or [
    "cc_bipartite", "pagerank_iter20_bipartite", "pagerank_ppr_iter2_bipartite",
    "symmetrize_avg_asym", "symmetrize_remove_asym", "pairwise_cosine_nations",
    "pairwise_total_nations", "affinity_bipartite", "louvain_round1_bipartite",
    "simhash_documents", "lsh_pairs_documents", "ann_lsh_top3",
]
oracles = em.oracle_sql()
for name in names:
    sql = oracles[name]
    t0 = time.time()
    try:
        df = con.sql(sql).df()
        print(f"{name}: {len(df)} rows {time.time()-t0:.1f}s", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name}: ERROR {str(e)[:300]}", flush=True)
