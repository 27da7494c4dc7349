"""One-off diagnostic: characterize the streaming-vs-batch keeper
divergence on the 50.8k bench corpus. Hypothesis: incremental keeps a
strict SUPERSET of the combined run, and every extra keeper is a
'retroactive bridge merge' — a doc that was the min-id representative
of its component at emission time, whose component a LATER batch merged
(via a bridge doc) with a lower-id component."""
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "BENCH"))

import bench_sf1 as S  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from illumio_spark.session import build_session
from illumio_spark.operators import dedup as D

spark = build_session(app_name="diag_bridge", master="local[32]",
                      shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")

corpus = S.docs_corpus(spark, 10).localCheckpoint(eager=True)
ids = sorted(r.doc_id for r in corpus.select("doc_id").collect())
n = len(ids)
per = n // 4
bounds = [ids[i * per] for i in range(4)] + [ids[-1] + 1]

incr_kept: set = set()
bands = None
batch_of = {}
for i in range(4):
    b = corpus.filter(
        (F.col("doc_id") >= bounds[i]) & (F.col("doc_id") < bounds[i + 1])
    )
    for r in b.select("doc_id").collect():
        batch_of[r.doc_id] = i
    kept, nb = D.incremental_neardup(b, bands)
    incr_kept |= {r.doc_id for r in kept.collect()}
    bands = nb if bands is None else bands.unionByName(nb).localCheckpoint(eager=True)

comb = D.neardup_keepers(corpus, hash_fn="xxhash64")
comb_kept = {r.doc_id for r in comb.collect()}

extra = incr_kept - comb_kept
missing = comb_kept - incr_kept
print(f"incr={len(incr_kept)} comb={len(comb_kept)} "
      f"extra={len(extra)} missing={len(missing)}")
assert not missing, f"incremental DROPPED combined keepers: {sorted(missing)[:10]}"

# for each extra keeper: find its global component; assert the component's
# global min (the combined keeper) was emitted in an EARLIER-OR-SAME batch
# and that the merge edge arrived via a LATER batch member (the bridge).
pairs = D.minhash_lsh_pairs(corpus, hash_fn="xxhash64")
compdf = D.neardup_components(corpus.select("doc_id"), pairs)
comp_map = {r.doc_id: r.component for r in compdf.collect()}
from collections import defaultdict
members = defaultdict(list)
for d, c in comp_map.items():
    members[c].append(d)

ok = 0
for x in sorted(extra):
    c = comp_map[x]
    mem = sorted(members[c])
    keeper = mem[0]
    # x was kept incrementally => at x's batch time, x's then-component
    # had no smaller/seen member; the global component's min is smaller
    # => some bridge in a batch AFTER x's connected them
    assert keeper < x and keeper in incr_kept
    later = [m for m in mem if batch_of[m] > batch_of[x]]
    assert later, f"extra keeper {x}: no later-batch member in component {mem[:8]}"
    ok += 1
print(f"all {ok} extra keepers are retroactive bridge merges "
      f"(component min kept earlier, merge edge arrived in a later batch)")
comp_sizes = sorted(len(members[comp_map[x]]) for x in extra)
print("component sizes of extras:", comp_sizes[:20], "... max", comp_sizes[-1])
spark.stop()
