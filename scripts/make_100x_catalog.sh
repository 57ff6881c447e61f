#!/bin/sh
# Assemble the COMPLETE 100x catalog (/tmp/graft_sf10) from the three
# per-axis ScaleFixture outputs, by symlink — zero copy, and each axis
# keeps its own generator semantics (SCALING.md "Full-suite 100x
# point"). Regenerate any missing piece first:
#   sbt "runMain graft.ScaleFixture /root/testdata/sf0.1 /tmp/graft_rel100   100 relational"
#   sbt "runMain graft.ScaleFixture /root/testdata/sf0.1 /tmp/graft_sf100_ed 100 events,documents"
#   sbt "runMain graft.ScaleFixture /root/testdata/sf0.1 /tmp/graft_emb100   100 embeddings"
# Then run the suite (quadratics excluded BY CONTRACT and stamped):
#   SPARK_GRAFT_SF_DIR=/tmp/graft_sf10 SPARK_GRAFT_CPUS=32 \
#   SPARK_GRAFT_BENCH_EXCLUDE=ann_ivf,dedup_embed,similarity_knn,similarity_topk_per_query \
#   SPARK_GRAFT_BENCH_FULL=/root/repo/BENCH_SUITE100X_rN.json \
#   SPARK_DRIVER_MEM=16g sbt "runMain graft.Bench"
set -e
dst=${1:-/tmp/graft_sf10}
mkdir -p "$dst"
for t in region nation customer supplier part orders lineitem; do
  ln -sfn /tmp/graft_rel100/$t.parquet "$dst/$t.parquet"
done
ln -sfn /tmp/graft_sf100_ed/events.parquet    "$dst/events.parquet"
ln -sfn /tmp/graft_sf100_ed/documents.parquet "$dst/documents.parquet"
ln -sfn /tmp/graft_emb100/embeddings.parquet  "$dst/embeddings.parquet"
for t in region nation customer supplier part orders lineitem events documents embeddings; do
  [ -e "$dst/$t.parquet" ] || { echo "MISSING axis fixture for $t" >&2; exit 1; }
done
echo "catalog assembled at $dst"
