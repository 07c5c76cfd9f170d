#!/bin/bash
# Table replication by tailing the change-data-feed: the mirror equals
# the source after the first sync, and a second sync ships ONLY the new
# commits (incremental, not a re-copy).
source "$(dirname "$0")/../_common.sh"

python - <<'EOF'
from tinyetl_spark import datagen
from tinyetl_spark.lake import LakeTable, merge_apply
from tinyetl_spark.schema import PAGES_SCHEMA
from tinyetl_spark.session import get_spark

spark = get_spark(cores=4)
spark.sparkContext.setLogLevel("ERROR")
t = LakeTable.create(spark, "src/pages", PAGES_SCHEMA, key_col="url",
                     num_buckets=8)
ev = datagen.change_events(spark, 3000, 400, seed=5)
merge_apply(t, ev.filter("event_seq % 2 = 0"), 0)
merge_apply(t, ev.filter("event_seq % 2 = 1"), 1)
ev.write.mode("overwrite").parquet("all_events")
EOF

etl replicate src/pages dst/pages --checkpoint ckpt | tee rep1.log

python - <<'EOF'
from tinyetl_spark.lake import LakeTable
from tinyetl_spark.session import get_spark

spark = get_spark(cores=4)
spark.sparkContext.setLogLevel("ERROR")
s = LakeTable(spark, "src/pages").read()
d = LakeTable(spark, "dst/pages").read()
assert s.exceptAll(d).count() == 0 and d.exceptAll(s).count() == 0
print("mirror equal:", d.count(), "rows")
EOF

# one more commit on the source; the second sync is incremental
python - <<'EOF'
import pyspark.sql.functions as F
from tinyetl_spark.lake import LakeTable, merge_apply
from tinyetl_spark.session import get_spark

spark = get_spark(cores=4)
spark.sparkContext.setLogLevel("ERROR")
t = LakeTable(spark, "src/pages")
ev = (spark.read.parquet("all_events").limit(200)
      .withColumn("event_seq", F.col("event_seq") + 2_000_000))
merge_apply(t, ev, 2)
EOF

etl replicate src/pages dst/pages --checkpoint ckpt | tee rep2.log

python - <<'EOF'
from tinyetl_spark.lake import LakeTable
from tinyetl_spark.session import get_spark

spark = get_spark(cores=4)
spark.sparkContext.setLogLevel("ERROR")
s = LakeTable(spark, "src/pages").read()
d = LakeTable(spark, "dst/pages").read()
assert s.exceptAll(d).count() == 0 and d.exceptAll(s).count() == 0
print("incremental sync converged:", d.count(), "rows")
EOF
echo "=== 07_replication PASSED ==="
