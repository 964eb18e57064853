"""Stage-isolated profiling: python scripts/profile_stages.py CORES EVENTS_DIR"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from openlogreplicator_spark.operators.decode import EVENTS_DDL, dml_events  # noqa: E402
from openlogreplicator_spark.operators.lww import (  # noqa: E402
    lww_compact,
    lww_compact_semijoin,
)
from openlogreplicator_spark.session import build_session  # noqa: E402

cores = int(sys.argv[1])
events_dir = sys.argv[2]
spark = build_session(cores=cores, shuffle_partitions=4 * cores)

t = {}
for repeat in range(2):
    df = spark.read.schema(EVENTS_DDL).parquet(events_dir)
    t0 = time.time(); df.count(); t["scan_count"] = round(time.time() - t0, 2)
    t0 = time.time()
    df.select(F.sum(F.length("text")), F.sum("seq")).collect()
    t["scan_project"] = round(time.time() - t0, 2)
    dml = dml_events(df).withColumnRenamed("seq", "_seq")
    t0 = time.time()
    dml.groupBy("url").agg(F.max(F.struct("warc_ts", "_seq"))).count()
    t["narrow_agg"] = round(time.time() - t0, 2)
    t0 = time.time()
    lww_compact_semijoin(dml, "url").count()
    t["semijoin_lww"] = round(time.time() - t0, 2)
    t0 = time.time()
    lww_compact(dml, "url").count()
    t["maxby_lww"] = round(time.time() - t0, 2)
    t0 = time.time()
    dml.repartition(32, F.pmod(F.xxhash64("url"), F.lit(32))).write.mode(
        "overwrite"
    ).parquet(f"/tmp/olr_prof_out_{cores}")
    t["shuffle_write"] = round(time.time() - t0, 2)
    print(json.dumps({"cores": cores, "repeat": repeat, **t}), flush=True)
spark.stop()
