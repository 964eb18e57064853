"""Profile the CDC apply at a given core count in an isolated process.

Usage: python scripts/profile_apply.py CORES EVENTS_DIR N_EVENTS [REPEATS]
Prints one JSON line per repeat with stage timings; JIT warmup = repeat 0.
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from openlogreplicator_spark.session import build_session  # noqa: E402
from openlogreplicator_spark.streaming.pipeline import CdcPipeline  # noqa: E402


def main():
    cores = int(sys.argv[1])
    events_dir = sys.argv[2]
    n_events = int(sys.argv[3])
    repeats = int(sys.argv[4]) if len(sys.argv) > 4 else 2

    spark = build_session(app_name=f"profile-{cores}", cores=cores,
                          shuffle_partitions=4 * cores)
    for i in range(repeats):
        work = tempfile.mkdtemp(prefix=f"olr_prof_{cores}_")
        p = CdcPipeline(spark, events_dir, os.path.join(work, "t"),
                        os.path.join(work, "c"), n_buckets=32)
        t0 = time.time()
        p.run_batch_replay()
        secs = time.time() - t0
        print(json.dumps({
            "cores": cores, "repeat": i, "secs": round(secs, 3),
            "events_per_sec": round(n_events / secs, 1),
        }), flush=True)
        shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
