"""Measure shuffle read/write bytes per query via the Spark UI REST API.

Usage: python tools/measure_shuffle.py [query ...]
Runs each named ``__spark_entry__.queries()`` entry (default: the LSH
family) at $SPARK_GRAFT_SF_DIR to the noop sink with the UI enabled, then
sums stage-level shuffleReadBytes/shuffleWriteBytes for the stages each
query submitted. Prints one JSON line. Used to document plan-level
shuffle-volume changes (e.g. skinny LSH band rows) in PLANS.md.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
UI_PORT = int(os.environ.get("SPARK_GRAFT_UI_PORT", "4055"))
DEFAULT_QUERIES = ["minhash_neardup", "ngram_jaccard_dedup", "simhash_neardup"]


def _get(path: str):
    with urllib.request.urlopen(f"http://localhost:{UI_PORT}/api/v1{path}", timeout=10) as r:
        return json.loads(r.read())


def stage_metrics(app_id: str) -> dict[int, dict]:
    out = {}
    for st in _get(f"/applications/{app_id}/stages?status=complete"):
        # attempts of the same stage id: keep the latest
        out[st["stageId"]] = {
            "shuffle_read": st.get("shuffleReadBytes", 0),
            "shuffle_write": st.get("shuffleWriteBytes", 0),
            "input": st.get("inputBytes", 0),
        }
    return out


def main():
    from semanticrelationextractionpolish_spark.session import get_spark

    import __spark_entry__ as entrymod

    names = sys.argv[1:] or DEFAULT_QUERIES
    spark = get_spark(
        app_name="semrex-shuffle-measure",
        cores=CPUS,
        shuffle_partitions=2 * CPUS,
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": str(UI_PORT)},
    )
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId
    qs = entrymod.queries()
    results = {}
    for name in names:
        before = stage_metrics(app_id)
        t0 = time.time()
        qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        sec = round(time.time() - t0, 3)
        time.sleep(1.0)  # let the UI ingest the final stage events
        after = stage_metrics(app_id)
        new = {sid: m for sid, m in after.items() if sid not in before}
        results[name] = {
            "sec": sec,
            "n_stages": len(new),
            "shuffle_read_mb": round(sum(m["shuffle_read"] for m in new.values()) / 2**20, 2),
            "shuffle_write_mb": round(sum(m["shuffle_write"] for m in new.values()) / 2**20, 2),
            "input_mb": round(sum(m["input"] for m in new.values()) / 2**20, 2),
        }
    print(json.dumps({"sf_dir": SF_DIR, "cpus": CPUS, "queries": results}))


if __name__ == "__main__":
    main()
