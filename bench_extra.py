"""Round-7 optimization harness (guide §1): per-query isolation with the
noop sink, job-description labels, and ``.explain("formatted")`` capture.

``bench.py`` is FROZEN for measurement; this file holds the extra
instrumentation the optimization round needs:

    python bench_extra.py plans [query ...]   # capture plans to plans/r07/
    python bench_extra.py time  [query ...]   # isolated noop-sink timings
    python bench_extra.py stages              # kg pipeline phase breakdown

Env contract matches bench.py ($SPARK_GRAFT_SF_DIR, $SPARK_GRAFT_CPUS).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
PLAN_DIR = os.path.join(REPO, "plans", "r07")

BENCH_QUERIES = [
    "broadcast_dim_join",
    "pair_selfjoin_capped",
    "sessionize",
    "quality_score",
    "exact_dedup",
    "ngram_jaccard_dedup",
    "minhash_neardup",
    "simhash_neardup",
    "cosine_topk",
    "ann_topk",
    "kg_sentence_counts",
]


def _spark():
    from semanticrelationextractionpolish_spark.session import get_spark

    spark = get_spark(
        app_name="semrex-bench-extra", cores=CPUS, shuffle_partitions=2 * CPUS
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def run_to_sink(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def capture_plans(names: list[str], suffix: str) -> None:
    import __spark_entry__ as entrymod

    os.makedirs(PLAN_DIR, exist_ok=True)
    spark = _spark()
    qs = entrymod.queries()
    for name in names:
        df = qs[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(PLAN_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange mentions)")


def time_queries(names: list[str], reps: int = 1) -> None:
    import __spark_entry__ as entrymod

    spark = _spark()
    qs = entrymod.queries()
    out = {}
    for name in names:
        samples = []
        for r in range(reps):
            spark.sparkContext.setJobDescription(f"{name} rep{r}")
            t0 = time.time()
            run_to_sink(qs[name](spark, SF_DIR))
            samples.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = samples
        print(json.dumps({name: samples}), flush=True)
    print(json.dumps({"metric": "isolated", "queries": out, "sf": SF_DIR}))


def kg_stage_breakdown() -> None:
    """Phase-attributed timing of the flagship kg_pipeline + kg_linking
    (mirrors bench.py's methodology, with per-stage actions)."""
    from pyspark.sql import functions as F

    from semanticrelationextractionpolish_spark.plans.pipeline import (
        build_kg,
        link_kg,
    )
    from semanticrelationextractionpolish_spark.sources.synth import synth_pages

    spark = _spark()
    sf_tag = os.path.basename(os.path.normpath(SF_DIR))
    n_pages = {"sf0.001": 500, "sf0.01": 5000, "sf0.1": 50000}.get(sf_tag, 50000)
    pages, rels = synth_pages(spark, n_pages)
    pages = pages.persist()
    rels = rels.persist()
    pages.count()
    rels.count()
    t = {}

    def clock(name, fn):
        spark.sparkContext.setJobDescription(name)
        t0 = time.time()
        r = fn()
        t[name] = round(time.time() - t0, 3)
        print(json.dumps({name: t[name]}), flush=True)
        return r

    stages = build_kg(spark, pages, rels, link=False)
    clock("sentences", lambda: run_to_sink(stages["sentences"]))
    clock("pairs", lambda: run_to_sink(stages["pairs"]))
    clock("triples_count", lambda: stages["triples"].count())
    clock("mentions", lambda: run_to_sink(stages["mentions"]))
    clock("link_canonicalize+cc", lambda: link_kg(stages))
    clock("link_nodes_sink", lambda: run_to_sink(stages["nodes"]))
    clock("link_edges_sink", lambda: run_to_sink(stages["edges"]))
    print(json.dumps({"metric": "kg_stages", "stages": t, "sf": sf_tag}))


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "time"
    rest = sys.argv[2:]
    if mode == "plans":
        suffix = "before"
        if rest and rest[0] in ("before", "after"):
            suffix, rest = rest[0], rest[1:]
        capture_plans(rest or BENCH_QUERIES, suffix)
    elif mode == "time":
        reps = 1
        if rest and rest[0].isdigit():
            reps, rest = int(rest[0]), rest[1:]
        time_queries(rest or BENCH_QUERIES, reps)
    elif mode == "stages":
        kg_stage_breakdown()
    else:
        raise SystemExit(f"unknown mode {mode}")
