"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Every query is executed to completion through the noop sink (no driver
collect, no column-pruning shortcuts), so timings reflect the full
distributed plan. The flagship metric is KG-construction throughput
(triples/sec) over the synthetic page corpus sized to the sf dir.

``bench.py --ab REF_COMMIT [--reps N]`` (round-4 verdict #8) runs the
interleaved A/B protocol the round-4 drift investigation established:
absolute BENCH JSONs from different hours carry +-10% VM window noise,
so cross-commit comparisons MUST interleave. A detached git worktree
of REF_COMMIT and the current tree run alternately (ref, head, ref,
head, ...), each rep a fresh subprocess/JVM; the summary reports
per-query and total medians plus head-vs-ref deltas in one JSON line.
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
N_PAGES = {"sf0.001": 500, "sf0.01": 5000, "sf0.1": 50000}

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


def run_to_sink(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return 0


def main():
    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from semanticrelationextractionpolish_spark.plans.pipeline import build_kg
    from semanticrelationextractionpolish_spark.session import get_spark
    from semanticrelationextractionpolish_spark.sources.synth import synth_pages

    sf_tag = os.path.basename(os.path.normpath(SF_DIR))
    spark = get_spark(
        app_name="semrex-bench", cores=CPUS, shuffle_partitions=2 * CPUS
    )
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    qs = entrymod.queries()
    for name in BENCH_QUERIES:
        t0 = time.time()
        run_to_sink(qs[name](spark, SF_DIR))
        timings[name] = round(time.time() - t0, 3)

    # flagship: full KG construction, triples/sec
    n_pages = N_PAGES.get(sf_tag, 50000)
    pages, rels = synth_pages(spark, n_pages)
    pages = pages.persist()
    rels = rels.persist()
    pages.count()
    rels.count()
    t0 = time.time()
    stages = build_kg(spark, pages, rels, link=False)
    n_triples = stages["triples"].count()
    kg_sec = time.time() - t0
    timings["kg_pipeline"] = round(kg_sec, 3)
    from semanticrelationextractionpolish_spark.plans.pipeline import link_kg

    t0 = time.time()
    link_kg(stages)
    run_to_sink(stages["nodes"])
    run_to_sink(stages["edges"])
    timings["kg_linking"] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_tag,
                "cpus": CPUS,
                "n_pages": n_pages,
                "n_triples": n_triples,
                "triples_per_sec": round(n_triples / kg_sec, 1),
            }
        )
    )


def _median(xs):
    # None-tolerant: a REF_COMMIT predating a bench output field yields
    # None entries; the A/B must degrade (report null) rather than crash
    # after all reps have been paid for (round-5 advice)
    xs = sorted(x for x in xs if x is not None)
    if not xs:
        return None
    n = len(xs)
    mid = xs[n // 2] if n % 2 else (xs[n // 2 - 1] + xs[n // 2]) / 2
    return round(mid, 3)


def run_ab(ref_commit: str, reps: int = 3) -> None:
    """Interleaved A/B: REF_COMMIT (detached worktree) vs the current
    tree, ``reps`` alternating fresh-JVM runs per arm, medians + deltas.
    Nothing else may run on the box during the measurement."""
    import shutil
    import subprocess
    import tempfile

    wt = tempfile.mkdtemp(prefix="bench_ab_ref_")
    subprocess.run(
        ["git", "-C", REPO, "worktree", "add", "--force", "--detach", wt, ref_commit],
        check=True,
        capture_output=True,
    )
    try:
        runs: dict[str, list[dict]] = {"ref": [], "head": []}
        for rep in range(reps):
            for arm, cwd in (("ref", wt), ("head", REPO)):
                out = subprocess.run(
                    [sys.executable, os.path.join(cwd, "bench.py")],
                    cwd=cwd,
                    env=dict(os.environ),
                    capture_output=True,
                    text=True,
                    check=True,
                )
                line = [
                    ln for ln in out.stdout.splitlines() if ln.startswith("{")
                ][-1]
                rec = json.loads(line)
                runs[arm].append(rec)
                print(
                    f"rep {rep} {arm}: total={rec.get('value')}s "
                    f"t/s={rec.get('triples_per_sec')}",
                    file=sys.stderr,
                )
        # .get throughout: old reference commits may predate the
        # queries/triples_per_sec fields (round-5 advice)
        common = set(runs["ref"][0].get("queries", {})) & set(
            runs["head"][0].get("queries", {})
        )
        per_query = {}
        for q in sorted(common):
            r = _median([x.get("queries", {}).get(q) for x in runs["ref"]])
            h = _median([x.get("queries", {}).get(q) for x in runs["head"]])
            per_query[q] = {
                "ref": r,
                "head": h,
                "delta_pct": round(100.0 * (h - r) / r, 1)
                if r and h is not None
                else None,
            }
        ref_total = _median([x.get("value") for x in runs["ref"]])
        head_total = _median([x.get("value") for x in runs["head"]])
        print(
            json.dumps(
                {
                    "metric": "ab_interleaved",
                    "ref_commit": ref_commit,
                    "reps": reps,
                    "unit": "sec",
                    "total_median": {
                        "ref": ref_total,
                        "head": head_total,
                        "delta_pct": round(
                            100.0 * (head_total - ref_total) / ref_total, 1
                        )
                        if ref_total and head_total is not None
                        else None,
                    },
                    "triples_per_sec_median": {
                        "ref": _median(
                            [x.get("triples_per_sec") for x in runs["ref"]]
                        ),
                        "head": _median(
                            [x.get("triples_per_sec") for x in runs["head"]]
                        ),
                    },
                    "queries": per_query,
                    "sf": runs["head"][0]["sf"],
                    "cpus": runs["head"][0]["cpus"],
                }
            )
        )
    finally:
        subprocess.run(
            ["git", "-C", REPO, "worktree", "remove", "--force", wt],
            capture_output=True,
        )
        shutil.rmtree(wt, ignore_errors=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--ab":
        ref = sys.argv[2]
        n_reps = (
            int(sys.argv[sys.argv.index("--reps") + 1])
            if "--reps" in sys.argv
            else 3
        )
        run_ab(ref, n_reps)
    else:
        main()
