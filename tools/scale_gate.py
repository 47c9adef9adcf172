"""One-command scale gate (round-5 verdict #7): folds the round's scale
evidence — extraction N->4N efficiency, dedup/linking-family N->4N
efficiency, ANN recall at scale, stream-state flatness, assignment
bucket rewrite cost — into a single JSON artifact, so later rounds can
regression-check scale claims the way ``bench.py --ab`` checks perf.

Sections (all reuse the existing campaign/probe tooling and protocols):

1. extraction   - paired local-cluster[1,2] vs [4,2] runs of
                  tools/scaling_job.py (run_scaling.sh protocol);
2. dedup_family - paired runs of tools/scaling_dedup_job.py
                  (run_scaling_dedup.sh protocol: minhash / simhash /
                  ngram / link stage efficiencies);
3. ann          - tools/ann_scale_probe.py recall@5 for the default
                  LSH multi-probe point and the IVF cells;
4. state        - tools/probe_state_compaction.py tail/head batch-time
                  ratio + repeat-phase bucket rewrites;
5. assign       - tools/probe_assign_buckets.py rewrite bytes vs table
                  size;
6. shuffle_floor- tools/shuffle_bandwidth_job.py paired N vs 4N: the
                  pure-shuffle efficiency ceiling on THIS host at the
                  dedup family's band volume (no operator logic at
                  all). The dedup check uses it: minhash/simhash pass
                  at >= 0.75 outright OR at/above this floor (the
                  BENCH/BASELINE.md round-6 analysis — sub-0.75 there
                  is per-job fixed-overhead dilution, host- not
                  plan-attributed; link and ngram must clear 0.75
                  unconditionally);
7. stream       - tools/scaling_stream_job.py at 4N with --check:
                  streamed nodes+edges == batch build_kg exactly, and
                  per-batch time stays flat (tail3/head3).

``--quick`` shrinks sizes/reps for a ~10-minute regression signal; the
full mode reproduces the BENCH/BASELINE.md campaign parameters (hours —
prefer the dedicated shell campaigns for headline numbers; full mode
exists so the gate and the campaigns cannot drift apart).

NOTHING else may run on the VM during a gate run (shared-box protocol,
see tools/run_scaling.sh).

Usage: python tools/scale_gate.py [--quick] [--out FILE] [--skip sec1,sec2]
Writes FILE (default /tmp/scale_gate.json) and prints the JSON line.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

BARS = {
    # the north rule's two-cluster-size criterion, evidenced N vs 4N
    "extraction_eff": 0.8,
    "dedup_eff": 0.75,  # round-6 target for the shuffling family
    "ann_recall": 0.95,
    "state_tail_over_head": 1.5,
    "assign_rewrite_fraction": 0.25,
}


def _zip_pkg() -> str:
    zpath = "/tmp/semrex_gate.zip"
    subprocess.run(
        ["zip", "-qr", zpath, "semanticrelationextractionpolish_spark"],
        cwd=REPO,
        check=True,
    )
    return zpath


def _last_json(stdout: str) -> dict:
    for line in reversed(stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise ValueError(f"no JSON line in output: {stdout[-500:]!r}")


def _submit(zpath: str, n_exec: int, shuf: int, script: str, *args: str) -> dict:
    cmd = [
        "spark-submit",
        "--master",
        f"local-cluster[{n_exec},2,8192]",
        "--conf",
        f"spark.sql.shuffle.partitions={shuf}",
        "--conf",
        "spark.local.dir=/dev/shm/spark-local",
        "--driver-memory",
        "8g",
        "--conf",
        "spark.executor.memory=7g",
        "--conf",
        "spark.executor.extraJavaOptions=-XX:ParallelGCThreads=4 "
        "-XX:ConcGCThreads=1 -XX:+UseG1GC",
        "--conf",
        "spark.sql.execution.arrow.maxRecordsPerBatch=20000",
        "--conf",
        "spark.ui.enabled=false",
        "--py-files",
        zpath,
        os.path.join(REPO, script),
        *args,
    ]
    r = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO)
    if r.returncode != 0:
        raise RuntimeError(f"{script} failed: {r.stderr[-800:]}")
    return _last_json(r.stdout)


def _python(script: str, *args: str, env: dict | None = None) -> dict:
    e = dict(os.environ)
    if env:
        e.update(env)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, script), *args],
        capture_output=True,
        text=True,
        cwd=REPO,
        env=e,
    )
    if r.returncode != 0:
        raise RuntimeError(f"{script} failed: {r.stderr[-800:]}")
    return _last_json(r.stdout)


def section_extraction(zpath: str, quick: bool) -> dict:
    pages = "300000" if quick else "1000000"
    pairs = 1 if quick else 4
    effs = []
    for _ in range(pairs):
        a = _submit(zpath, 1, 8, "tools/scaling_job.py", pages, "cache-nolink")
        b = _submit(zpath, 4, 32, "tools/scaling_job.py", pages, "cache-nolink")
        effs.append(round(a["extract_sec"] / (4 * b["extract_sec"]), 3))
    return {
        "pages": int(pages),
        "pair_efficiencies": effs,
        "median": round(statistics.median(effs), 3),
        "n4_triples_per_sec": b["triples_per_sec"],
    }


def section_dedup(zpath: str, quick: bool) -> dict:
    docs = "300000" if quick else "1000000"
    pairs = 1 if quick else 4
    stages = ["minhash_sec", "simhash_sec", "ngram_sec", "link_sec", "total_sec"]
    per_stage: dict[str, list[float]] = {s: [] for s in stages}
    counts_equal = True
    for _ in range(pairs):
        a = _submit(zpath, 1, 8, "tools/scaling_dedup_job.py", docs)
        b = _submit(zpath, 4, 32, "tools/scaling_dedup_job.py", docs)
        for s in stages:
            per_stage[s].append(round(a[s] / (4 * b[s]), 3))
        for k in ("minhash_pairs", "simhash_pairs", "ngram_pairs", "n_lemmas"):
            counts_equal &= a[k] == b[k]
    return {
        "docs": int(docs),
        "pair_efficiencies": per_stage,
        "medians": {
            s.replace("_sec", ""): round(statistics.median(v), 3)
            for s, v in per_stage.items()
        },
        "result_counts_equal_across_arms": counts_equal,
    }


def section_ann(quick: bool) -> dict:
    n = "200000" if quick else "1000000"
    res = _python("tools/ann_scale_probe.py", env={"ANN_SCALE_N": n})
    default = next(
        (r for r in res["lsh"] if r.get("is_default")),
        max(res["lsh"], key=lambda r: r["n_probe"]),
    )
    return {
        "n_vectors": res.get("n_vectors", int(n)),
        "lsh_default": default,
        "lsh_default_recall": default["recall"],
        "ivf_min_recall": min(r["recall"] for r in res["ivf"]) if res["ivf"] else None,
    }


def section_state(quick: bool) -> dict:
    args = ("12", "300") if quick else ("50", "300")
    res = _python("tools/probe_state_compaction.py", *args)
    return {
        "n_batches": res["n_batches"],
        "tail_over_head": res["tail_over_head"],
        "max_segments_per_table": res["max_segments_per_table"],
        "repeat_phase_bucket_rewrites": res.get(
            "assign_buckets_rewritten_repeat_phase"
        ),
    }


def section_shuffle_floor(zpath: str, quick: bool) -> dict:
    rows = "8000000"  # the dedup stages' band-row volume
    a = _submit(zpath, 1, 8, "tools/shuffle_bandwidth_job.py", rows)
    b = _submit(zpath, 4, 32, "tools/shuffle_bandwidth_job.py", rows)
    return {
        "n_rows": int(rows),
        "n_sec": a["shuffle_sec"],
        "n4_sec": b["shuffle_sec"],
        "efficiency": round(a["shuffle_sec"] / (4 * b["shuffle_sec"]), 3),
    }


def section_stream(zpath: str, quick: bool) -> dict:
    pages = "100000" if quick else "500000"
    batches = "5" if quick else "20"
    res = _submit(
        zpath, 4, 32, "tools/scaling_stream_job.py", pages, batches, "--check"
    )
    return {
        "n_pages": res["n_pages"],
        "n_batches": res["n_batches"],
        "pages_per_sec": res["pages_per_sec"],
        "batch_tail_over_head": res["batch_tail_over_head"],
        "state_mb": res["state_mb"],
        "stream_equals_batch": res["check"]["equal"],
    }


def section_assign(quick: bool) -> dict:
    sizes = "1000000" if quick else "1000000,10000000"
    # 8 changed keys = the bounded-changeset case the 0.25 bar is about
    # (touched buckets ~ changed keys); the default 10k-key set touches
    # ALL buckets by construction (changed >> buckets -> full rewrite,
    # the documented cap), which would fail the bar at every scale
    res = _python("tools/probe_assign_buckets.py", sizes, "8")
    return {
        "results": res["results"],
        "max_rewrite_fraction": max(
            r["rewrite_fraction"] for r in res["results"]
        ),
        "empty_changeset_zero": all(
            r["empty_changeset_rewrites_zero"] for r in res["results"]
        ),
    }


def main():
    quick = "--quick" in sys.argv
    out = "/tmp/scale_gate.json"
    if "--out" in sys.argv:
        out = sys.argv[sys.argv.index("--out") + 1]
    skip = set()
    if "--skip" in sys.argv:
        skip = set(sys.argv[sys.argv.index("--skip") + 1].split(","))
    os.makedirs("/dev/shm/spark-local", exist_ok=True)
    zpath = _zip_pkg()
    t0 = time.time()
    gate: dict = {"metric": "scale_gate", "quick": quick, "sections": {}}
    runner = {
        "extraction": lambda: section_extraction(zpath, quick),
        "dedup_family": lambda: section_dedup(zpath, quick),
        "ann": lambda: section_ann(quick),
        "state": lambda: section_state(quick),
        "assign": lambda: section_assign(quick),
        "shuffle_floor": lambda: section_shuffle_floor(zpath, quick),
        "stream": lambda: section_stream(zpath, quick),
    }
    for name, fn in runner.items():
        if name in skip:
            gate["sections"][name] = {"skipped": True}
            continue
        t = time.time()
        try:
            gate["sections"][name] = fn()
        except Exception as e:  # record, keep gating the rest
            gate["sections"][name] = {"error": str(e)[:500]}
        gate["sections"][name]["sec"] = round(time.time() - t, 1)
        print(f"[scale_gate] {name}: {gate['sections'][name]}", file=sys.stderr)

    s = gate["sections"]
    checks = {}
    # Efficiency bars are asserted in FULL mode only: quick mode runs
    # 300k-row volumes where the measured per-job fixed-overhead floor
    # (see shuffle_floor + BENCH round-6 control) dilutes every
    # efficiency below its campaign value by construction. Quick mode
    # still MEASURES them (recorded under `informational`) and asserts
    # the volume-independent invariants (recall, flatness, equality).
    informational = {}
    eff_checks = informational if quick else checks
    if "median" in s.get("extraction", {}):
        eff_checks["extraction_eff_ge_0.8"] = s["extraction"]["median"] >= BARS["extraction_eff"]
    if "medians" in s.get("dedup_family", {}):
        m = s["dedup_family"]["medians"]
        # link + ngram amortize the host's per-job overhead at campaign
        # volume and must clear the bar outright; minhash/simhash may
        # instead sit at/above the measured pure-shuffle floor (their
        # sub-bar medians are fixed-overhead dilution — see the round-6
        # shuffle-bandwidth control in BENCH/BASELINE.md)
        floor = s.get("shuffle_floor", {}).get("efficiency") or 0.0
        eff_checks["dedup_link_ngram_ge_bar"] = all(
            m[k] >= BARS["dedup_eff"] for k in ("ngram", "link")
        )
        eff_checks["dedup_mh_sh_ge_bar_or_host_floor"] = all(
            m[k] >= BARS["dedup_eff"] or m[k] >= floor
            for k in ("minhash", "simhash")
        )
        checks["dedup_counts_equal_across_arms"] = s["dedup_family"][
            "result_counts_equal_across_arms"
        ]
    if "lsh_default_recall" in s.get("ann", {}):
        checks["ann_default_recall_ge_0.95"] = (
            s["ann"]["lsh_default_recall"] >= BARS["ann_recall"]
        )
    if "tail_over_head" in s.get("state", {}):
        checks["state_flat"] = s["state"]["tail_over_head"] <= BARS["state_tail_over_head"]
        rw = s["state"]["repeat_phase_bucket_rewrites"]
        # the probe reports one count per repeat-phase batch (a list);
        # older versions reported a scalar or omitted it
        checks["repeat_rewrites_zero"] = (
            all(x in (0, 0.0) for x in rw) if isinstance(rw, list) else rw in (0, 0.0, None)
        )
    if "stream_equals_batch" in s.get("stream", {}):
        checks["stream_equals_batch"] = s["stream"]["stream_equals_batch"]
        checks["stream_batch_time_flat"] = (
            s["stream"]["batch_tail_over_head"] or 99.0
        ) <= BARS["state_tail_over_head"]
    if "max_rewrite_fraction" in s.get("assign", {}):
        checks["assign_rewrite_bounded"] = (
            s["assign"]["max_rewrite_fraction"] <= BARS["assign_rewrite_fraction"]
            and s["assign"]["empty_changeset_zero"]
        )
    gate["checks"] = checks
    if informational:
        gate["informational"] = informational
    gate["pass"] = all(checks.values()) if checks else False
    gate["total_sec"] = round(time.time() - t0, 1)
    with open(out, "w") as f:
        json.dump(gate, f, indent=1)
    print(json.dumps(gate))


if __name__ == "__main__":
    main()
