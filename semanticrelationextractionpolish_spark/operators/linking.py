"""Entity linking & canonicalization: lemma keys, MinHash-LSH blocking,
connected components.

Target-only stage (BASELINE.json north rule; the reference stops at
per-sentence triples). Everything is DataFrame algebra - the MinHash
signatures are built with JVM-side ``hash``/``transform``/``array_min``
higher-order functions (no Python, no pyspark.ml Vector boxing), so the
blocking stage is a pure whole-stage-codegen map followed by one shuffle
on band keys.

Scale design:

* LSH blocking turns the O(n^2) surface-similarity self-join into a
  band-bucket equi-join (J7 in SURVEY.md); band buckets are capped
  (``MAX_BUCKET``) so a degenerate hot bucket cannot blow up the join -
  the same skew-guard philosophy as the reference's pair caps.
* Band rows are SKINNY - ``(key, band_idx, band_hash)`` only. The
  round-2 plan carried each doc's full shingle array through the 8-way
  band explode, the bucket-cap join, and both sides of the candidate
  self-join (~8x of array payload in the pipeline's biggest shuffles at
  scale); candidates now join back to the one-row-per-key shingle table
  for Jaccard verification - same result set by construction, since
  verification inputs are per-key, not per-band.
* Connected components is alternating large-star/small-star contraction
  (Kiveris et al., "Connected Components in MapReduce and Beyond",
  SOCC'14): O(log n) rounds regardless of component diameter. The
  round-2 min-label propagation needed O(diameter) rounds, so a
  transitive near-dup chain longer than ``max_iter`` hops exited the
  loop with silently-split components; non-convergence now fails loudly.
* Lineage barriers go through ``materialize.barrier``: localCheckpoint
  by default, durable _SUCCESS-gated parquet stage checkpoints when
  ``spark.semrex.checkpointDir`` is set (executor-loss-survivable /
  kill-resumable - the production mode).
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .materialize import barrier

log = logging.getLogger(__name__)

N_HASHES = 16
N_BANDS = 8  # 2 rows per band: P(collide) ~= 1-(1-s^2)^8, >0.94 at s=0.55
SHINGLE = 3
MAX_BUCKET = 64  # skew guard on a single LSH bucket
DEFAULT_JACCARD = 0.42
# signature-agreement pre-gate on banded candidates (round-6): a pair
# that banded together has >= 2 of its 16 minhashes equal by
# construction; requiring MIN_SIG_AGREE total equal positions filters
# ACCIDENTAL collisions before they reach any shuffle or the shingle
# verification join. Derivation at the DEFAULT_JACCARD = 0.42 operating
# point: a true boundary pair's 14 unforced positions are ~Bin(14,
# 0.42), so P(total < 4) ~= 0.005 - a 0.5% additional miss rate at the
# exact threshold, vs the band S-curve's own 21% there; an accidental
# pair over a SMALL shingle universe (hex ids: expected cross-lemma
# jaccard ~0.004) has E[total] ~= 2.06, so the gate removes ~99.8% of
# them. Measured on the 1M-lemma campaign shape: 48M candidates -> the
# ~100k true pair set, verify stage 208 s -> seconds. The gate keeps
# lsh_candidate_pairs' contract (probabilistic recall - it already
# misses pairs that never band together); stream and batch apply the
# SAME predicate so stream==batch equality is preserved.
MIN_SIG_AGREE = 4

# key universes at or below this size skip the LSH verification
# reduction stages (candidate barrier + key semi-join + verify-table
# barrier): at small scale those are two extra materialization jobs
# protecting against re-scans that cost less than the jobs themselves,
# while above the cap the round-6 reduction shape is exactly right.
# The count is free - it rides the signature-table materialization as
# an Observation (materialize.barrier_with_count).
SMALL_SIG_TABLE_KEYS = 200_000


def sig_agreement(sigs_a, sigs_b):
    """Number of equal positions between two minhash signature arrays."""
    return F.size(
        F.filter(F.zip_with(sigs_a, sigs_b, lambda x, y: x == y), lambda eq: eq)
    )


def _shingles(col):
    """Distinct character 3-grams, via sequence+transform (JVM-side)."""
    padded = F.concat(F.lit("^"), col, F.lit("$"))
    n = F.greatest(F.length(padded) - (SHINGLE - 1), F.lit(1))
    return F.array_distinct(
        F.transform(F.sequence(F.lit(1), n), lambda i: padded.substr(i, F.lit(SHINGLE)))
    )


def _bands_expr():
    """Per-key band-key array: hash of each band's signature slice."""
    rows_per_band = N_HASHES // N_BANDS
    return F.transform(
        F.sequence(F.lit(0), F.lit(N_BANDS - 1)),
        lambda b: F.hash(
            b, F.slice(F.col("sigs"), b * rows_per_band + 1, rows_per_band)
        ),
    )


def shingle_table(
    df: DataFrame,
    key: str = "lemma",
    ckpt_name: str | None = None,
    assume_distinct: bool = False,
    with_bands: bool = False,
) -> DataFrame:
    """One row per key: (key, shingles, sigs) - the MinHash signature
    table. Materialized (barrier) because it feeds both the band explode
    and the verification join-back, and because Generate would otherwise
    re-evaluate the 16 array_min signature scans per exploded band (8x).
    Callers invoking this repeatedly on DIFFERENT inputs in one job
    (e.g. streaming incremental linking) must pass a distinct
    ``ckpt_name`` per call, or durable-checkpoint mode would resume the
    first call's table.

    ``assume_distinct``: skip the defensive ``distinct()``. Both
    production call sites (``canonicalize``'s lemma groupBy, streaming's
    per-batch new-lemma anti-join) feed inputs that are ALREADY unique
    per key, but a persist/cache boundary between them and this plan
    hides that from Catalyst's RemoveRedundantAggregates rule - the
    defensive distinct then costs a real full shuffle of the lemma set
    (round-6 verdict #1, persist audit)."""
    return barrier(
        _shingle_plan(df, key, assume_distinct, with_bands),
        ckpt_name or f"lsh_sigs_{key}",
    )


def _shingle_plan(
    df: DataFrame, key: str, assume_distinct: bool, with_bands: bool
) -> DataFrame:
    """The un-barriered shingle/signature plan behind ``shingle_table``
    (callers that need the materialization's row count ride it with
    ``materialize.barrier_with_count``)."""
    keyed = df.select(key) if assume_distinct else df.select(key).distinct()
    with_sh = keyed.withColumn("shingles", _shingles(F.col(key)))
    # one nested-HOF expression for all N_HASHES signatures (instead of N
    # separate aggregate columns): an order of magnitude less codegen for
    # the driver to compile, same result. NB: HOF lambdas must be
    # single-arg - a second parameter would be bound to the element index.
    sigs = F.transform(
        F.sequence(F.lit(0), F.lit(N_HASHES - 1)),
        lambda i: F.array_min(
            F.transform(F.col("shingles"), lambda s: F.hash(s, i))
        ),
    )
    out = with_sh.withColumn("sigs", sigs)
    if with_bands:
        # band keys as a per-key 8-element array INSIDE the same
        # materialization: callers then posexplode the checkpointed
        # array instead of barriering the exploded rows separately -
        # one materialization job and one executor-storage copy fewer
        # per LSH invocation (round-7)
        out = out.withColumn("bands", _bands_expr())
    return out


def add_minhash_bands(df: DataFrame, key: str = "lemma") -> DataFrame:
    """Skinny band rows: one (key, band_idx, band_hash) per band.

    Shingles/signatures stay in ``shingle_table`` - join back on ``key``
    when verification needs them (round-2 verdict: carrying the shingle
    array through the band explode multiplied the biggest shuffle's
    payload ~8x)."""
    return _band_rows(shingle_table(df, key), key)


def _band_rows(
    sig_table: DataFrame, key: str, keep: tuple[str, ...] = ()
) -> DataFrame:
    """Band rows (key, band_idx, band_hash) - skinny by default; ``keep``
    names extra sig-table columns to carry (e.g. ``("sigs",)`` when the
    in-bucket pair explode applies the signature-agreement gate).

    When ``sig_table`` already carries a materialized ``bands`` array
    (``shingle_table(with_bands=True)``), the explode reads it straight
    from the checkpoint; otherwise the band keys are computed inline."""
    bands = F.col("bands") if "bands" in sig_table.columns else _bands_expr()
    return sig_table.select(
        key, *keep, F.posexplode(bands).alias("band_idx", "band_hash")
    )


def capped_bucket_pairs(
    banded: DataFrame,
    bucket_cols: list[str],
    member: "F.Column",
    less_than,
    max_bucket: int,
    guard: str = "prefilter",
    pair_pred=None,
) -> DataFrame:
    """ONE-shuffle capped in-bucket pair generation: (bucket..., member)
    rows -> distinct ordered pairs (a, b) of members sharing a bucket,
    buckets larger than ``max_bucket`` dropped entirely.

    The round-5 shape (groupBy bucket sizes -> guard join -> band
    self-join) shuffled the band rows three times per action; this is
    the round-6 replacement (verdict #1) and shuffles them ONCE:

    * a window ``count(*) OVER (PARTITION BY bucket)`` filters hot
      buckets using exact pre-filter sizes WITHOUT ever materializing a
      hot bucket's member list (a degenerate bucket at web scale can
      hold millions of members - collect_list-then-filter would OOM a
      task; the window only carries a count);
    * the subsequent ``groupBy(bucket).collect_list`` reuses the
      window's hash partitioning (required distribution already
      satisfied -> Catalyst inserts NO second Exchange - verified in
      the executed plan);
    * pairs come from a nested-transform cross of the <= ``max_bucket``
      member array (<= max_bucket^2 structs per bucket, bounded by the
      cap) instead of a band self-join - the join and both of its
      exchanges disappear.

    ``member`` may be any expression (string key, or a struct carrying
    a payload such as the simhash fingerprint); ``less_than(a, b)``
    orders the pair. Output columns: ``a``, ``b`` (member type),
    deduplicated across buckets.

    ``guard`` picks how over-cap buckets are dropped:

    * ``"prefilter"`` (default, skew-robust): bucket sizes via a
      map-side-combined count agg (skinny shuffle), then the OVER-cap
      keys - at most ``n_rows / max_bucket`` of them by pigeonhole, so
      the table is always small relative to the input - anti-join the
      band rows (AQE picks broadcast when small, the common case). Hot
      rows never enter the fat shuffle, so a degenerate bucket cannot
      straggle the collect_list partition. This matters exactly when
      the cap matters: the round-6 pair-1 campaign measured the window
      variant regressing the skewed lemma-LSH stage ~50% at 4N while
      improving the uniform doc-hash stages.
    * ``"window"``: count(*) OVER (bucket) + filter - one fat shuffle
      total, no second agg, but the window's per-partition sort
      processes hot buckets BEFORE the filter drops them (single-task
      straggler under skew). Right for inputs known to be near-uniform.

    ``pair_pred(a, b)``: optional extra predicate applied INSIDE the
    pair explode (e.g. the signature-agreement gate) - pairs failing it
    never reach the dedup shuffle or any verification join.
    """
    m = F.col("members")
    pred = (
        (lambda a, b: less_than(a, b) & pair_pred(a, b))
        if pair_pred is not None
        else less_than
    )
    pairs_expr = F.filter(
        F.flatten(
            F.transform(
                m, lambda x: F.transform(m, lambda y: F.struct(x.alias("a"), y.alias("b")))
            )
        ),
        lambda p: pred(p["a"], p["b"]),
    )
    if guard == "window":
        from pyspark.sql import Window

        w = Window.partitionBy(*bucket_cols)
        capped = (
            banded.withColumn("bsz", F.count(F.lit(1)).over(w))
            .where(F.col("bsz") <= max_bucket)
            .drop("bsz")
        )
    else:
        hot = (
            banded.groupBy(*bucket_cols)
            .agg(F.count(F.lit(1)).alias("bsz"))
            .where(F.col("bsz") > max_bucket)
            .drop("bsz")
        )
        capped = banded.join(hot, bucket_cols, "left_anti")
    return (
        capped.groupBy(*bucket_cols)
        .agg(F.collect_list(member).alias("members"))
        .select(F.explode(pairs_expr).alias("p"))
        .select("p.a", "p.b")
        .dropDuplicates(["a", "b"])
    )


def lsh_candidate_pairs(
    entities: DataFrame,
    key: str = "lemma",
    jaccard: float = DEFAULT_JACCARD,
    assume_distinct: bool = False,
) -> DataFrame:
    """Blocked similarity self-join -> verified pairs (a, b, jaccard).

    Recall is the banding S-curve (1-(1-s^2)^8) FURTHER gated by
    signature agreement >= MIN_SIG_AGREE (see the constant's derivation
    - an extra ~0.5% miss at the exact threshold, in exchange for
    dropping the quadratic accidental-candidate term a small shingle
    universe produces)."""
    from .materialize import barrier_with_count

    sig_table, n_keys = barrier_with_count(
        _shingle_plan(entities, key, assume_distinct, with_bands=True),
        f"lsh_sigs_{key}",
    )
    # band rows derive from the sig-table checkpoint (bands are a
    # materialized per-key array there), so no second barrier is needed:
    # re-scanning this plan costs only the posexplode, never the
    # signature/band hashing (round-7: two barriers -> one). Rows carry
    # the 16-int signature for the in-explode agreement gate (~4x the
    # skinny row, still far below the shingle payload the round-2 plan
    # carried).
    banded = _band_rows(sig_table, key, keep=("sigs",))
    # skew-capped in-bucket pairs in ONE fat shuffle, accidental pairs
    # killed by the agreement gate inside the explode
    cand = capped_bucket_pairs(
        banded,
        ["band_idx", "band_hash"],
        F.struct(F.col(key).alias("k"), F.col("sigs").alias("sigs")),
        lambda a, b: a["k"] < b["k"],
        MAX_BUCKET,
        pair_pred=lambda a, b: sig_agreement(a["sigs"], b["sigs"])
        >= F.lit(MIN_SIG_AGREE),
    ).select(F.col("a.k").alias("a"), F.col("b.k").alias("b"))
    if n_keys <= SMALL_SIG_TABLE_KEYS:
        # size-adaptive verification (round-7): on a small key universe
        # the semi-join reduction machinery is pure fixed overhead (two
        # extra materialization jobs for a table that two direct scans
        # of the checkpoint cover), and with no second consumer of the
        # candidate plan there is no double execution to barrier
        # against - the candidate subtree appears ONCE in the final
        # plan. Joins run straight against the checkpointed sig table
        # (AQE broadcasts it at these sizes). Result set identical by
        # construction: the semi-join only pre-filtered rows the inner
        # joins drop anyway.
        sh = sig_table.select(key, "shingles")
    else:
        # barrier the candidate set BEFORE deriving cand_keys: without
        # it the heaviest stage (capped bucket shuffle + pair explode +
        # dedup) runs TWICE - once for the semi-join that builds
        # lsh_verify_sh and again in the final verification join
        # (round-6 advice, medium; the streaming merge path checkpoints
        # cand for the same reason). Then cut the FAT shingle table to
        # candidate keys with ONE semi-join (one shuffle of the fat
        # rows) and barrier the small result; the two per-side joins
        # then shuffle only candidate-sized tables (the round-5 shape
        # shuffled the full shingle table twice, once per side).
        cand = barrier(cand, f"lsh_cand_{key}")
        cand_keys = (
            cand.select(F.explode(F.array("a", "b")).alias(key)).dropDuplicates()
        )
        sh = barrier(
            sig_table.select(key, "shingles").join(cand_keys, key, "left_semi"),
            f"lsh_verify_sh_{key}",
        )
    cand = cand.join(
        sh.select(F.col(key).alias("a"), F.col("shingles").alias("sh_a")), "a"
    ).join(sh.select(F.col(key).alias("b"), F.col("shingles").alias("sh_b")), "b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    jac = inter / F.greatest(union, F.lit(1))
    return (
        cand.withColumn("jaccard", jac)
        .where(F.col("jaccard") >= F.lit(jaccard))
        .select("a", "b", "jaccard")
    )


# graphs at or below this many RAW edge rows take the driver-local
# union-find fast path inside connected_components: the row count is
# known EXACTLY (measured by the input-materialization job) before the
# collect, so the pull is bounded by construction (~tens of MB at the
# cap, far under spark.driver.maxResultSize) - while the distributed
# star-contraction loop costs O(log n) driver-synced rounds of
# join+agg jobs, pure fixed overhead on a small graph (measured: the
# 50k-page linking graph has ~12 edges and paid ~1.8 s of round jobs;
# the sf0.01 oracle graph ~11k edges paid ~8 s). Above the cap the
# loop runs exactly as before - the 100 TB path is unchanged.
SMALL_GRAPH_MAX_EDGES = 500_000


def _union_find_components(rows) -> dict:
    """Driver-local min-label components over (s, d) rows - the exact
    semantics of the star-contraction fixed point: nodes are every
    endpoint (self-loops and None included), edges are rows with two
    non-None endpoints and s != d, labels are the component minimum."""
    parent: dict = {}
    has_null = False

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for s, d in rows:
        if s is None or d is None:
            has_null = True
        for v in (s, d):
            if v is not None and v not in parent:
                parent[v] = v
        if s is None or d is None or s == d:
            continue
        rs, rd = find(s), find(d)
        if rs != rd:
            parent[rd] = rs
    comp_min: dict = {}
    for x in parent:
        r = find(x)
        m = comp_min.get(r)
        if m is None or x < m:
            comp_min[r] = x
    labels = {x: comp_min[find(x)] for x in list(parent)}
    if has_null:
        # the distinct node universe keeps a null endpoint as a node;
        # null never equi-joins, so it labels itself (comp = NULL)
        labels[None] = None
    return labels


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    on_nonconverged: str = "raise",
    ckpt_scope: str = "cc",
    result_barrier: bool = False,
    small_graph_max_edges: int = SMALL_GRAPH_MAX_EDGES,
) -> DataFrame:
    """Alternating large-star/small-star contraction -> (id, comp).

    ``edges`` may reference string or long ids; components are labeled
    with the minimum reachable id. Each round is two join+groupBy steps
    on the edge set (Kiveris et al., SOCC'14):

    * large-star: every node points its LARGER neighbors at the minimum
      of its closed neighborhood;
    * small-star: every node and its SMALLER neighbors point at that
      minimum (edges kept big->small throughout).

    Both steps strictly shrink a monotone potential, and the fixed point
    is a disjoint union of stars centered on each component's minimum -
    reached in O(log n) rounds regardless of diameter (the round-2
    min-label loop was O(diameter) and could exhaust ``max_iter``
    silently, splitting long near-dup chains into several canonical
    nodes). If the loop still exits unconverged, behavior follows
    ``on_nonconverged``: ``"raise"`` (default) or ``"warn"`` (log and
    return the best-effort labels).

    Partitioning is sized to the GRAPH, not to the session default: the
    similarity graph is orders of magnitude smaller than the corpus, and
    an iterative loop over dozens of near-empty shuffle partitions is
    pure task-launch overhead (measured 5x slowdown at local[32] with 64
    partitions on a 30k-edge graph). ~100k edges per partition keeps
    every iteration's tasks usefully sized at any scale.

    Lineage: one ``barrier`` per round (localCheckpoint, or durable
    parquet under ``spark.semrex.checkpointDir``/``ckpt_scope``), and
    each round RELEASES the previous round's blocks once it has
    materialized - without that, a 50-round CC pins 50 edge-set copies
    in executor storage for the rest of the session
    (``materialize.release``; no-op in durable mode).

    ``result_barrier=True``: checkpoint the (id, comp) result itself
    and release ALL internal barriers (input + final round) before
    returning - the returned DataFrame is then self-contained, leaving
    exactly one pinned block the CALLER owns (release it when done).
    The mode for long-lived sessions that call CC repeatedly (the
    streaming merge: one CC per micro-batch); the default lazy return
    is right for one-shot batch jobs, where the final join can still
    fuse into the caller's plan.
    """
    from .materialize import BARRIER_CONF, release

    durable = edges.sparkSession.conf.get(BARRIER_CONF, None) is not None

    def _materialize(df, name, metrics):
        """Barrier + side metrics in ONE job: an Observation's metrics
        are delivered by the eager localCheckpoint action itself. In
        durable mode the barrier may be a resume-read that runs no
        action (obs.get would block forever), so metrics fall back to
        one cheap scan of the checkpoint parquet."""
        if durable:
            out = barrier(df, name)
            r = out.agg(*[c.alias(k) for k, c in metrics.items()]).first()
            return out, {k: r[k] for k in metrics}
        from pyspark.sql import Observation

        obs = Observation()
        observed = df.observe(obs, *[c.alias(k) for k, c in metrics.items()])
        out = observed.localCheckpoint(eager=True)
        return out, obs.get

    # fixed-point detector: (count, order-independent content hash) over
    # the distinct edge set. bit_xor (not sum: ANSI long-sum overflows);
    # a collision masking a real change is ~2^-64 per round.
    _STATS = lambda: {
        "n": F.count(F.lit(1)),
        "h": F.bit_xor(F.xxhash64("u", "v")),
    }

    # ONE materialization of the (possibly expensive) upstream plan -
    # the node universe, the canonical edge set and the final label join
    # all derive from this checkpoint instead of re-evaluating upstream;
    # the same job counts non-self-loop rows (an upper bound on the
    # distinct edge count) for partition sizing
    raw, m = _materialize(
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d")),
        f"{ckpt_scope}_input",
        {
            "n_raw": F.sum((F.col("s") != F.col("d")).cast("long")),
            "n_total": F.count(F.lit(1)),
        },
    )
    n_raw = m["n_raw"] or 0
    # the fast-path gate must bound the COLLECT, so it uses the total
    # row count (self-loop and null-endpoint rows are pulled too); the
    # non-self-loop count only sizes the loop's partitioning
    n_total = m["n_total"] or 0
    if n_total <= small_graph_max_edges:
        # driver-local union-find: the exact same (id, min-reachable)
        # labels, one collect of a table whose size was just measured,
        # zero iterative rounds. n_raw counts non-self-loop rows, so
        # pure-self-loop inputs also land here (they would converge
        # immediately anyway).
        from pyspark.sql import types as T

        labels = _union_find_components(
            [(r[0], r[1]) for r in raw.collect()]
        )
        id_type = raw.schema["s"].dataType
        schema = T.StructType(
            [
                T.StructField("id", id_type, True),
                T.StructField("comp", id_type, True),
            ]
        )
        spark = edges.sparkSession
        result = spark.createDataFrame(
            list(labels.items()), schema
        )
        if result_barrier:
            result = result.localCheckpoint(eager=True)
        release(raw)
        log.info(
            "connected_components: small-graph fast path (%d raw edges)",
            n_raw,
        )
        return result
    n_part = max(2, min(int(n_raw / 100_000) + 1, 2048))
    # node universe: self-loops / isolated endpoints must still receive
    # a label even though star contraction drops u==v edges (computed
    # lazily from the checkpointed input - used once, after the loop)
    nodes = (
        raw.select(F.col("s").alias("id"))
        .union(raw.select(F.col("d").alias("id")))
        .distinct()
    )
    e = (
        raw.where(F.col("s") != F.col("d"))
        .select(F.greatest("s", "d").alias("u"), F.least("s", "d").alias("v"))
        .distinct()
    )
    e, m = _materialize(
        e.repartition(n_part, "u"), f"{ckpt_scope}_edges_p", _STATS()
    )
    prev_stats = (m["n"], m["h"])
    n_edges = m["n"]
    converged = n_edges == 0
    rounds = 0
    for it in range(max_iter):
        if converged:
            break
        # --- large-star ---
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = sym.groupBy("u").agg(F.min("v").alias("mn"))
        mins = mins.select("u", F.least("u", "mn").alias("m"))
        large = (
            sym.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )
        # --- small-star --- (edges oriented big->small by construction)
        mins2 = large.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            large.join(mins2, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(mins2.select(F.col("u"), F.col("m").alias("v")))
            .where(F.col("u") != F.col("v"))
            .distinct()
            .repartition(n_part, "u")
        )
        prev_e = e
        e, m = _materialize(small, f"{ckpt_scope}_round_{it}", _STATS())
        # the new round's checkpoint was prev_e's last consumer
        release(prev_e)
        stats = (m["n"], m["h"])
        rounds = it + 1
        if stats == prev_stats:
            converged = True
        prev_stats = stats
    if not converged:
        msg = (
            f"connected_components did not converge in {max_iter} rounds "
            f"({n_edges} input edges); component labels may be split"
        )
        if on_nonconverged == "raise":
            raise RuntimeError(msg)
        log.warning(msg)
    log.info("connected_components: %d rounds to fixed point", rounds)
    # fixed point = disjoint stars (u -> component-min); roots and
    # isolated/self-loop-only nodes label themselves
    stars = e.select(F.col("u").alias("id"), F.col("v").alias("comp"))
    result = (
        nodes.join(stars, "id", "left")
        .groupBy("id")
        .agg(F.min(F.coalesce("comp", "id")).alias("comp"))
    )
    if result_barrier:
        result = result.localCheckpoint(eager=True)
        release(e)
        release(raw)
    return result


def canonicalize(mentions: DataFrame, jaccard: float = DEFAULT_JACCARD):
    """mentions -> (node_assignments, nodes).

    node_assignments: (lemma, node_id, canonical)
    nodes:            (node_id, canonical, surfaces, n_mentions)

    Exact-lemma dedupe is the groupBy; near-duplicate lemmas are merged by
    LSH edges + connected components; canonical form = lexicographically
    smallest lemma in the component (deterministic).
    """
    from pyspark import StorageLevel

    lemmas = mentions.groupBy("lemma").agg(
        F.count(F.lit(1)).alias("n_mentions"),
        F.collect_set("surface").alias("surfaces"),
    ).persist(StorageLevel.MEMORY_AND_DISK)  # feeds LSH + assignment join
    # assume_distinct: lemmas is the output of a groupBy("lemma") - the
    # persist boundary hides its uniqueness from Catalyst, and the
    # defensive distinct() would re-shuffle the whole lemma set
    sim = lsh_candidate_pairs(lemmas, "lemma", jaccard, assume_distinct=True)
    comp = connected_components(sim, "a", "b", ckpt_scope="linking_cc")
    assignments = (
        lemmas.join(comp.withColumnRenamed("id", "lemma"), "lemma", "left")
        .withColumn("comp", F.coalesce("comp", "lemma"))
    )
    canon = assignments.groupBy("comp").agg(F.min("lemma").alias("canonical"))
    assignments = assignments.join(canon, "comp").persist(
        StorageLevel.MEMORY_AND_DISK
    )  # feeds nodes + node_assignments (edge join)
    nodes = (
        assignments.groupBy("canonical")
        .agg(
            F.sum("n_mentions").alias("n_mentions"),
            F.array_sort(
                F.array_distinct(F.flatten(F.collect_list("surfaces")))
            ).alias("surfaces"),
        )
        .withColumn("node_id", F.xxhash64("canonical"))
        .select("node_id", "canonical", "surfaces", "n_mentions")
    )
    node_assignments = assignments.select(
        "lemma", F.xxhash64("canonical").alias("node_id"), "canonical"
    )
    return node_assignments, nodes


def edges_from_triples(
    triples: DataFrame,
    node_assignments: DataFrame,
    broadcast_dim: bool = True,
) -> DataFrame:
    """triples (subj/obj lemmas) -> aggregated edges over canonical nodes.
    Two joins against the assignment dim + one groupBy.

    ``broadcast_dim``: the assignment table is entity-scale (orders of
    magnitude smaller than the triples fact side), so broadcasting it is
    right up to a few hundred MB of executor memory. At 10^12-document
    scale the entity dim itself can outgrow a broadcast - pass False to
    drop the hint and let AQE pick the strategy (shuffle join with the
    fact side partitioned on the lemma key; pre-bucketing both sides on
    lemma via ``materialize.write_bucketed`` removes even that shuffle)."""
    dim = node_assignments.select("lemma", "node_id")
    na = F.broadcast(dim) if broadcast_dim else dim
    return (
        triples.join(na.withColumnRenamed("lemma", "subj").withColumnRenamed("node_id", "src"), "subj")
        .join(na.withColumnRenamed("lemma", "obj").withColumnRenamed("node_id", "dst"), "obj")
        .groupBy("src", "dst", "pred")
        .agg(F.count(F.lit(1)).alias("n_evidence"))
    )
