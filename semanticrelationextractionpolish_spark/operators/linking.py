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
* Connected components is the hash-partitioned iterative min-label
  propagation loop (J8); every iteration is join + partial-agg groupBy on
  the same key, with ``localCheckpoint`` to cut lineage (SURVEY.md §4.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_HASHES = 16
N_BANDS = 8  # 2 rows per band: P(collide) ~= 1-(1-s^2)^8, >0.94 at s=0.55
SHINGLE = 3
MAX_BUCKET = 64  # skew guard on a single LSH bucket
DEFAULT_JACCARD = 0.42


def _shingles(col):
    """Distinct character 3-grams, via sequence+transform (JVM-side)."""
    padded = F.concat(F.lit("^"), col, F.lit("$"))
    n = F.greatest(F.length(padded) - (SHINGLE - 1), F.lit(1))
    return F.array_distinct(
        F.transform(F.sequence(F.lit(1), n), lambda i: padded.substr(i, F.lit(SHINGLE)))
    )


def add_minhash_bands(df: DataFrame, key: str = "lemma") -> DataFrame:
    """df + shingles + one row per (band_idx, band_hash)."""
    with_sh = df.withColumn("shingles", _shingles(F.col(key)))
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
    rows_per_band = N_HASHES // N_BANDS
    bands = F.transform(
        F.sequence(F.lit(0), F.lit(N_BANDS - 1)),
        lambda b: F.hash(
            b, F.slice(F.col("sigs"), b * rows_per_band + 1, rows_per_band)
        ),
    )
    # materialize signatures before the band posexplode: Generate
    # re-evaluates its expression per exploded element, so without the
    # barrier the 16 array_min scans run once per band (8x) per row
    with_sig = with_sh.withColumn("sigs", sigs).localCheckpoint(eager=True)
    return with_sig.select(
        key,
        "shingles",
        F.posexplode(bands).alias("band_idx", "band_hash"),
    )


def lsh_candidate_pairs(
    entities: DataFrame, key: str = "lemma", jaccard: float = DEFAULT_JACCARD
) -> DataFrame:
    """Blocked similarity self-join -> verified pairs (a, b, jaccard)."""
    banded = add_minhash_bands(entities.select(key).distinct(), key)
    # materialize the signature computation ONCE: both sides of the band
    # self-join (and the bucket-size guard) reuse it; without this the
    # whole MinHash chain is recomputed 3x inside a single action
    banded = banded.localCheckpoint(eager=True)
    # skew guard: drop degenerate buckets (cheap windowless approach: count
    # per bucket, filter) - a bucket with B members yields B^2/2 pairs.
    bucket_sizes = banded.groupBy("band_idx", "band_hash").agg(
        F.count(F.lit(1)).alias("bsz")
    )
    banded = banded.join(
        bucket_sizes.where(F.col("bsz") <= MAX_BUCKET), ["band_idx", "band_hash"]
    )
    left = banded.select(
        "band_idx",
        "band_hash",
        F.col(key).alias("a"),
        F.col("shingles").alias("sh_a"),
    )
    right = banded.select(
        "band_idx",
        "band_hash",
        F.col(key).alias("b"),
        F.col("shingles").alias("sh_b"),
    )
    cand = (
        left.join(right, ["band_idx", "band_hash"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b", "sh_a", "sh_b")
        .dropDuplicates(["a", "b"])
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    jac = inter / F.greatest(union, F.lit(1))
    return (
        cand.withColumn("jaccard", jac)
        .where(F.col("jaccard") >= F.lit(jaccard))
        .select("a", "b", "jaccard")
    )


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Iterative min-label propagation -> (id, component).

    ``edges`` may reference string or long ids; components are the
    minimum id reachable. Each round: neighbor-min join + groupBy on id
    (co-partitioned), localCheckpoint to cut lineage; stops when no label
    changed (driver-side count - one scalar per round).

    Partitioning is sized to the GRAPH, not to the session default: the
    similarity graph is orders of magnitude smaller than the corpus, and
    an iterative loop over dozens of near-empty shuffle partitions is
    pure task-launch overhead (measured 5x slowdown at local[32] with 64
    partitions on a 30k-edge graph). ~100k edges per partition keeps
    every iteration's tasks usefully sized at any scale.
    """
    sym = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    sym = sym.union(sym.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct()
    # one materialization of the (possibly expensive) upstream plan; the
    # count for partition sizing then reads the checkpointed data
    sym = sym.localCheckpoint(eager=True)
    n_edges = sym.count()
    n_part = max(2, min(int(n_edges / 100_000) + 1, 2048))
    sym = sym.repartition(n_part, "v").localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("u").alias("id"))
        .distinct()
        .repartition(n_part, "id")
        .withColumn("comp", F.col("id"))
        .localCheckpoint(eager=True)
    )
    for it in range(max_iter):
        msgs = sym.join(
            labels.withColumnRenamed("id", "v"), "v"
        ).select(F.col("u").alias("id"), "comp")
        new_labels = (
            labels.select("id", "comp")
            .union(msgs)
            .repartition(n_part, "id")  # groupBy reuses this partitioning
            .groupBy("id")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint(eager=True)
        )
        prev = labels
        labels = new_labels
        # convergence check costs a driver-synced job; checking every
        # second round halves that cost (components converge in
        # O(diameter) rounds, one extra cheap round is free)
        if it % 2 == 1 or it == max_iter - 1:
            changed = (
                new_labels.alias("n")
                .join(prev.alias("o"), "id")
                .where(F.col("n.comp") != F.col("o.comp"))
                .count()
            )
            if changed == 0:
                break
    return labels


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
    sim = lsh_candidate_pairs(lemmas, "lemma", jaccard)
    comp = connected_components(sim, "a", "b")  # only lemmas with neighbors
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


def edges_from_triples(triples: DataFrame, node_assignments: DataFrame) -> DataFrame:
    """triples (subj/obj lemmas) -> aggregated edges over canonical nodes.
    Two broadcast-able joins against the assignment dim + one groupBy."""
    na = F.broadcast(node_assignments.select("lemma", "node_id"))
    return (
        triples.join(na.withColumnRenamed("lemma", "subj").withColumnRenamed("node_id", "src"), "subj")
        .join(na.withColumnRenamed("lemma", "obj").withColumnRenamed("node_id", "dst"), "obj")
        .groupBy("src", "dst", "pred")
        .agg(F.count(F.lit(1)).alias("n_evidence"))
    )
