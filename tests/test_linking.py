"""Entity-linking stage tests: LSH candidate generation, connected
components, canonicalization."""

from pyspark.sql import functions as F

from semanticrelationextractionpolish_spark.operators.linking import (
    canonicalize,
    connected_components,
    lsh_candidate_pairs,
)


def test_lsh_finds_near_duplicates(spark):
    df = spark.createDataFrame(
        [
            ("wrocław",),
            ("wrocławi",),
            ("cd projekc",),
            ("cd projekt",),
            ("zupełnie inny tekst",),
        ],
        "lemma string",
    )
    pairs = {(r["a"], r["b"]) for r in lsh_candidate_pairs(df, "lemma").collect()}
    assert ("wrocław", "wrocławi") in pairs
    assert ("cd projekc", "cd projekt") in pairs
    assert all("zupełnie inny tekst" not in p for p in pairs)


def test_connected_components_chain(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (7, 7)], "src long, dst long"
    )
    comp = {r["id"]: r["comp"] for r in connected_components(edges).collect()}
    assert comp[1] == comp[2] == comp[3] == 1
    assert comp[5] == comp[6] == 5
    assert comp[7] == 7


def test_connected_components_string_ids(spark):
    edges = spark.createDataFrame(
        [("b", "a"), ("c", "b")], "src string, dst string"
    )
    comp = {r["id"]: r["comp"] for r in connected_components(edges).collect()}
    assert comp["a"] == comp["b"] == comp["c"] == "a"


def test_canonicalize_merges_variants(spark):
    mentions = spark.createDataFrame(
        [
            ("u1", 0, "e1", "city_nam", 0, 1, "Warszawa", "warszaw"),
            ("u2", 0, "e1", "city_nam", 0, 1, "Warszawie", "warszawi"),
            ("u3", 0, "e1", "city_nam", 0, 1, "Warszawy", "warszaw"),
            ("u4", 0, "e1", "org_nam", 0, 1, "Orlen", "orlen"),
        ],
        "url string, sent_idx int, entity_id string, entity_class string, "
        "beg int, end int, surface string, lemma string",
    )
    assignments, nodes = canonicalize(mentions)
    n = nodes.collect()
    canon = {r["canonical"]: r for r in n}
    assert "warszaw" in canon
    assert set(canon["warszaw"]["surfaces"]) == {"Warszawa", "Warszawie", "Warszawy"}
    assert canon["warszaw"]["n_mentions"] == 3
    assert "orlen" in canon and len(n) == 2
    # assignments map every lemma to its canonical node
    a = {r["lemma"]: r["canonical"] for r in assignments.collect()}
    assert a == {"warszaw": "warszaw", "warszawi": "warszaw", "orlen": "orlen"}


def test_node_ids_stable(spark):
    mentions = spark.createDataFrame(
        [("u1", 0, "e1", "city_nam", 0, 1, "Gdańsk", "gdańsk")],
        "url string, sent_idx int, entity_id string, entity_class string, "
        "beg int, end int, surface string, lemma string",
    )
    _, n1 = canonicalize(mentions)
    _, n2 = canonicalize(mentions)
    assert n1.first()["node_id"] == n2.first()["node_id"]


def test_connected_components_long_chain(spark):
    """Diameter >> max_iter: plain min-label propagation (round-2 impl)
    moves a label one hop per round, so a 120-node chain silently split
    at max_iter=25; large-star/small-star contracts in O(log n) rounds."""
    n = 120
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long"
    )
    comp = {r["id"]: r["comp"] for r in connected_components(edges).collect()}
    assert len(comp) == n
    assert set(comp.values()) == {0}


def test_connected_components_nonconvergence_is_loud(spark):
    """Exhausting max_iter with the edge set still moving must raise
    (default) or warn-and-return, never silently return split labels."""
    import pytest

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(39)], "src long, dst long"
    )
    # small_graph_max_edges=0 forces the distributed loop (the
    # driver-local fast path would solve this 39-edge chain exactly)
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iter=1, small_graph_max_edges=0)
    labels = connected_components(
        edges, max_iter=1, on_nonconverged="warn", small_graph_max_edges=0
    )
    assert labels.count() == 40  # best-effort labels for every node


def test_connected_components_matches_union_find(spark):
    """Random-graph equivalence against a plain-Python union-find."""
    import random

    rnd = random.Random(7)
    n = 300
    raw = [(rnd.randrange(n), rnd.randrange(n)) for _ in range(260)]
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in raw:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    seen = {x for e in raw for x in e}
    roots = {}
    expected = {}
    for x in sorted(seen):  # min id per component
        r = find(x)
        roots.setdefault(r, x)
        expected[x] = roots[r]

    edges = spark.createDataFrame(raw, "src long, dst long")
    comp = {r["id"]: r["comp"] for r in connected_components(edges).collect()}
    assert comp == expected


def test_connected_components_fast_path_matches_loop(spark):
    """The round-7 driver-local small-graph fast path must label
    EXACTLY like the distributed star-contraction loop - same graph,
    both paths, including self-loops and string ids."""
    import random

    rnd = random.Random(11)
    raw = [
        (f"e{rnd.randrange(120)}", f"e{rnd.randrange(120)}")
        for _ in range(150)
    ] + [("loop", "loop"), ("iso1", "iso1")]
    edges = spark.createDataFrame(raw, "src string, dst string")
    fast = {
        r["id"]: r["comp"]
        for r in connected_components(edges, ckpt_scope="ccf").collect()
    }
    slow = {
        r["id"]: r["comp"]
        for r in connected_components(
            edges, ckpt_scope="ccs", small_graph_max_edges=0
        ).collect()
    }
    assert fast == slow and len(fast) > 0


def test_capped_bucket_pairs_one_shuffle_equivalence(spark):
    """Round-6 verdict #1: the one-shuffle in-bucket pair generator must
    (a) equal the old guard-join + band-self-join pair set exactly,
    (b) drop over-cap buckets entirely, and (c) produce its pairs with
    a single exchange of the band rows (the window's) - the groupBy
    reuses the window's partitioning and the self-join is gone."""
    import re

    from semanticrelationextractionpolish_spark.operators.linking import (
        capped_bucket_pairs,
    )

    rows = [(f"k{i:03d}", i % 37, i % 5) for i in range(600)]
    # one hot bucket: 80 members in (999, 0) - over a cap of 64
    rows += [(f"hot{i:03d}", 999, 0) for i in range(80)]
    banded = spark.createDataFrame(
        rows, "lemma string, band_idx long, band_hash long"
    ).localCheckpoint(eager=True)

    got = capped_bucket_pairs(
        banded,
        ["band_idx", "band_hash"],
        F.col("lemma"),
        lambda a, b: a < b,
        64,
        guard="window",
    )
    got_pre = capped_bucket_pairs(
        banded, ["band_idx", "band_hash"], F.col("lemma"), lambda a, b: a < b, 64
    )
    # reference: the round-5 shape
    sizes = banded.groupBy("band_idx", "band_hash").agg(
        F.count(F.lit(1)).alias("bsz")
    )
    guarded = banded.join(
        sizes.where(F.col("bsz") <= 64), ["band_idx", "band_hash"]
    )
    want = (
        guarded.select("band_idx", "band_hash", F.col("lemma").alias("a"))
        .join(
            guarded.select("band_idx", "band_hash", F.col("lemma").alias("b")),
            ["band_idx", "band_hash"],
        )
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .dropDuplicates(["a", "b"])
    )
    for cand in (got, got_pre):  # both guards == the round-5 shape
        assert cand.exceptAll(want).count() == 0
        assert want.exceptAll(cand).count() == 0
        assert cand.where(F.col("a").startswith("hot")).count() == 0
        assert cand.count() > 0

    # plan shape of the window guard: ONE exchange of the band rows,
    # no join at all
    got.collect()
    final = (
        got._jdf.queryExecution().executedPlan().toString().split("== Initial Plan ==")[0]
    )
    band_exchanges = [
        m
        for m in re.findall(r"Exchange hashpartitioning\(([^)]*)\)", final)
        if "band_idx" in m
    ]
    assert len(band_exchanges) == 1, band_exchanges
    assert "SortMergeJoin" not in final and "BroadcastHashJoin" not in final


def _stored_rdd_ids(spark):
    return {
        i.id() for i in spark.sparkContext._jsc.sc().getRDDStorageInfo()
    }


def test_connected_components_releases_superseded_rounds(spark):
    """Barrier-release discipline (round-6): a multi-round CC must not
    pin every round's localCheckpoint blocks for the rest of the
    session - DataFrame.unpersist() cannot reach them, so without
    materialize.release a long-lived session accumulates one edge-set
    copy per round per CC call. Default mode may keep only the blocks
    the lazy result still needs (input + final round); result_barrier
    mode returns a self-contained checkpoint and keeps exactly ONE."""
    from semanticrelationextractionpolish_spark.operators.materialize import (
        release,
    )

    before = _stored_rdd_ids(spark)
    n = 120  # chain: contracts over several rounds
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long"
    )

    comp = connected_components(edges)
    assert comp.count() == n
    leftover = _stored_rdd_ids(spark) - before
    assert len(leftover) <= 2, leftover  # input barrier + final round

    before2 = _stored_rdd_ids(spark)
    comp2 = connected_components(edges, result_barrier=True)
    got = {r["id"]: r["comp"] for r in comp2.collect()}
    assert got == {r["id"]: r["comp"] for r in comp.collect()}
    leftover2 = _stored_rdd_ids(spark) - before2
    assert len(leftover2) == 1, leftover2  # just the result checkpoint
    assert release(comp2)  # caller-owned; releasable
    assert len(_stored_rdd_ids(spark) - before2) == 0


def test_release_is_noop_on_non_checkpoint_plans(spark):
    """release() must refuse plans that can recompute (not LogicalRDD):
    releasing a cached-but-lineage-bearing DataFrame would be wrong to
    report as released, and arbitrary lazy plans are untouched."""
    from semanticrelationextractionpolish_spark.operators.materialize import (
        release,
    )

    df = spark.range(10).selectExpr("id", "id * 2 AS x")
    assert release(df) is False
    assert df.count() == 10  # still usable
    cached = spark.range(10).cache()
    assert cached.count() == 10
    assert release(cached) is False  # CacheManager-cached, not a ckpt
    assert cached.count() == 10
    cached.unpersist()
