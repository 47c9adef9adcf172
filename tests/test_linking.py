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
