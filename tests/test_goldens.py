"""Frozen-golden tests: the Spark pipeline must reproduce the committed
golden outputs (fixtures/goldens_30pages.json, generated once from the
reference-semantics oracle). Any semantic drift in tokenization, IOB
tagging, caps, marker arithmetic or scoring breaks these."""

import json
import os

import pytest

from semanticrelationextractionpolish_spark.operators.pairs import generate_pairs
from semanticrelationextractionpolish_spark.operators.score import (
    score_pairs,
    triples_from_scored,
)
from semanticrelationextractionpolish_spark.operators.segment import segment_and_tag
from semanticrelationextractionpolish_spark.sources.synth import synth_pages

GOLDEN_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "fixtures",
    "goldens_30pages.json",
)


@pytest.fixture(scope="module")
def golden():
    with open(GOLDEN_PATH, encoding="utf-8") as f:
        return json.load(f)


@pytest.fixture(scope="module")
def outputs(spark):
    pages, rels = synth_pages(spark, 30)
    sents = segment_and_tag(pages.where("lang='pl'"))
    pairs = generate_pairs(sents, rels)
    triples = triples_from_scored(score_pairs(pairs))
    return sents, pairs, triples


def test_golden_sentences(golden, outputs):
    sents, _, _ = outputs
    got = {
        (r["url"], r["sent_idx"]): (
            tuple(r["tokens"]),
            tuple(e if e is not None else None for e in r["entities"]),
            r["n_entities"],
        )
        for r in sents.collect()
    }
    want = {
        (g["url"], g["sent_idx"]): (
            tuple(g["tokens"]),
            tuple(g["entities"]),
            g["n_entities"],
        )
        for g in golden["sentences"]
    }
    assert got == want


def test_golden_pairs(golden, outputs):
    _, pairs, _ = outputs
    got = {
        (r["url"], r["sent_idx"], r["e1_id"], r["e2_id"]): (
            tuple(r["tokens"]),
            r["e1_beg"],
            r["e1_end"],
            r["e2_beg"],
            r["e2_end"],
            r["gold_class"],
        )
        for r in pairs.collect()
        if r["e1_id"] is not None
    }
    want = {
        (g["url"], g["sent_idx"], g["e1_id"], g["e2_id"]): (
            tuple(g["tokens"]),
            g["e1_beg"],
            g["e1_end"],
            g["e2_beg"],
            g["e2_end"],
            g["gold_class"],
        )
        for g in golden["pairs"]
    }
    assert got == want


def test_golden_triples(golden, outputs):
    _, _, triples = outputs
    got = {
        (r["url"], r["sent_idx"], r["subj_id"], r["obj_id"], r["pred"])
        for r in triples.collect()
    }
    want = {
        (g["url"], g["sent_idx"], g["e1_id"], g["e2_id"], g["pred"])
        for g in golden["triples"]
    }
    assert got == want
