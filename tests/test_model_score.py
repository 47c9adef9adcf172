"""KBP37 marker-tokenize kernel + batched model-scoring UDF tests."""

import numpy as np
import pytest

from semanticrelationextractionpolish_spark.functions import kernels as K
from semanticrelationextractionpolish_spark.functions.tokenizer import (
    DeterministicTokenizer,
)
from semanticrelationextractionpolish_spark.operators.model_score import (
    HashedLinearModel,
    score_with_model,
)


@pytest.fixture(scope="module")
def tok():
    return DeterministicTokenizer()


def test_kbp37_tokenize_spans(tok):
    text = "the <e1>museum</e1> opened in <e2>paris</e2> today"
    toks, tids, ents, eids, info = K.tokenize_kbp37_sentence(
        text=text, relation="org:city", tokenizer=tok
    )
    assert len(toks) == len(tids) == len(ents) == len(eids)
    assert toks[info["e1_beg"]] == "<e1>" and toks[info["e1_end"]] == "</e1>"
    assert toks[info["e2_beg"]] == "<e2>" and toks[info["e2_end"]] == "</e2>"
    # IOB over marker-inclusive span (readers.py:762-768)
    assert ents[info["e1_beg"]] == "B-ENT"
    assert ents[info["e1_beg"] + 1] == "I-ENT"
    assert info["relation_class"] == "org:city"
    # O everywhere outside
    for i, e in enumerate(ents):
        inside = (
            info["e1_beg"] <= i <= info["e1_end"]
            or info["e2_beg"] <= i <= info["e2_end"]
        )
        assert (e != "O") == inside


def test_kbp37_tokenize_scheme2(tok):
    tok2 = DeterministicTokenizer()
    tok2.special_token_ids.update({"$": 777, "#": 888})
    text = "<e1>a</e1> x <e2>b</e2>"
    toks, *_, info = K.tokenize_kbp37_sentence(
        text=text, relation="r", tokenizer=tok2, positional_tokens="scheme_2"
    )
    assert toks[info["e1_beg"]] == "$" and toks[info["e2_beg"]] == "#"


def test_kbp37_malformed_entity(tok):
    with pytest.raises(K.MalformedEntityError):
        K.tokenize_kbp37_sentence(
            text="bad <e1> </e1> thing <e2>x</e2>", relation="r", tokenizer=tok
        )


def test_hashed_model_deterministic():
    m1 = HashedLinearModel(["a", "b", "c"])
    m2 = HashedLinearModel(["a", "b", "c"])
    ids = np.array([[101, 5, 6, 102, 0, 0]])
    att = (ids != 0).astype(np.int32)
    e1 = np.array([[0, 1, 0, 0, 0, 0]])
    e2 = np.array([[0, 0, 1, 0, 0, 0]])
    l1, s1 = m1.predict(ids, att, e1, e2)
    l2, s2 = m2.predict(ids, att, e1, e2)
    assert l1 == l2 and s1[0] == s2[0]
    assert 0 < s1[0] <= 1.0


def test_score_with_model_spark(spark):
    from semanticrelationextractionpolish_spark.operators.pairs import generate_pairs
    from semanticrelationextractionpolish_spark.operators.segment import (
        segment_and_tag,
    )
    from semanticrelationextractionpolish_spark.operators.tensorize import (
        prepare_model_inputs,
    )
    from semanticrelationextractionpolish_spark.sources.synth import (
        PREDICATE_PATTERNS,
        synth_pages,
    )

    pages, rels = synth_pages(spark, 15)
    sents = segment_and_tag(pages.where("lang='pl'"))
    pairs = generate_pairs(sents, rels)
    inputs = prepare_model_inputs(pairs, max_seq_len=64)
    classes = sorted(set(PREDICATE_PATTERNS.values())) + ["NO_RELATION"]
    scored = score_with_model(inputs, classes)
    rows = scored.collect()
    assert rows
    assert all(r["model_class"] in classes for r in rows)
    assert all(0 < r["model_score"] <= 1.0 for r in rows)
    # deterministic across runs
    rows2 = score_with_model(inputs, classes).collect()
    assert {tuple(r) for r in rows} == {tuple(r) for r in rows2}


def test_model_artifact_roundtrip(spark, tmp_path):
    """S9 lifecycle: save trained(-stand-in) weights, restore them on
    executors via broadcast, and get byte-identical scores. The saved
    weights are perturbed from the seeded init to prove the restore path
    really reads the artifact instead of re-seeding."""
    from semanticrelationextractionpolish_spark.operators.model_score import (
        load_model,
        save_model,
    )
    from semanticrelationextractionpolish_spark.operators.pairs import generate_pairs
    from semanticrelationextractionpolish_spark.operators.segment import (
        segment_and_tag,
    )
    from semanticrelationextractionpolish_spark.operators.tensorize import (
        prepare_model_inputs,
    )
    from semanticrelationextractionpolish_spark.sources.synth import (
        PREDICATE_PATTERNS,
        synth_pages,
    )

    classes = sorted(set(PREDICATE_PATTERNS.values())) + ["NO_RELATION"]
    model = HashedLinearModel(classes)
    model.w = model.w + 0.25  # "training" happened
    path = str(tmp_path / "model_artifact")
    save_model(model, path)
    restored = load_model(path)
    assert restored.classes == classes
    assert np.array_equal(restored.w, model.w)

    pages, rels = synth_pages(spark, 10)
    sents = segment_and_tag(pages.where("lang='pl'"))
    inputs = prepare_model_inputs(generate_pairs(sents, rels), max_seq_len=64)
    from_artifact = {
        tuple(r) for r in score_with_model(inputs, model_path=path).collect()
    }
    seeded = {tuple(r) for r in score_with_model(inputs, classes=classes).collect()}
    assert from_artifact  # nonempty
    assert from_artifact != seeded  # perturbed weights actually used
    # and a second restore is identical (determinism of the restore path)
    again = {tuple(r) for r in score_with_model(inputs, model_path=path).collect()}
    assert from_artifact == again
