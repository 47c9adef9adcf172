"""Config-driven entry point (EP1-EP3): each reference config family run
through run_config must produce the same rows as the hand-wired stages,
mirroring DataProviderFactory dispatch (/root/reference/DataProvider.py:391-403)."""

import os

import pytest
from pyspark.sql import functions as F

from semanticrelationextractionpolish_spark.plans.config_runner import run_config

from test_sources import (
    KBP37_SAMPLE,
    KPWR_DOC,
    KPWR_REL,
    SEMEVAL_CORPUS,
    SEMEVAL_RELS,
)


@pytest.fixture(scope="module")
def corpora_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("config_corpora")
    (d / "kbp37").mkdir()
    (d / "kbp37" / "train.txt").write_text(KBP37_SAMPLE, encoding="utf-8")
    (d / "semeval").mkdir()
    (d / "semeval" / "1.1.text.xml").write_text(SEMEVAL_CORPUS, encoding="utf-8")
    (d / "semeval" / "1.1.relations.txt").write_text(SEMEVAL_RELS, encoding="utf-8")
    (d / "kpwr" / "korpus").mkdir(parents=True)
    (d / "kpwr" / "korpus" / "doc1.xml").write_text(KPWR_DOC, encoding="utf-8")
    (d / "kpwr" / "korpus" / "doc1.rel.xml").write_text(KPWR_REL, encoding="utf-8")
    return str(d)


def _example_key(r):
    return (
        r["url"],
        r["sent_idx"],
        r["e1_id"],
        r["e2_id"],
        tuple(r["tokens"] or ()),
        r["gold_class"],
        r["e1_beg"],
        r["e2_beg"],
    )


def test_run_config_kbp37_matches_handwired(spark, corpora_dir):
    from semanticrelationextractionpolish_spark.functions.kernels import (
        tokenize_kbp37_sentence,
    )
    from semanticrelationextractionpolish_spark.functions.tokenizer import (
        DeterministicTokenizer,
    )
    from semanticrelationextractionpolish_spark.sources.kbp37 import read_kbp37

    cfg = {
        "input_data": {"reader": "kbp37", "ignore_directionality": False},
        "tokenizer": {"iface": "bpemb", "entity_encoding": "iob",
                      "add_positional_tokens": "scheme_1"},
        "engine": "bilstm",
        "max_seq_len": 45,
        "train_params": {"valid_split": 0.1, "test_split": 0.1},
    }
    stages = run_config(
        spark, cfg, source_files=os.path.join(corpora_dir, "kbp37", "train.txt")
    )
    got = {_example_key(r) for r in stages["examples"].collect()}

    # hand-wired: reader + per-sentence kernel on the driver
    tok = DeterministicTokenizer()
    want = set()
    for r in read_kbp37(
        spark, os.path.join(corpora_dir, "kbp37", "train.txt")
    ).collect():
        toks, tids, ents, eids, info = tokenize_kbp37_sentence(
            text=r["text"], relation=r["relation"], tokenizer=tok,
            entity_encoding_scheme="iob", positional_tokens="scheme_1",
        )
        want.add(
            (r["doc_id"], 0, "e1", "e2", tuple(toks), r["relation"],
             info["e1_beg"], info["e2_beg"])
        )
    assert got == want and len(got) == 3
    # downstream stages materialize
    assert stages["model_inputs"].count() == 3
    assert set(
        r["split"] for r in stages["splits"].select("split").distinct().collect()
    ) <= {"train", "valid", "test"}
    scored = {r["model_class"] for r in stages["scored"].collect()}
    assert scored  # deterministic stand-in scorer ran over every pair


def test_run_config_semeval_matches_handwired(spark, corpora_dir):
    from semanticrelationextractionpolish_spark.functions import kernels as K
    from semanticrelationextractionpolish_spark.functions.tokenizer import (
        DeterministicTokenizer,
    )
    from semanticrelationextractionpolish_spark.operators.pairs import (
        default_labels_map,
    )
    from semanticrelationextractionpolish_spark.sources.semeval import (
        read_semeval_corpus,
        read_semeval_relations,
    )

    cfg = {
        "input_data": {
            "reader": "semeval2018_task7",
            "ignore_directionality": False,
            "add_no_relations_clazz": False,
            "retain_natural_no_rels": True,
        },
        "tokenizer": {"iface": "transformers", "entity_encoding": "iob",
                      "add_positional_tokens": "scheme_2"},
        "engine": "transformers",
        "max_seq_len": 80,
        "task_specific": {"append_title": True},
    }
    src = os.path.join(corpora_dir, "semeval")
    stages = run_config(spark, cfg, source_files=src, score=False)
    got = {_example_key(r) for r in stages["examples"].collect()}

    corpus = read_semeval_corpus(
        spark, os.path.join(src, "1.1.text.xml"), append_titles=True
    ).collect()
    raw_relations = {}
    for r in read_semeval_relations(
        spark, os.path.join(src, "1.1.relations.txt")
    ).collect():
        raw_relations.setdefault(r["doc_id"], {})[(r["e1_id"], r["e2_id"])] = r[
            "rel_class"
        ]
    tok = DeterministicTokenizer()
    want = set()
    for c in corpus:
        for row in K.process_document_inline(
            doc_id=c["doc_id"], doc_text=c["text"], tokenizer=tok,
            raw_relations=raw_relations, entity_labels_map=default_labels_map(),
            entity_encoding_scheme="iob", use_entity_classes=False,
            positional_tokens="scheme_2", add_no_relations=False,
            retain_natural_no_rels=True,
        ):
            info = row.get("relation_info") or {}
            want.add(
                (c["doc_id"], row["sent_idx"], row["e1_id"], row["e2_id"],
                 tuple(row["tokens"] or ()), info.get("relation_class"),
                 info.get("e1_beg"), info.get("e2_beg"))
            )
    assert got == want
    # scheme_2 must carry gold labels through (round-3 advice: the
    # marker sanity check used the tokenizer's scheme_1 ees_map and
    # blanked relation_info for every scheme_2 pair)
    golds = {
        r["gold_class"]
        for r in stages["examples"].collect()
        if r["gold_class"] is not None
    }
    assert "USAGE" in golds
    # directionality honored: the REVERSE line became a REV_ class in the
    # normalized relations stage (its entities are unannotated in the
    # corpus fixture, so it never reaches a pair row - same as hand-wired)
    rel_classes = {r["rel_class"] for r in stages["relations"].collect()}
    assert "REV_MODEL-FEATURE" in rel_classes


def test_run_config_kpwr_matches_handwired(spark, corpora_dir):
    from semanticrelationextractionpolish_spark.sources.kpwr import (
        kpwr_explode_relations,
        kpwr_label_vocab,
        kpwr_relation_vocab,
        kpwr_relations,
        kpwr_tag_sentences,
    )

    cfg = {
        "input_data": {
            "reader": "kpwr",
            "ignore_directionality": True,
            "add_no_relations_clazz": True,
            "retain_natural_no_rels": True,
        },
        "tokenizer": {"iface": "bpemb", "entity_encoding": "iob",
                      "add_positional_tokens": "scheme_1"},
        "engine": "bilstm",
        "max_seq_len": 45,
    }
    stages = run_config(
        spark, cfg, source_files=os.path.join(corpora_dir, "kpwr"), score=False
    )
    got = {
        (r["url"], r["sent_idx"], tuple(r["tokens"] or ()), r["gold_class"],
         r["e1_beg"], r["e2_beg"])
        for r in stages["examples"].collect()
    }

    docs = spark.createDataFrame(
        [("korpus_doc1", KPWR_DOC)], "doc_id string, xml string"
    )
    rels_docs = spark.createDataFrame(
        [("korpus_doc1", KPWR_REL)], "doc_id string, xml string"
    )
    vocab = {r["label"]: r["label_id"] for r in kpwr_label_vocab(docs).collect()}
    rels = kpwr_relations(rels_docs)
    rmap = {
        r["rel_class"]: r["rel_id"]
        for r in kpwr_relation_vocab(rels, add_no_rels=True).collect()
    }
    exploded = kpwr_explode_relations(
        kpwr_tag_sentences(docs, vocab), rels, vocab, rmap,
        add_no_relations=True, retain_natural_no_rels=True,
    ).where(F.col("quarantine_error").isNull())
    want = {
        ("korpus_doc1",
         int("".join(ch for ch in r["sent_id"] if ch.isdigit()) or 0),
         tuple(r["tokens"] or ()), r["relation_class"], r["e1_beg"], r["e2_beg"])
        for r in exploded.collect()
    }
    assert got == want and got
    # vocab stages surface through the runner
    lv = {r["label"]: r["label_id"] for r in stages["label_vocab"].collect()}
    assert lv == vocab
    rv = {r["rel_class"]: r["rel_id"] for r in stages["relation_vocab"].collect()}
    assert rv == rmap


def test_run_config_unknown_reader_and_engine(spark):
    with pytest.raises(ValueError, match="Unknown task type"):
        run_config(spark, {"input_data": {"reader": "nope"}})
    with pytest.raises(ValueError, match="Unknown engine"):
        run_config(
            spark,
            {"input_data": {"reader": "kbp37"}, "engine": "gpt"},
            source_files="/dev/null",
        )


def test_run_config_deserialize_checkpoints(spark, corpora_dir, tmp_path):
    """input_data.deserialize=true -> the examples stage is a resumable
    _SUCCESS-gated parquet checkpoint (the reference's pickle
    memoization, DataProvider.py:26-35)."""
    cfg = {
        "input_data": {"reader": "kbp37", "deserialize": True},
        "tokenizer": {"iface": "bpemb"},
        "max_seq_len": 45,
    }
    src = os.path.join(corpora_dir, "kbp37", "train.txt")
    ck = str(tmp_path / "cfg_ck")
    s1 = run_config(spark, cfg, source_files=src, checkpoint_dir=ck, score=False)
    rows1 = sorted(map(tuple, s1["examples"].collect()))
    success = os.path.join(ck, "examples_kbp37", "_SUCCESS")
    assert os.path.exists(success)
    mtime = os.path.getmtime(success)
    s2 = run_config(spark, cfg, source_files=src, checkpoint_dir=ck, score=False)
    assert sorted(map(tuple, s2["examples"].collect())) == rows1
    assert os.path.getmtime(success) == mtime  # memoized, not recomputed


def test_run_config_training_loop(spark, corpora_dir):
    """U12 through the declarative surface: train_params drive the
    distributed training loop; the runner returns the trained model and
    epoch history."""
    cfg = {
        "input_data": {"reader": "kbp37"},
        "tokenizer": {"iface": "bpemb"},
        "engine": "bilstm",
        "max_seq_len": 45,
        "train_params": {"num_epochs": 3, "batch_size": 8},
    }
    stages = run_config(
        spark,
        cfg,
        source_files=os.path.join(corpora_dir, "kbp37", "train.txt"),
        score=False,
        train=True,
    )
    hist = stages["train_history"]
    assert len(hist) == 3
    assert hist[-1]["loss"] <= hist[0]["loss"]
    classes = {r["gold_class"] for r in stages["examples"].collect()}
    assert stages["model"].w.shape == (96, len(classes))


def test_run_config_train_holds_out_and_scores_with_trained_model(
    spark, corpora_dir, tmp_path
):
    """Round-3 advice regressions: (1) the kpwr reader's NULL
    e1_id/e2_id keys made the old split equi-join assign every row
    split=NULL->train (no holdout at all); (2) score=True alongside
    train=True scored with a fresh seed model, ignoring the trained
    weights."""
    from semanticrelationextractionpolish_spark.operators.model_score import (
        score_with_model,
    )
    from semanticrelationextractionpolish_spark.plans.config_runner import (
        with_split,
    )

    # the shared fixture has ONE kpwr doc (one url = one split bucket);
    # clone it under several doc ids so the url-hash split can shed rows
    corpus = tmp_path / "kpwr" / "korpus"
    corpus.mkdir(parents=True)
    doc = (corpora_dir and open(
        os.path.join(corpora_dir, "kpwr", "korpus", "doc1.xml"), encoding="utf-8"
    ).read())
    rel = open(
        os.path.join(corpora_dir, "kpwr", "korpus", "doc1.rel.xml"),
        encoding="utf-8",
    ).read()
    for i in range(8):
        (corpus / f"doc{i}.xml").write_text(doc, encoding="utf-8")
        (corpus / f"doc{i}.rel.xml").write_text(rel, encoding="utf-8")
    cfg = {
        "input_data": {"reader": "kpwr", "add_no_relations_clazz": True},
        "tokenizer": {"iface": "bpemb", "entity_encoding": "iob"},
        "engine": "bilstm",
        "max_seq_len": 45,
        # large holdout so the tiny fixture is guaranteed to shed rows
        "train_params": {
            "num_epochs": 2,
            "batch_size": 8,
            "valid_split": 0.4,
            "test_split": 0.4,
        },
    }
    stages = run_config(
        spark,
        cfg,
        source_files=os.path.join(str(tmp_path), "kpwr"),
        score=True,
        train=True,
    )
    total = stages["model_inputs"].count()
    want_train = (
        with_split(stages["model_inputs"], 0.4, 0.4)
        .where("split = 'train'")
        .count()
    )
    assert 0 < want_train < total  # the holdout actually held out rows
    assert stages["train_history"][0]["n"] == want_train
    # scored must reflect the trained weights, not a fresh seed model
    got = sorted(map(tuple, stages["scored"].collect()))
    want = sorted(
        map(
            tuple,
            score_with_model(
                stages["model_inputs"], model=stages["model"]
            ).collect(),
        )
    )
    assert got == want


def test_run_config_kpwr_precomputed_labels(spark, corpora_dir, tmp_path):
    """precomputed_labels_path (DataProvider.py:237-246): the first run
    writes the per-scheme label artifact; later runs RESTORE it instead
    of rescanning the corpus - proven by tampering the artifact and
    seeing the sentinel label come back."""
    import json

    pre = str(tmp_path / "labels")
    cfg = {
        "input_data": {
            "reader": "kpwr",
            "add_no_relations_clazz": True,
            "precomputed_labels_path": pre,
        },
        "tokenizer": {"iface": "bpemb", "entity_encoding": "iob"},
        "max_seq_len": 45,
    }
    src = os.path.join(corpora_dir, "kpwr")
    s1 = run_config(spark, cfg, source_files=src, score=False)
    lv1 = {r["label"]: r["label_id"] for r in s1["label_vocab"].collect()}
    artifact = os.path.join(pre, "kpwr_labels_iob.json")
    assert os.path.exists(artifact)
    with open(artifact, encoding="utf-8") as fh:
        maps = json.load(fh)
    assert maps["labels_map"] == {k: v for k, v in lv1.items()}
    maps["labels_map"]["B-sentinel_nam"] = 99
    with open(artifact, "w", encoding="utf-8") as fh:
        json.dump(maps, fh)
    s2 = run_config(spark, cfg, source_files=src, score=False)
    lv2 = {r["label"]: r["label_id"] for r in s2["label_vocab"].collect()}
    assert lv2["B-sentinel_nam"] == 99  # restored, not recomputed
    assert s2["examples"].count() == s1["examples"].count()


def test_run_config_empty_train_split_clear_error(spark, corpora_dir):
    """When every url hashes into the holdout (tiny corpus + large
    fractions), run_config must fail with an error naming the holdout
    fractions - not train_model's misleading no-gold-rows message
    (round-4 review)."""
    cfg = {
        "input_data": {"reader": "kpwr", "add_no_relations_clazz": True},
        "tokenizer": {"iface": "bpemb", "entity_encoding": "iob"},
        "engine": "bilstm",
        "max_seq_len": 45,
        "train_params": {"num_epochs": 1, "valid_split": 1.0, "test_split": 0.0},
    }
    with pytest.raises(ValueError, match="train split is empty"):
        run_config(
            spark,
            cfg,
            source_files=os.path.join(corpora_dir, "kpwr"),
            score=False,
            train=True,
        )
