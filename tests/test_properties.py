"""Property-based tests (hypothesis) over the pure kernels."""

from itertools import combinations

from hypothesis import given, settings
from hypothesis import strategies as st

from semanticrelationextractionpolish_spark.functions import kernels as K
from semanticrelationextractionpolish_spark.functions.lemmatize import (
    lemma_phrase,
    lemma_token,
)
from semanticrelationextractionpolish_spark.functions.tokenizer import (
    DeterministicTokenizer,
    SPECIAL_TOKEN_IDS,
    sent_tokenize,
)

TOK = DeterministicTokenizer()

words = st.text(
    alphabet="abcdefghijklmnoprstuwyzążęółćśźń", min_size=1, max_size=12
)
sentences = st.lists(words, min_size=1, max_size=12).map(" ".join)


@given(sentences)
@settings(max_examples=200, deadline=None)
def test_tokenize_detokenize_roundtrip(text):
    res = TOK.tokenize(text)
    assert len(res["tokens"]) == len(res["token_ids"])
    assert TOK.detokenize(res["tokens"]) == text


@given(sentences)
@settings(max_examples=100, deadline=None)
def test_token_ids_stable_and_bounded(text):
    a = TOK.tokenize(text)["token_ids"]
    b = TOK.tokenize(text)["token_ids"]
    assert a == b
    assert all(0 < i < 50000 for i in a)


@given(st.lists(words, min_size=1, max_size=6))
@settings(max_examples=100, deadline=None)
def test_sent_tokenize_rejoins(parts):
    text = ". ".join(parts) + "."
    sents = sent_tokenize(text)
    assert " ".join(sents) == text


@given(st.integers(2, 30))
@settings(max_examples=50, deadline=None)
def test_augmentation_count_is_choose2_under_cap(n):
    ids = {f"d.{i}" for i in range(n)}
    rels = {}
    K.augment_no_relations(ids, rels)
    if n < K.MAX_ENTITIES_PER_SENT:
        assert len(rels) == n * (n - 1) // 2
    else:
        assert rels == {}


@given(
    st.lists(
        st.sampled_from(["person_nam", "city_nam", "org_nam"]), min_size=2, max_size=8
    ),
    st.integers(0, 10**6),
)
@settings(max_examples=100, deadline=None)
def test_marker_insertion_invariants(chans, salt):
    """For random non-overlapping spans: marker insertion adds exactly 4
    tokens, preserves original token content in order, and the reported
    locations point at the markers."""
    labels = []
    for i, c in enumerate(chans):
        labels.extend([f"B-{c}-{i}", f"I-{c}-{i}"])
        labels.append("O")
    tokens = [f"t{i}" for i in range(len(labels))]
    token_ids = list(range(100, 100 + len(labels)))
    labels_map = K.mk_labels_map(set(chans), "iob")
    eids = [
        K.get_kpwr_entity_id_from_indexed_label(l, labels_map, "iob") for l in labels
    ]
    i1, i2 = 0, len(chans) - 1
    if i1 == i2:
        return
    pos = K.calculate_positional_token_offsets(
        entity_labels=labels,
        from_label_pure=f"{chans[i1]}-{i1}",
        to_label_pure=f"{chans[i2]}-{i2}",
        entity_encoding_scheme="iob",
    )
    toks, tids, ents, eids2, loc = K.insert_positional_tokens(
        tokens=list(tokens),
        token_ids=list(token_ids),
        entities=list(labels),
        entity_ids=list(eids),
        positions=pos,
        entity_encoding_scheme="iob",
        labels_map=labels_map,
        positional_tokens="scheme_1",
        special_token_ids=SPECIAL_TOKEN_IDS,
        corpus="kpwr",
    )
    assert len(toks) == len(tokens) + 4
    assert len(toks) == len(tids) == len(ents) == len(eids2)
    stripped = [t for t in toks if t not in ("<e1>", "</e1>", "<e2>", "</e2>")]
    assert stripped == tokens  # original content preserved in order
    assert toks[loc["e1_beg"]] == "<e1>" and toks[loc["e1_end"]] == "</e1>"
    assert toks[loc["e2_beg"]] == "<e2>" and toks[loc["e2_end"]] == "</e2>"


@given(st.lists(words, min_size=1, max_size=4))
@settings(max_examples=100, deadline=None)
def test_lemma_idempotent(ws):
    phrase = " ".join(ws)
    once = lemma_phrase(phrase)
    assert lemma_phrase(once) == once or len(once.split()) == len(ws)
    assert all(len(lemma_token(w)) <= len(w) for w in ws)


@given(
    st.lists(
        st.lists(
            st.sampled_from(
                ["a_nam-1", "b_nam-1", "c_nam-2", "d_nam-1", "e_nam-3"]
            ).map(lambda x: "B-" + x),
            min_size=1,
            max_size=3,
            unique=True,
        ),
        min_size=1,
        max_size=10,
    )
)
@settings(max_examples=100, deadline=None)
def test_nonoverlapping_pairs_properties(multients):
    pairs = K.kpwr_find_all_non_overlapping_entity_pairs(
        multients=multients, entity_encoding_scheme="iob"
    )
    assert len(pairs) <= K.MAX_NCHOOSEK
    # no returned pair may co-occur on any single token
    for a, b in pairs:
        assert a < b
        for ents in multients:
            pure = {e[2:] for e in ents}
            assert not ({a, b} <= pure)
