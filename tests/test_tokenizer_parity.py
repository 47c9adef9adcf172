"""Real-tokenizer parity harness (round-2 verdict item #6).

The sandbox has no ``bpemb``/``transformers`` (and no network), so the
engine ships ``DeterministicTokenizer`` as an interface-compatible
stand-in. These tests encode the WrappedTokenizer CONTRACT
(/root/reference/readers.py:28-108) against the REAL backends and skip
when they are absent - the day the environment gains ``bpemb`` (and its
model cache) or ``transformers``, they activate and prove:

* the tokenize() return shape ({'tokens', 'token_ids'}, equal lengths);
* the X7 punctuation fix: a document that is exactly "." or "," yields
  the bare punctuation token, never the '▁.'/'▁,' word-initial form
  (readers.py:88-101);
* scheme_1 special ids occupy last_index..last_index+3 in bpemb order
  (readers.py:42-44) and enclose_e1/e2 wraps with exactly those ids
  (readers.py:102-107);
* scheme_2 '$'/'#' ids equal the BERT vocab's ordinary token ids
  (readers.py:58-60) - the property DeterministicTokenizer mirrors with
  content-hash ids.
"""

import pytest

from semanticrelationextractionpolish_spark.functions.tokenizer import (
    DeterministicTokenizer,
)


def _bpemb_or_skip():
    bpemb_mod = pytest.importorskip("bpemb")
    try:
        # downloads the model on first use: skip (not fail) offline
        return bpemb_mod.BPEmb(lang="pl", vs=10000, dim=50)
    except Exception as e:  # pragma: no cover - environment-dependent
        pytest.skip(f"bpemb model unavailable: {e}")


def _wrap_bpemb(bp):
    """Minimal re-statement of the reference's bpemb branch
    (readers.py:35-44, 83-108) to test against."""
    last_index = len(bp.words)
    specials = {
        "<e1>": last_index,
        "</e1>": last_index + 1,
        "<e2>": last_index + 2,
        "</e2>": last_index + 3,
    }

    def tokenize(doc, enclose_e1=False, enclose_e2=False):
        toks, ids = bp.encode(doc), bp.encode_ids(doc)
        for punct in (".", ","):
            if toks == ["▁" + punct]:
                try:
                    ids = [bp.words.index(punct)]
                    toks = [punct]
                except ValueError:
                    pass
        if enclose_e1:
            toks = ["<e1>"] + toks + ["</e1>"]
            ids = [specials["<e1>"]] + ids + [specials["</e1>"]]
        if enclose_e2:
            toks = ["<e2>"] + toks + ["</e2>"]
            ids = [specials["<e2>"]] + ids + [specials["</e2>"]]
        return {"tokens": toks, "token_ids": ids}

    return tokenize, specials


def test_bpemb_contract_parity():
    bp = _bpemb_or_skip()
    tokenize, specials = _wrap_bpemb(bp)
    ours = DeterministicTokenizer()
    for doc in (".", ",", "Ala ma kota.", "Warszawa", "CD Projekt"):
        real = tokenize(doc)
        mine = ours.tokenize(doc)
        # identical interface shape + invariants, backend-independent
        assert set(real) == set(mine) == {"tokens", "token_ids"}
        assert len(real["tokens"]) == len(real["token_ids"])
        assert len(mine["tokens"]) == len(mine["token_ids"])
    # X7 punctuation fix, byte-for-byte on both backends
    assert tokenize(".")["tokens"] == ours.tokenize(".")["tokens"] == ["."]
    assert tokenize(",")["tokens"] == ours.tokenize(",")["tokens"] == [","]
    # scheme_1 enclosure: same shape, specials at the vocab tail
    real = tokenize("kot", enclose_e1=True)
    mine = ours.tokenize("kot", enclose_e1=True)
    assert real["tokens"][0] == mine["tokens"][0] == "<e1>"
    assert real["tokens"][-1] == mine["tokens"][-1] == "</e1>"
    assert real["token_ids"][0] == specials["<e1>"]
    assert mine["token_ids"][0] == ours.special_token_ids["<e1>"]


def test_transformers_scheme2_contract_parity():
    transformers = pytest.importorskip("transformers")
    try:
        tok = transformers.AutoTokenizer.from_pretrained("bert-base-uncased")
    except Exception as e:  # pragma: no cover - offline
        pytest.skip(f"transformers model unavailable: {e}")
    # readers.py:58-60: scheme_2 marker ids ARE the plain-vocab '$'/'#' ids
    assert tok.vocab["$"] == tok.convert_tokens_to_ids("$")
    assert tok.vocab["#"] == tok.convert_tokens_to_ids("#")
    ours = DeterministicTokenizer(positional_scheme="scheme_2")
    assert ours.ees_map == {"e1_beg": "$", "e1_end": "$", "e2_beg": "#", "e2_end": "#"}
    # the stand-in mirrors the same property: marker id == plain-token id
    assert ours.special_token_ids["$"] == ours.tokenize("$")["token_ids"][0]
