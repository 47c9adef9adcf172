"""X12/X13 debug renderers: byte-layout parity with the reference's
print_single_sent / _print_from_dataset / colored prediction lines."""

from semanticrelationextractionpolish_spark.functions.render import (
    format_model_input_table,
    format_sentence_table,
    render_prediction,
)


def test_sentence_table_layout():
    out = format_sentence_table(
        ["▁jan", "▁mieszka"], [101, 102], [["B-person_nam-1"], ["O"]],
        [[1], [0]], rels={("e1", "e2"): "location"},
    )
    lines = out.splitlines()
    # header columns right-aligned to the reference's widths (readers.py:21)
    assert lines[0] == "{: >4} {: >15} {: >10} {: >40} {: >20}".format(
        "i", "subword", "subword_id", "entities", "entity_ids"
    )
    assert "▁jan" in lines[1] and "101" in lines[1]
    assert lines[-1].startswith("Relations: ")


def test_model_input_table_layout():
    out = format_model_input_table(
        ["[CLS]", "▁kot"], [101, 7], [1, 1], [0, 1], [0, 0],
        relation_info={"relation_class": "x"},
    )
    lines = out.splitlines()
    assert lines[0].split() == [
        "idx", "subword", "subword_id", "attn_mask", "e1_mask", "e2_mask"
    ]
    assert lines[-1].startswith("Relation infos (orig): ")


def test_prediction_coloring_rule():
    # markers yellow; blue iff both NO_RELATION, green iff equal, red else
    line = render_prediction("a <e1> b </e1> c", "NO_RELATION", "NO_RELATION")
    assert "\x1b[33m<e1> b </e1>\x1b[0m" in line
    assert "\x1b[34mNO_RELATION/NO_RELATION\x1b[0m" in line
    assert "\x1b[32m" in render_prediction("x", "loc", "loc")
    assert "\x1b[31m" in render_prediction("x", "loc", "org")
    # no-color mode is plain text
    plain = render_prediction("a <e1> b </e1> c", "loc", "org", use_color=False)
    assert "\x1b[" not in plain and plain.endswith("-> loc/org")


def test_show_scored_renders_rows(spark):
    from semanticrelationextractionpolish_spark.functions.render import show_scored

    df = spark.createDataFrame(
        [("u1", ["▁ala", "<e1>", "▁x", "</e1>"], "loc", "loc")],
        "url string, tokens array<string>, gold_class string, model_class string",
    )
    lines = show_scored(df, use_color=False)
    assert len(lines) == 1 and lines[0].endswith("-> loc/loc")
    assert "ala" in lines[0]
