"""Freeze the intermediate PAIRS stage for the sf0.01 page fixture.

The model_inputs driver query verifies the tensorize stage (CLS shift,
too-long filter, span masks) against a DuckDB oracle; the oracle needs
the pairs stage's marker indices / token counts as a table it can read.
This tool derives `fixtures/pairs_sf0.01.parquet` from the *committed*
page fixtures (deterministic end to end: seeded corpus, content-hash
tokenizer), and `tests/test_tensorize.py::test_pairs_fixture_fresh`
asserts the live pipeline still reproduces it, so the fixture cannot
silently drift from the code.

Usage: python tools/freeze_fixtures.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURES = os.path.join(REPO, "fixtures")

from pyspark.sql import functions as F


def build_pairs_projection(spark, tag: str = "sf0.01"):
    from semanticrelationextractionpolish_spark.operators.pairs import generate_pairs
    from semanticrelationextractionpolish_spark.operators.segment import (
        segment_and_tag,
    )

    pages = spark.read.parquet(os.path.join(FIXTURES, f"pages_{tag}.parquet"))
    rels = spark.read.parquet(
        os.path.join(FIXTURES, f"page_relations_{tag}.parquet")
    )
    sents = segment_and_tag(pages.where(F.col("lang") == "pl"))
    pairs = generate_pairs(sents, rels)
    return pairs.select(
        "url",
        "sent_idx",
        "e1_id",
        "e2_id",
        F.size("token_ids").cast("int").alias("n_tokens"),
        "e1_beg",
        "e1_end",
        "e2_beg",
        "e2_end",
        "gold_class",
    )


def build_triples_projection(spark, tag: str = "sf0.01"):
    """Full-pipeline triples on the committed page fixtures (pre-linking
    columns only - linking ids are hash-dependent and stay rows-only)."""
    from pyspark.sql import functions as F  # noqa: F811

    from semanticrelationextractionpolish_spark.plans.pipeline import build_kg

    pages = spark.read.parquet(os.path.join(FIXTURES, f"pages_{tag}.parquet"))
    rels = spark.read.parquet(
        os.path.join(FIXTURES, f"page_relations_{tag}.parquet")
    )
    stages = build_kg(spark, pages, rels, link=False)
    return stages["triples"].select(
        "url", "sent_idx", "subj", "pred", "obj", "subj_id", "obj_id"
    )


def _write_single(df, out):
    import glob
    import shutil

    tmp_dir = out + ".spark"
    df.coalesce(1).write.mode("overwrite").parquet(tmp_dir)
    part = glob.glob(os.path.join(tmp_dir, "*.parquet"))[0]
    if os.path.isdir(out):
        shutil.rmtree(out)
    shutil.move(part, out)
    shutil.rmtree(tmp_dir)


def freeze_pages(spark, tag: str, n_pages: int):
    """Freeze the deterministic synthetic page corpus itself (needed
    before pairs/triples can be derived for a new tag)."""
    from semanticrelationextractionpolish_spark.sources.synth import synth_pages

    pages, rels = synth_pages(spark, n_pages)
    out_p = os.path.join(FIXTURES, f"pages_{tag}.parquet")
    out_r = os.path.join(FIXTURES, f"page_relations_{tag}.parquet")
    if not os.path.exists(out_p):
        _write_single(pages.orderBy("url"), out_p)
        print(f"wrote {out_p}: {spark.read.parquet(out_p).count()} rows")
    if not os.path.exists(out_r):
        _write_single(rels.orderBy("url", "e1_id", "e2_id", "rel_class"), out_r)
        print(f"wrote {out_r}: {spark.read.parquet(out_r).count()} rows")


def main():
    from semanticrelationextractionpolish_spark.session import get_spark

    tags = sys.argv[1:] or ["sf0.01"]
    spark = get_spark(app_name="freeze-fixtures", cores=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    # single files (match the pages fixtures; DuckDB read_parquet needs
    # no glob)
    for tag in tags:
        if tag == "sf0.1":
            freeze_pages(spark, tag, 50000)
        out = os.path.join(FIXTURES, f"pairs_{tag}.parquet")
        _write_single(
            build_pairs_projection(spark, tag).orderBy(
                "url", "sent_idx", "e1_id", "e2_id"
            ),
            out,
        )
        print(f"wrote {out}: {spark.read.parquet(out).count()} rows")
        out_t = os.path.join(FIXTURES, f"triples_{tag}.parquet")
        _write_single(
            build_triples_projection(spark, tag).orderBy(
                "url", "sent_idx", "subj_id", "obj_id", "pred"
            ),
            out_t,
        )
        print(f"wrote {out_t}: {spark.read.parquet(out_t).count()} rows")


if __name__ == "__main__":
    main()
