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


def main():
    from semanticrelationextractionpolish_spark.session import get_spark

    spark = get_spark(app_name="freeze-fixtures", cores=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    # single files (match the pages fixtures; DuckDB read_parquet needs
    # no glob)
    out = os.path.join(FIXTURES, "pairs_sf0.01.parquet")
    _write_single(
        build_pairs_projection(spark).orderBy("url", "sent_idx", "e1_id", "e2_id"),
        out,
    )
    print(f"wrote {out}: {spark.read.parquet(out).count()} rows")
    out_t = os.path.join(FIXTURES, "triples_sf0.01.parquet")
    _write_single(
        build_triples_projection(spark).orderBy(
            "url", "sent_idx", "subj_id", "obj_id", "pred"
        ),
        out_t,
    )
    print(f"wrote {out_t}: {spark.read.parquet(out_t).count()} rows")


if __name__ == "__main__":
    main()
