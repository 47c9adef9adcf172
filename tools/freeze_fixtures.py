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


def main():
    from semanticrelationextractionpolish_spark.session import get_spark

    spark = get_spark(app_name="freeze-fixtures", cores=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    import glob
    import shutil

    out = os.path.join(FIXTURES, "pairs_sf0.01.parquet")
    tmp_dir = out + ".spark"
    df = build_pairs_projection(spark).orderBy("url", "sent_idx", "e1_id", "e2_id")
    df.coalesce(1).write.mode("overwrite").parquet(tmp_dir)
    # flatten to a single file (matches the pages fixtures; lets DuckDB
    # read_parquet the path without a glob)
    part = glob.glob(os.path.join(tmp_dir, "*.parquet"))[0]
    if os.path.isdir(out):
        shutil.rmtree(out)
    shutil.move(part, out)
    shutil.rmtree(tmp_dir)
    print(f"wrote {out}: {spark.read.parquet(out).count()} rows")


if __name__ == "__main__":
    main()
