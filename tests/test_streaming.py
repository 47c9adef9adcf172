"""Structured-Streaming ingestion tests (availableNow micro-batch over a
file source, exactly-once via streaming checkpoint)."""

import os

from pyspark.sql import functions as F

from semanticrelationextractionpolish_spark.sources.synth import synth_pages
from semanticrelationextractionpolish_spark.streaming.pipeline import (
    page_rate_by_lang,
    read_page_stream,
    stream_triples,
)


def _setup(spark, tmp_path, n=30):
    pages, rels = synth_pages(spark, n)
    in_dir = str(tmp_path / "pages_in")
    rels_path = str(tmp_path / "rels")
    pages.coalesce(3).write.parquet(in_dir)
    rels.write.parquet(rels_path)
    return in_dir, rels_path


def test_stream_triples_matches_batch(spark, tmp_path):
    in_dir, rels_path = _setup(spark, tmp_path)
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = stream_triples(spark, in_dir, rels_path, out_dir, ckpt)
    q.awaitTermination(120)
    got = spark.read.parquet(os.path.join(out_dir, "triples"))
    # batch reference result
    from semanticrelationextractionpolish_spark.plans.pipeline import build_kg

    stages = build_kg(
        spark,
        spark.read.parquet(in_dir),
        spark.read.parquet(rels_path),
    )
    want = {
        (r["url"], r["sent_idx"], r["subj"], r["pred"], r["obj"])
        for r in stages["triples"].collect()
    }
    have = {
        (r["url"], r["sent_idx"], r["subj"], r["pred"], r["obj"])
        for r in got.collect()
    }
    assert have == want and len(have) > 0


def test_stream_resume_no_duplicates(spark, tmp_path):
    in_dir, rels_path = _setup(spark, tmp_path)
    out_dir = str(tmp_path / "out2")
    ckpt = str(tmp_path / "ckpt2")
    q = stream_triples(spark, in_dir, rels_path, out_dir, ckpt)
    q.awaitTermination(120)
    n1 = spark.read.parquet(os.path.join(out_dir, "triples")).count()
    # restart against the same checkpoint: no new files -> no new rows
    q2 = stream_triples(spark, in_dir, rels_path, out_dir, ckpt)
    q2.awaitTermination(120)
    n2 = spark.read.parquet(os.path.join(out_dir, "triples")).count()
    assert n1 == n2


def test_page_rate_windowed(spark, tmp_path):
    in_dir, _ = _setup(spark, tmp_path)
    stream = read_page_stream(spark, in_dir)
    agg = page_rate_by_lang(stream)
    q = (
        agg.writeStream.format("memory")
        .queryName("rates")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM rates").collect()
    assert rows and all(r["n_pages"] > 0 for r in rows)
    assert {r["lang"] for r in rows} >= {"pl"}
