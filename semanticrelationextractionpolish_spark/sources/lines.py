"""Split-parallel text-line source with true byte offsets.

The round-1 KBP37/CoNLL readers ordered lines with
``monotonically_increasing_id`` and a ``Window.partitionBy(file)`` -
correct only while every file fits one task (the window collapses each
file into a single partition: a scale-killer for multi-GB line files,
and the id ordering silently depends on scan partition order).

This source instead reads lines through Hadoop's ``TextInputFormat``,
whose record KEY is the line's byte offset within its file: a stable,
split-safe intra-file ordering that needs no window at all. Files are
enumerated on the driver (metadata-scale), each file's splits scan in
parallel, and downstream pairing/sessionization is a bucketed equi-join
on ``floor(offset / bucket_bytes)`` (see kbp37.py / conll.py) - every
stage sharded, no per-file serial task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

LINES_SCHEMA = T.StructType(
    [
        T.StructField("file", T.StringType(), False),
        T.StructField("off", T.LongType(), False),
        T.StructField("value", T.StringType(), True),
    ]
)

# pairing/sessionization bucket width; records (a sentence + its gap to
# the previous boundary) must be shorter than this - see callers
DEFAULT_BUCKET_BYTES = 1 << 20


def list_files(spark: SparkSession, path: str) -> list[str]:
    """Expand a path/glob/directory to concrete file URIs (tiny job -
    file listings are metadata-scale)."""
    return [
        r[0]
        for r in spark.read.text(path)
        .select(F.input_file_name())
        .distinct()
        .collect()
    ]


def lines_with_offsets(spark: SparkSession, path: str) -> DataFrame:
    """-> (file, off, value): one row per line, ``off`` = byte offset of
    the line within its file (TextInputFormat's LongWritable key)."""
    sc = spark.sparkContext
    rdds = []
    for f in list_files(spark, path):
        rdd = sc.newAPIHadoopFile(
            f,
            "org.apache.hadoop.mapreduce.lib.input.TextInputFormat",
            "org.apache.hadoop.io.LongWritable",
            "org.apache.hadoop.io.Text",
        )
        rdds.append(rdd.map(lambda kv, _f=f: (_f, int(kv[0]), kv[1])))
    if not rdds:
        return spark.createDataFrame([], LINES_SCHEMA)
    return spark.createDataFrame(sc.union(rdds), LINES_SCHEMA)


def bucket(col, bucket_bytes: int = DEFAULT_BUCKET_BYTES):
    return F.floor(col / F.lit(bucket_bytes))
