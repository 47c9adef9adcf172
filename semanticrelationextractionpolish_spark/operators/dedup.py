"""Deduplication operators for web-scale training corpora.

Four families, each a ``documents``-table DataFrame op:

* exact (md5-of-normalized-text groupBy) - 1 shuffle, SQL-oracle exact;
* n-gram Jaccard near-dup (shingle inverted-index join) - the classic
  candidate-pair + verify plan with frequency-capped shingles as the
  skew guard;
* MinHash-LSH near-dup (reuses linking's band machinery over *word*
  shingles) - the sub-quadratic scale path;
* SimHash (64-bit hamming fingerprint, banded for blocking).

At 100 TB: exact dedup is a straight hash-aggregate; LSH/SimHash block
to near-linear candidate counts; the raw n-gram join exists mainly as
the verification oracle for the LSH path on small slices.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from .materialize import barrier


def _norm(text_col):
    return F.regexp_replace(F.trim(F.lower(text_col)), r"\s+", " ")


def exact_dedup(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One row per distinct normalized content: the keeper (min doc_id)
    plus the duplicate count."""
    keyed = df.select(
        "doc_id", F.md5(_norm(F.col(text_col))).alias("content_md5")
    )
    return (
        keyed.groupBy("content_md5")
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    max_ngram_df: int = 1000,
) -> DataFrame:
    """All doc pairs with word-``n``-gram Jaccard >= threshold.

    Plan: explode distinct n-grams -> drop n-grams appearing in more than
    ``max_ngram_df`` docs (stopword-shingle skew guard - they cannot be
    discriminative and would quadratically blow up the join) -> self-join
    the inverted index -> count shared shingles -> verify Jaccard with
    per-doc shingle counts.
    """
    # hashed shingling: hash each token ONCE (xxhash64), then combine n
    # consecutive token hashes into the gram key - no per-gram string
    # concatenation, and long keys move ~5x fewer shuffle bytes than word
    # trigrams (collision risk 1e-9 at 1e5 distinct grams is far below
    # the jaccard threshold's sensitivity). The split/tokenize/gram steps
    # are STAGED through separate selects: nesting them in one expression
    # tree makes the HOF lambdas re-evaluate the upstream regex split per
    # array element (measured 16s vs 0.4s on 5k docs at sf0.1).
    tokenized = df.select(
        "doc_id", F.split(_norm(F.col(text_col)), " ").alias("toks")
    )
    hashed = tokenized.select(
        "doc_id", F.transform("toks", lambda w: F.xxhash64(w)).alias("tok_h")
    )
    cnt = F.size("tok_h") - (n - 1)
    gram_keys = F.when(cnt < 1, F.array().cast("array<bigint>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.greatest(cnt, F.lit(1))),
            lambda i: F.xxhash64(
                *[F.element_at(F.col("tok_h"), i + k) for k in range(n)]
            ),
        )
    )
    # materialize the per-doc gram arrays BEFORE exploding: Spark's
    # Generate collapses the gram-building expression into itself and
    # re-evaluates it per exploded element (measured 12s vs 0.1s on 260k
    # grams at sf0.1). One skinny array row per doc; the barrier is the
    # shingle stage checkpoint (durable when spark.semrex.checkpointDir
    # is set - the kill-resume path reuses it).
    sized = barrier(
        hashed.select("doc_id", F.array_distinct(gram_keys).alias("grams"))
        .withColumn("n_grams", F.size("grams")),
        "ngram_grams",
    )
    inv = sized.select("doc_id", "n_grams", F.explode("grams").alias("gram"))
    # frequency cap via a window over the gram partitioning: ONE pass over
    # the inverted index (the round-1 groupBy+join recomputed the whole
    # index twice); the capped index is materialized so the self-join's
    # two sides read it instead of re-exploding
    # (same localCheckpoint discipline as minhash_near_dup_pairs)
    gdf = F.count(F.lit(1)).over(Window.partitionBy("gram"))
    inv = barrier(
        inv.withColumn("gdf", gdf).where(F.col("gdf") <= max_ngram_df).drop("gdf"),
        "ngram_inv_capped",
    )
    a = inv.select(
        F.col("gram"),
        F.col("doc_id").alias("doc_a"),
        F.col("n_grams").alias("na"),
    )
    b = inv.select(
        F.col("gram"),
        F.col("doc_id").alias("doc_b"),
        F.col("n_grams").alias("nb"),
    )
    # doc-length banding: Jaccard >= t implies min(na,nb)/max(na,nb) >= t
    # (intersection <= min, union >= max), so length-mismatched pairs are
    # pruned AT THE JOIN, before they fan into the groupBy. Same result
    # set by construction; at sf0.1 this cut the query >2x. The ratio form
    # (not t*max <= min) avoids fp-literal edge cases: both engines
    # compute the same correctly-rounded double for min/max.
    band = F.least("na", "nb").cast("double") / F.greatest("na", "nb")
    shared = (
        a.join(b, "gram")
        .where(F.col("doc_a") < F.col("doc_b"))
        .where(band >= F.lit(threshold))
        .groupBy("doc_a", "doc_b", "na", "nb")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    jac = F.col("shared") / (F.col("na") + F.col("nb") - F.col("shared"))
    return (
        shared.withColumn("jaccard", F.round(jac, 6))
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


MERSENNE_P = (1 << 31) - 1  # modulus of the cross-engine sig-hash family


def _minhash_md5_kernel(n: int):
    """mapInPandas kernel computing the ENTIRE md5 minhash signature
    block per doc from its token array - value-identical to the JVM
    Column formulation it replaces (and to the DuckDB oracle):

    * shingles: first-occurrence-distinct word ``n``-grams
      (dict.fromkeys == array_distinct order);
    * sh_h: int(md5(s)[:15hex], 16) % p - hashlib md5 of UTF-8 bytes ==
      Spark/DuckDB md5; 15 hex chars < 2^60 fit an int64;
    * sigs: min over shingles of (h*a_i + b_i) % p for the 16 universal
      hashes - operands < 2^31, products < 2^62: int64 never wraps and
      numpy % on non-negatives == Java %; one numpy broadcast per doc
      (per-ROW, keeping the (n_shingles x 16) temporary cache-resident
      - the round-6 simhash finding: batch-flat goes memory-bound);
      empty docs yield [NULL]*16 exactly like array_min(empty);
    * bands: md5 of ``"{b}|{sig,sig}"`` - for empty docs the JVM
      array_join SKIPS null sigs (no null replacement), producing
      ``"{b}|"``, mirrored here.
    """
    import hashlib

    from .linking import N_BANDS, N_HASHES

    p = MERSENNE_P
    rpb = N_HASHES // N_BANDS
    A = np.array(
        [(i * 2654435761) % p + 1 for i in range(N_HASHES)], dtype=np.int64
    )
    B = np.array([i * 40503 + 7 for i in range(N_HASHES)], dtype=np.int64)

    def _h15(s: str) -> int:
        return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)

    def kernel(batches):
        for pdf in batches:
            out_sh, out_sigs, out_bands = [], [], []
            for toks in pdf["toks"]:
                # NULL text -> null token array -> Arrow None: mirror
                # the JVM path (null shingles never verify as pairs;
                # sigs [NULL]*16, bands md5("b|")) instead of raising
                toks = [] if toks is None else list(toks)
                if len(toks) - (n - 1) < 1:
                    shingles = []
                else:
                    shingles = list(
                        dict.fromkeys(
                            " ".join(toks[i : i + n])
                            for i in range(len(toks) - (n - 1))
                        )
                    )
                out_sh.append(shingles)
                if not shingles:
                    sigs = [None] * N_HASHES
                    sig_strs = [""] * N_BANDS
                else:
                    h = np.fromiter(
                        (_h15(s) % p for s in shingles),
                        dtype=np.int64,
                        count=len(shingles),
                    )
                    m = (h[:, None] * A[None, :] + B[None, :]) % p
                    mins = m.min(axis=0)
                    sigs = mins.tolist()
                    sig_strs = [
                        ",".join(str(v) for v in sigs[b * rpb : b * rpb + rpb])
                        for b in range(N_BANDS)
                    ]
                out_sigs.append(sigs)
                out_bands.append(
                    [_h15(f"{b}|{sig_strs[b]}") for b in range(N_BANDS)]
                )
            yield pd.DataFrame(
                {
                    "lemma": pdf["lemma"],
                    "shingles": out_sh,
                    "sigs": out_sigs,
                    "bands": out_bands,
                }
            )

    return kernel


def _md5_long(col):
    """Cross-engine 60-bit hash: first 15 hex chars of md5 as a BIGINT.
    Spark md5 == DuckDB md5, so signatures/band keys derived this way are
    recomputable by the SQL oracle (Spark's hash/xxhash64 are not)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def minhash_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    n: int = 3,
    jaccard: float = 0.7,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """MinHash-banded near-duplicate candidates, Jaccard-verified: the
    scale path (candidates ~ linear in corpus size).

    ``hash_fn``: ``"xxhash64"`` (default - fastest, Spark-internal) or
    ``"md5"`` (cross-engine: the DuckDB oracle recomputes the identical
    signatures/bands, upgrading the driver check from rows-only to
    exact; see ``minhash_md5_oracle_sql``)."""
    # staged select: building the shingles over a materialized token
    # column keeps the HOF from re-splitting the text per element
    toks_df = df.select(
        F.col("doc_id").cast("string").alias("lemma"),
        F.split(_norm(F.col(text_col)), " ").alias("toks"),
    )
    from .linking import MAX_BUCKET, N_BANDS, N_HASHES

    rows_per_band = N_HASHES // N_BANDS
    if hash_fn == "md5":
        # the WHOLE md5 signature block (shingling, md5 hashing, the
        # 16-hash universal family + mins, band keys) runs as ONE
        # mapInPandas kernel: hashlib.md5 == Spark md5 == DuckDB md5,
        # integer ops are exact (see _minhash_md5_kernel for the
        # per-step JVM-semantics mirror), so the values are identical -
        # but the round-6 plan needed four codegen'd JVM stages with
        # interpreted HOFs (~1.1 s warm at sf0.1, plus their one-shot
        # compile in a fresh JVM); the kernel does it in one Python pass
        # (~0.25 s) with only (lemma, toks) crossing the boundary
        # (guide §4.2).
        sig_block = toks_df.mapInPandas(
            _minhash_md5_kernel(n),
            schema=(
                "lemma string, shingles array<string>, "
                "sigs array<long>, bands array<long>"
            ),
        )
    else:
        cnt = F.size("toks") - (n - 1)
        shingles = F.when(cnt < 1, F.array().cast("array<string>")).otherwise(
            F.transform(
                F.sequence(F.lit(1), F.greatest(cnt, F.lit(1))),
                lambda i: F.array_join(F.slice(F.col("toks"), i, n), " "),
            )
        )
        grams = toks_df.select(
            "lemma", F.array_distinct(shingles).alias("shingles")
        )
        # single nested-HOF signature expression (see linking.add_minhash_bands)
        sigs = F.transform(
            F.sequence(F.lit(0), F.lit(N_HASHES - 1)),
            lambda i: F.array_min(
                F.transform(F.col("shingles"), lambda s: F.hash(s, i))
            ),
        )
        bands = F.transform(
            F.sequence(F.lit(0), F.lit(N_BANDS - 1)),
            lambda b: F.hash(
                b, F.slice(F.col("sigs"), b * rows_per_band + 1, rows_per_band)
            ),
        )
        sig_block = grams.withColumn("sigs", sigs).withColumn("bands", bands)
    # materialize signatures AND the per-doc band-key array in ONE
    # barrier BEFORE the band posexplode: Generate inlines and
    # re-evaluates its expression per exploded element, so without the
    # barrier the 16 array_min signature scans would run once per band
    # (8x) instead of once per doc. Computing the band keys here (a
    # per-doc 8-element array) instead of barriering the exploded rows
    # separately saves one whole materialization job + one copy of the
    # data in executor storage (round-7: two barriers -> one); the
    # explode below reads checkpointed arrays, so re-scanning it costs
    # only the explode itself, never the signature math. This is also
    # the shingle table the verification joins back to.
    from .materialize import barrier_with_count

    # checkpoint name VERSIONED (v2): the round-7 schema adds the
    # per-doc bands array. A durable-mode resume of a pre-round-7
    # "minhash_sigs" checkpoint (no bands column) would fail the
    # posexplode below; under the new name such a dir simply has no
    # _SUCCESS, so the stage recomputes fresh - cross-version resume
    # degrades to recompute instead of crashing, and within-version
    # kill-resume keeps its stable name.
    with_sigs, n_docs = barrier_with_count(sig_block, "minhash_sigs_v2")
    # SKINNY band rows (round-2 verdict): (lemma, band_idx, band_hash)
    # only - the shingle array no longer rides the 8-way explode, the
    # bucket-cap join, or either side of the candidate self-join (~8x of
    # array payload off the biggest shuffles). Candidates fetch shingles
    # once per surviving pair side via the join-back below; same result
    # set by construction.
    banded = with_sigs.select(
        "lemma", F.posexplode("bands").alias("band_idx", "band_hash")
    )
    # skew-capped in-bucket pairs in ONE shuffle of the band rows
    # (round-6 verdict #1; see linking.capped_bucket_pairs)
    from .linking import capped_bucket_pairs

    cand = capped_bucket_pairs(
        banded,
        ["band_idx", "band_hash"],
        F.col("lemma"),
        lambda a, b: a.cast("long") < b.cast("long"),
        MAX_BUCKET,
    ).select(F.col("a").alias("doc_a"), F.col("b").alias("doc_b"))
    from .linking import SMALL_SIG_TABLE_KEYS

    if n_docs <= SMALL_SIG_TABLE_KEYS:
        # size-adaptive verification (round-7, mirrors
        # linking.lsh_candidate_pairs): on a small corpus the candidate
        # barrier + key semi-join + verify-table barrier are two extra
        # materialization jobs protecting re-scans cheaper than the
        # jobs; without the semi-join there is no second consumer of
        # the candidate plan, so nothing executes twice. Identical
        # result set - the reduction only pre-dropped rows the inner
        # joins drop anyway.
        sh = with_sigs.select("lemma", "shingles")
    else:
        # barrier the candidate set BEFORE deriving cand_keys: without
        # it the heaviest stage (capped bucket shuffle + pair explode +
        # dedup, plus the hot-key guard agg feeding its anti-join) runs
        # TWICE - once for the semi-join that builds minhash_verify_sh
        # and again in the final verification join (round-6 advice,
        # medium); then one semi-join cuts the fat shingle table to
        # candidate keys so the per-side joins shuffle candidate-sized
        # tables only
        cand = barrier(cand, "minhash_cand")
        cand_keys = cand.select(
            F.explode(F.array("doc_a", "doc_b")).alias("lemma")
        ).dropDuplicates()
        sh = barrier(
            with_sigs.select("lemma", "shingles").join(cand_keys, "lemma", "left_semi"),
            "minhash_verify_sh",
        )
    cand = cand.join(
        sh.select(F.col("lemma").alias("doc_a"), F.col("shingles").alias("sh_a")),
        "doc_a",
    ).join(
        sh.select(F.col("lemma").alias("doc_b"), F.col("shingles").alias("sh_b")),
        "doc_b",
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    # greatest(union, 1): two EMPTY-shingle docs (null/blank text - a
    # guaranteed population at web scale) share every band key and
    # reach verification with union == 0; under ANSI mode the bare
    # division crashed the task (latent pre-round-7 bug surfaced by
    # the null-text kernel test). 0/1 = 0 < threshold, so such pairs
    # are dropped exactly like the oracle drops them (NaN compare),
    # and every union > 0 pair is numerically unchanged. Same guard
    # as linking.lsh_candidate_pairs.
    return (
        cand.withColumn(
            "jaccard", F.round(inter / F.greatest(union, F.lit(1)), 6)
        )
        .where(F.col("jaccard") >= jaccard)
        .select(
            F.col("doc_a").cast("long").alias("doc_a"),
            F.col("doc_b").cast("long").alias("doc_b"),
            "jaccard",
        )
    )


def minhash_md5_oracle_sql(
    docs2_cte: str, jaccard: float = 0.7, n: int = 3
) -> str:
    """DuckDB mirror of ``minhash_near_dup_pairs(hash_fn='md5')``:
    recomputes the identical shingles, signatures, band keys, bucket cap
    and Jaccard verification. ``docs2_cte`` must define a CTE named
    ``docs2(doc_id, text)`` (e.g. the planted-duplicates union)."""
    from .linking import MAX_BUCKET, N_BANDS, N_HASHES

    rpb = N_HASHES // N_BANDS
    h = lambda expr: f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"
    return f"""
        {docs2_cte}
        , toks AS (
          SELECT doc_id,
                 string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' ') AS toks
          FROM docs2
        ), grams AS (
          SELECT doc_id,
                 list_distinct(CASE WHEN len(toks) - {n - 1} < 1 THEN []::VARCHAR[]
                   ELSE [array_to_string(toks[i:i+{n - 1}], ' ')
                         FOR i IN range(1, greatest(len(toks) - {n - 1}, 1) + 1)]
                 END) AS shingles
          FROM toks
        ), hashed AS (
          SELECT doc_id, shingles,
                 list_transform(shingles, s -> {h('s')} % {MERSENNE_P}) AS sh_h
          FROM grams
        ), sigs AS (
          SELECT doc_id, shingles,
                 list_transform(range(0, {N_HASHES}),
                   i -> list_min(list_transform(sh_h,
                          h -> (h * ((i * 2654435761) % {MERSENNE_P} + 1) + i * 40503 + 7) % {MERSENNE_P}))) AS sigs
          FROM hashed
        ), banded AS (
          SELECT doc_id, b AS band_idx,
                 {h(f"b::VARCHAR || '|' || array_to_string(sigs[{rpb}*b+1:{rpb}*b+{rpb}], ',')")} AS band_hash
          FROM sigs, range(0, {N_BANDS}) t(b)
        ), capped AS (
          SELECT * FROM banded
          QUALIFY count(*) OVER (PARTITION BY band_idx, band_hash) <= {MAX_BUCKET}
        ), cand AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM capped a JOIN capped b
            ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
           AND a.doc_id < b.doc_id
        )
        SELECT doc_a, doc_b,
               round(len(list_intersect(ga.shingles, gb.shingles))
                     / CAST(len(list_distinct(ga.shingles || gb.shingles)) AS DOUBLE), 6) AS jaccard
        FROM cand
        JOIN grams ga ON ga.doc_id = doc_a
        JOIN grams gb ON gb.doc_id = doc_b
        WHERE round(len(list_intersect(ga.shingles, gb.shingles))
                    / CAST(len(list_distinct(ga.shingles || gb.shingles)) AS DOUBLE), 6) >= {jaccard}
    """


def simhash_md5_oracle_sql(
    docs2_cte: str, max_hamming: int = 6, max_bucket: int | None = None
) -> str:
    """DuckDB mirror of ``simhash_near_dup_pairs(hash_fn='md5')``:
    recomputes the 60-bit fingerprints (per-bit majority vote over
    md5-derived token hashes), the 4x15-bit bands, the bucket-size cap
    (QUALIFY over (band_idx, band_val), same as the Spark skew guard),
    and the exact bit_count(xor) hamming verification."""
    from .linking import MAX_BUCKET

    if max_bucket is None:
        max_bucket = MAX_BUCKET
    h = "('0x' || substr(md5(t), 1, 15))::BIGINT"
    vote_bit = (
        f"CASE WHEN coalesce(list_sum(list_transform(hashes, "
        f"h -> CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END)), 0) > 0 "
        f"THEN (1::BIGINT << b) ELSE 0 END"
    )
    return f"""
        {docs2_cte}
        , toks AS (
          SELECT doc_id,
                 string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' ') AS toks
          FROM docs2
        ), hashed AS (
          SELECT doc_id, list_transform(toks, t -> {h}) AS hashes FROM toks
        ), fp AS (
          SELECT doc_id,
                 coalesce(list_sum(list_transform(range(0, 60), b -> {vote_bit})), 0)::BIGINT AS simhash
          FROM hashed
        ), banded AS (
          SELECT doc_id, simhash, b AS band_idx,
                 (simhash >> (15 * b)) & 32767 AS band_val
          FROM fp, range(0, 4) t(b)
          QUALIFY count(*) OVER (PARTITION BY band_idx, band_val) <= {max_bucket}
        ), cand AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 a.simhash AS sim_a, b.simhash AS sim_b
          FROM banded a JOIN banded b
            ON a.band_idx = b.band_idx AND a.band_val = b.band_val
           AND a.doc_id < b.doc_id
        )
        SELECT doc_a, doc_b, bit_count(xor(sim_a, sim_b))::INT AS hamming
        FROM cand WHERE bit_count(xor(sim_a, sim_b)) <= {max_hamming}
    """


def simhash(
    df: DataFrame,
    text_col: str = "text",
    bits: int = 64,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """SimHash over word tokens: sign of the per-bit sum of token
    hashes. Hybrid plan: token hashing stays JVM-side (inside a
    codegen'd transform); the per-bit vote/pack runs as ONE vectorized
    numpy kernel per Arrow batch (the pure-Column version needed 64
    interpreted array scans per row - measured ~4x slower at sf0.1).
    The split is staged through its own select so the hashing transform
    doesn't re-run the regex split per token.

    ``hash_fn="md5"`` derives 60-bit token hashes from md5 so the DuckDB
    oracle can recompute identical fingerprints (pass bits=60)."""
    staged = df.select(
        "doc_id", F.split(_norm(F.col(text_col)), " ").alias("toks")
    )
    if hash_fn == "md5":
        hashes = F.transform(F.col("toks"), lambda w: _md5_long(w))
    else:
        hashes = F.transform(F.col("toks"), lambda w: F.xxhash64(w))

    @pandas_udf(T.LongType())
    def pack_simhash(hs: pd.Series) -> pd.Series:
        # Deliberately per-ROW: each doc's (n_tokens x bits) bit matrix
        # stays cache-resident. Batch-wide vectorizations were measured
        # SLOWER (round 6): one flat (total_tokens x 64) matrix builds
        # 100-250 MB temporaries per 20k-row Arrow batch and goes
        # memory-bandwidth-bound (0.2x), and np.add.reduceat's
        # segment-sum is a non-SIMD per-segment loop (0.6x even via
        # packed unpackbits bytes). The per-row loop is ~50 us/doc and
        # scales linearly with cores - at 4M docs the kernel's CPU
        # parallelizes at ~1.0 efficiency (campaign decomposition in
        # BENCH/BASELINE.md round-6).
        out = np.zeros(len(hs), dtype=np.int64)
        shifts = np.arange(bits, dtype=np.uint64)
        for i, arr in enumerate(hs):
            if arr is None or len(arr) == 0:
                continue
            h = np.asarray(arr, dtype=np.int64).astype(np.uint64)
            # (n_tokens, bits) bit matrix -> per-bit votes in {-1,+1}
            bitmat = ((h[:, None] >> shifts[None, :]) & 1).astype(np.int32)
            votes = (2 * bitmat - 1).sum(axis=0)
            packed = np.uint64(0)
            for b in np.nonzero(votes > 0)[0]:
                packed |= np.uint64(1) << np.uint64(b)
            out[i] = packed.astype(np.int64)
        return pd.Series(out)

    return staged.select("doc_id", pack_simhash(hashes).alias("simhash"))


def simhash_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    max_hamming: int = 6,
    hash_fn: str = "xxhash64",
    max_bucket: int | None = None,
) -> DataFrame:
    """Banded SimHash blocking: 4 bands of bits/4; a pair within hamming
    distance < 4 must agree on at least one band (pigeonhole); verified
    exactly with bit_count(xor). ``hash_fn="md5"`` = 60-bit fingerprints
    recomputable by the DuckDB oracle (simhash_md5_oracle_sql).

    Skew guard (round-4 verdict #2 — the last uncapped quadratic join):
    band values with more than ``max_bucket`` members (default
    linking.MAX_BUCKET) are dropped before the self-join, exactly like
    the MinHash path above. At web scale a degenerate band value is
    GUARANTEED — empty/boilerplate docs share fingerprint bits (an
    all-zero simhash for empty docs is a standing hot key), and one
    such bucket makes the candidate join quadratic. Documented recall
    trade (same as MinHash): members of an over-full bucket can still
    pair through their other 3 bands; a pair agreeing ONLY on a capped
    band is missed. The DuckDB oracle mirrors the cap bit-for-bit."""
    from .linking import MAX_BUCKET

    if max_bucket is None:
        max_bucket = MAX_BUCKET
    bits = 60 if hash_fn == "md5" else 64
    band_bits = bits // 4
    band_mask = (1 << band_bits) - 1
    sh = simhash(df, text_col, bits=bits, hash_fn=hash_fn)
    bands = F.array(
        *[
            F.struct(
                F.lit(i).alias("band_idx"),
                F.shiftright(F.col("simhash"), band_bits * i)
                .bitwiseAND(F.lit(band_mask))
                .alias("band_val"),
            )
            for i in range(4)
        ]
    )
    # materialize the skinny band rows ONCE (same rationale as the
    # minhash path at minhash_bands): the bucket-size guard and BOTH
    # sides of the self-join scan this plan, and without the barrier
    # each scan re-runs the vote/pack kernel + explode (3x the simhash
    # compute; measured as most of the +8.8% the cap initially cost in
    # the round-5 closing A/B)
    banded = barrier(
        sh.select("doc_id", "simhash", F.explode(bands).alias("b")).select(
            "doc_id", "simhash", "b.band_idx", "b.band_val"
        ),
        "simhash_bands",
    )
    # skew-capped in-bucket pairs in ONE shuffle of the band rows: the
    # member struct carries the fingerprint so verification needs no
    # join-back at all (round-6 verdict #1; see linking.capped_bucket_pairs)
    from .linking import capped_bucket_pairs

    cand = capped_bucket_pairs(
        banded,
        ["band_idx", "band_val"],
        F.struct(F.col("doc_id"), F.col("simhash")),
        lambda a, b: a["doc_id"] < b["doc_id"],
        max_bucket,
    ).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.col("a.simhash").alias("sim_a"),
        F.col("b.simhash").alias("sim_b"),
    )
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (
        cand.withColumn("hamming", hamming)
        .where(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def dedup_keep_first(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The materializing form of exact dedup: keep the smallest doc_id
    per content group (window row_number == 1)."""
    w = Window.partitionBy("content_md5").orderBy("doc_id")
    return (
        df.withColumn("content_md5", F.md5(_norm(F.col(text_col))))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )
