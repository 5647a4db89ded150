"""Tokenizer-training and corpus-composition operators (LLM-pipeline tier).

Three ops a tokenizer/data-mixing pipeline runs at corpus scale, each with
an exact DuckDB oracle:

- q228 — SEGMENT-LEVEL corpus dedup (ExactSubstr-style at fixed-window
  granularity): split every document into consecutive 10-word segments,
  keep only the globally-FIRST occurrence of each distinct segment, and
  reassemble the surviving text per document. The within-corpus
  repetition remover that doc-level dedup (q41/q69) cannot express.
- q229 — one BPE MERGE STEP at word granularity: exact global
  adjacent-pair counts, deterministic best-pair selection
  (count DESC, pair ASC), and greedy left-to-right application — the
  inner loop of tokenizer training, with the x==x overlap case handled
  by run-length arithmetic instead of naive pair counts.
- q231 — TEMPERATURE-BASED source mixing (α = 0.5): per-source sampling
  weights ∝ √tokens, the standard up-weighting of small sources when
  composing a training mix. √ is IEEE-correctly-rounded in both engines,
  so the ppm-quantized weights are exact; shares divide in int64.

Reference tie-in: the per-source composition report mirrors the
reference's lakehouse audit rollups (`scripts/audit_lakehouse.py`), and
segment dedup generalizes its silver dedup pass
(`scripts/deduplicate_silver.py`) from row-PK to content-window keys.

House parity rules (README "Numeric-parity"): single-space split both
sides, windows carry (doc_id, seg_idx) total tiebreaks, weights quantize
through floor before any division.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from hoops_edge_database_etl_spark.queries import query
from hoops_edge_database_etl_spark.tables import load

SEG = 10  # words per dedup segment


@query(
    "q228_segment_dedup",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS l FROM documents
    ),
    segs AS (
      SELECT doc_id, t.j AS seg_idx,
             array_to_string(l[t.j*{SEG}+1 : t.j*{SEG}+{SEG}], ' ') AS seg
      FROM d, unnest(generate_series(0, CAST(ceil(len(l)/{SEG}.0) AS INT) - 1)) AS t(j)
    ),
    ranked AS (
      SELECT doc_id, seg_idx, seg,
             ROW_NUMBER() OVER (PARTITION BY seg ORDER BY doc_id, seg_idx) AS rn
      FROM segs
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_segments,
           CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           COALESCE(string_agg(CASE WHEN rn = 1 THEN seg END, ' ' ORDER BY seg_idx), '')
             AS kept_text
    FROM ranked
    GROUP BY doc_id
    """,
)
def q228_segment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-corpus segment dedup (the coarse-grained ExactSubstr pass):
    each doc becomes ⌈n/10⌉ consecutive 10-word segments built ARRAY-SIDE
    (transform over a sequence + slice — zero shuffle, no groupBy to
    reassemble what was just exploded); the global first-occurrence rank
    is ONE window keyed by segment content (shuffle on seg hash — by
    construction near-uniform, duplicate groups are the skew and they're
    exactly what the operator removes); reassembly sorts the surviving
    (seg_idx, seg) structs per doc. At 100 TB this is the plan you want:
    one content-keyed exchange + one doc-keyed exchange, both columnar,
    no Python. Doc-level dedup (q41) can never catch a duplicated
    paragraph pasted into distinct docs — this does."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("l")
    )
    nseg = F.ceil(F.size("l") / F.lit(SEG)).cast("int")
    segs = d.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), nseg - 1),
                lambda j: F.array_join(F.slice("l", j * SEG + 1, SEG), " "),
            )
        ).alias("seg_idx", "seg"),
    )
    w = Window.partitionBy("seg").orderBy("doc_id", "seg_idx")
    ranked = segs.withColumn("rn", F.row_number().over(w))
    return ranked.groupBy(F.col("doc_id").cast("bigint").alias("doc_id")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_segments"),
        F.sum(F.when(F.col("rn") == 1, 1).otherwise(0)).cast("bigint").alias("n_kept"),
        F.coalesce(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("rn") == 1, F.struct("seg_idx", "seg")
                            )
                        )
                    ),
                    lambda s: s.seg,
                ),
                " ",
            ),
            F.lit(""),
        ).alias("kept_text"),
    )


@query(
    "q229_bpe_merge_step",
    oracle="""
    WITH toks AS (
      SELECT doc_id, source, string_split(text, ' ') AS l FROM documents
    ),
    pos AS (
      SELECT doc_id, source, t.i AS i, l[t.i] AS w, l[t.i + 1] AS nxt
      FROM toks, unnest(generate_series(1, len(l))) AS t(i)
    ),
    pairs AS (
      SELECT w AS w1, nxt AS w2, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM pos WHERE nxt IS NOT NULL GROUP BY w, nxt
    ),
    mx AS (SELECT MAX(cnt) AS max_cnt FROM pairs),
    best AS (
      SELECT MIN(struct_pack(w1 := w1, w2 := w2)) AS p
      FROM pairs, mx WHERE cnt = max_cnt
    ),
    chosen AS (SELECT p.w1 AS bw1, p.w2 AS bw2 FROM best),
    runs AS (
      SELECT doc_id, source,
             i - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i) AS grp
      FROM pos, chosen WHERE w = bw1 AND bw1 = bw2
    ),
    run_merges AS (
      SELECT doc_id, source, CAST(COUNT(*) / 2 AS BIGINT) AS m
      FROM runs GROUP BY doc_id, source, grp
    ),
    doc_merges AS (
      SELECT doc_id, source,
             CASE WHEN (SELECT bw1 FROM chosen) = (SELECT bw2 FROM chosen)
                  THEN COALESCE((SELECT SUM(m) FROM run_merges r
                                 WHERE r.doc_id = p0.doc_id), 0)
                  ELSE SUM(CASE WHEN w = (SELECT bw1 FROM chosen)
                                 AND nxt = (SELECT bw2 FROM chosen)
                            THEN 1 ELSE 0 END)
             END AS n_merges,
             CAST(COUNT(*) AS BIGINT) AS n_tokens
      FROM pos p0 GROUP BY doc_id, source
    )
    SELECT source,
           (SELECT bw1 FROM chosen) AS pair_left,
           (SELECT bw2 FROM chosen) AS pair_right,
           CAST(SUM(n_tokens) AS BIGINT) AS tokens_before,
           CAST(SUM(n_merges) AS BIGINT) AS n_merges,
           CAST(SUM(n_tokens) - SUM(n_merges) AS BIGINT) AS tokens_after
    FROM doc_merges GROUP BY source
    """,
)
def q229_bpe_merge_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One BPE merge step at word granularity — the tokenizer-training
    inner loop, fully declarative:

    1. EXACT global pair counts: zip each token array with its own tail
       (arrays_zip over slices — built in the scan projection, no
       shuffle), explode, one map-side-combining hash aggregate.
    2. DETERMINISTIC selection: scalar MAX(count) broadcasts back; among
       the tied pairs, MIN(struct(w1,w2)) — associative aggregates only,
       never a single-partition ORDER BY 1 sort of the vocab² table.
    3. GREEDY application arithmetic: for a chosen pair (x,y), x≠y
       occurrences cannot overlap, so merges = adjacency count; x==y
       merges are ⌊run/2⌋ summed over maximal runs (gaps-and-islands per
       doc — the doc-bounded window). The naive pair count would
       over-merge "x x x" as 2; the run formula says 1, which is what
       greedy left-to-right BPE does.

    Output is the per-source before/after token accounting a tokenizer
    budget report needs. At 100 TB: two fact passes (pair agg, apply),
    both combiner-friendly; the chosen pair is a 1-row broadcast."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", "source", F.split("text", " ").alias("l")
    )
    n = F.size("l")
    pairs = (
        d.select(
            F.explode(
                F.arrays_zip(
                    F.slice("l", 1, n - 1).alias("w1"),
                    F.slice("l", 2, n - 1).alias("w2"),
                )
            ).alias("p")
        )
        .groupBy(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    mx = pairs.agg(F.max("cnt").alias("max_cnt"))
    chosen = (
        pairs.crossJoin(F.broadcast(mx))
        .filter(F.col("cnt") == F.col("max_cnt"))
        .agg(F.min(F.struct("w1", "w2")).alias("p"))
        .select(F.col("p.w1").alias("bw1"), F.col("p.w2").alias("bw2"))
    )
    # Application phase is ENTIRELY array-side (zero shuffle beyond the
    # 1-row broadcast): adjacency count via filter over the zipped pairs;
    # the x==y case via a left-to-right fold (F.aggregate) that tallies
    # ⌊run/2⌋ per maximal run — both stay in whole-stage codegen, no
    # posexplode + per-token window (the first cut's 20s-at-sf0.01 sin).
    j = d.crossJoin(F.broadcast(chosen))
    zipped = F.arrays_zip(
        F.slice("l", 1, F.size("l") - 1).alias("w1"),
        F.slice("l", 2, F.size("l") - 1).alias("w2"),
    )
    adj = F.size(
        F.filter(
            zipped,
            lambda p: (p.w1 == F.col("bw1")) & (p.w2 == F.col("bw2")),
        )
    ).cast("bigint")
    # Fold state (merges_so_far, current_run_len); sentinel "" flushes the
    # final run (documents are single-space-joined words, never empty).
    run_calc = F.aggregate(
        F.concat("l", F.array(F.lit(""))),
        F.struct(
            F.lit(0).cast("bigint").alias("m"), F.lit(0).cast("bigint").alias("r")
        ),
        lambda acc, tok: F.when(
            tok == F.col("bw1"),
            F.struct(acc.m.alias("m"), (acc.r + 1).alias("r")),
        ).otherwise(
            F.struct(
                (acc.m + F.floor(acc.r / 2)).cast("bigint").alias("m"),
                F.lit(0).cast("bigint").alias("r"),
            )
        ),
        lambda acc: acc.m,
    )
    per_doc = j.select(
        "source",
        F.size("l").cast("bigint").alias("n_tokens"),
        F.when(F.col("bw1") == F.col("bw2"), run_calc).otherwise(adj).alias("n_merges"),
        "bw1",
        "bw2",
    )
    return per_doc.groupBy("source").agg(
        F.first("bw1").alias("pair_left"),
        F.first("bw2").alias("pair_right"),
        F.sum("n_tokens").cast("bigint").alias("tokens_before"),
        F.sum("n_merges").cast("bigint").alias("n_merges"),
        (F.sum("n_tokens") - F.sum("n_merges")).cast("bigint").alias("tokens_after"),
    )


@query(
    "q231_temperature_mix",
    oracle="""
    WITH src AS (
      SELECT source,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source
    ),
    wts AS (
      SELECT source, n_tokens,
             CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000) AS BIGINT)
               AS weight_ppm
      FROM src
    ),
    tot AS (SELECT CAST(SUM(weight_ppm) AS BIGINT) AS total_w FROM wts)
    SELECT source, n_tokens, weight_ppm,
           CAST(weight_ppm * 1000000 // total_w AS BIGINT) AS share_ppm
    FROM wts, tot
    """,
)
def q231_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based training-mix composition (α = 0.5): source
    sampling weight ∝ tokens^α — the standard flattening that keeps
    small high-quality sources from drowning at natural proportions.
    Exactness: token counts are integers; √ is correctly-rounded IEEE in
    both engines (the ONLY transcendental the parity rules admit, same
    as q108's vector norms); ×1e6 + floor quantizes BEFORE any division;
    shares are int64 floor-division against the exact integer weight
    total. One grouped aggregate over the corpus + a 1-row broadcast —
    the report is |sources|-bounded at any scale."""
    d = load(spark, sf_dir, "documents")
    src = d.groupBy("source").agg(
        F.sum(F.size(F.split("text", " "))).cast("bigint").alias("n_tokens")
    )
    wts = src.withColumn(
        "weight_ppm",
        F.floor(F.sqrt(F.col("n_tokens").cast("double")) * 1000000).cast("bigint"),
    )
    tot = wts.agg(F.sum("weight_ppm").cast("bigint").alias("total_w"))
    return wts.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_tokens",
        "weight_ppm",
        F.expr("CAST(weight_ppm * 1000000 DIV total_w AS BIGINT)").alias("share_ppm"),
    )


@query(
    "q233_regex_pretokenize",
    oracle="""
    WITH toks AS (
      SELECT unnest(regexp_extract_all(props, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS tok
      FROM events
    )
    SELECT tok,
           CASE WHEN regexp_matches(tok, '^[a-z]+$') THEN 'word'
                WHEN regexp_matches(tok, '^[0-9]+$') THEN 'number'
                ELSE 'punct' END AS kind,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM toks GROUP BY tok, kind
    """,
)
def q233_regex_pretokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex PRE-TOKENIZER (the GPT-2-style first pass before BPE):
    letter runs, digit runs, and single punctuation marks become
    separate pre-tokens — run here over the JSON props strings, the one
    mixed-charset column in the testdata. The pattern is deliberately
    ASCII-class-only so Java regex (Spark) and RE2 (DuckDB) agree
    byte-for-byte; the branches match disjoint character classes, so
    leftmost-first vs leftmost-longest alternation cannot diverge
    either. Plan: regexp_extract_all in the scan projection (codegen),
    explode, one combiner-friendly hash aggregate — the vocabulary
    histogram every tokenizer-training run starts with. At 100 TB the
    output is vocab-bounded; the explode is the only row expansion and
    it carries a single short string column."""
    ev = load(spark, sf_dir, "events")
    toks = ev.select(
        F.explode(
            F.regexp_extract_all("props", F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), 0)
        ).alias("tok")
    )
    kind = (
        F.when(F.col("tok").rlike("^[a-z]+$"), "word")
        .when(F.col("tok").rlike("^[0-9]+$"), "number")
        .otherwise("punct")
    )
    return toks.groupBy("tok", kind.alias("kind")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )


@query(
    "q234_kn_continuation_counts",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS l FROM documents
    ),
    bg AS (
      SELECT l[t.i] AS w1, l[t.i + 1] AS w2
      FROM toks, unnest(generate_series(1, len(l) - 1)) AS t(i)
    ),
    c AS (
      SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c FROM bg GROUP BY w1, w2
    ),
    pre AS (
      SELECT w1, CAST(COUNT(*) AS BIGINT) AS n1plus_prefix FROM c GROUP BY w1
    ),
    cont AS (
      SELECT w2, CAST(COUNT(*) AS BIGINT) AS n1plus_cont FROM c GROUP BY w2
    )
    SELECT c.w1, c.w2, c.c, pre.n1plus_prefix, cont.n1plus_cont
    FROM c
    JOIN pre ON pre.w1 = c.w1
    JOIN cont ON cont.w2 = c.w2
    """,
)
def q234_kn_continuation_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kneser–Ney COUNT TABLES — the exact-integer statistics an n-gram
    LM trainer needs: raw bigram counts c(w1,w2), prefix type counts
    N1+(w1·) (distinct continuations of w1 — the backoff normalizer),
    and continuation type counts N1+(·w2) (distinct histories of w2 —
    the KN unigram replacement that fixes 'Francisco' getting high
    unigram mass). All three derive from ONE bigram aggregate: the type
    counts aggregate the |vocab²|-bounded count table, not the corpus,
    so the fact scan happens exactly once. Bigrams come from the same
    arrays_zip-in-projection trick as q229 — no posexplode windows. The
    smoothing arithmetic itself (discount D = n1/(n1+2n2)) is a trivial
    epilogue over these integers; emitting the tables keeps every column
    oracle-exact."""
    d = load(spark, sf_dir, "documents").select(F.split("text", " ").alias("l"))
    n = F.size("l")
    bg = d.select(
        F.explode(
            F.arrays_zip(
                F.slice("l", 1, n - 1).alias("w1"),
                F.slice("l", 2, n - 1).alias("w2"),
            )
        ).alias("p")
    ).select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    c = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    pre = c.groupBy("w1").agg(
        F.count(F.lit(1)).cast("bigint").alias("n1plus_prefix")
    )
    cont = c.groupBy("w2").agg(
        F.count(F.lit(1)).cast("bigint").alias("n1plus_cont")
    )
    return c.join(F.broadcast(pre), "w1").join(F.broadcast(cont), "w2").select(
        "w1", "w2", "c", "n1plus_prefix", "n1plus_cont"
    )


@query(
    "q242_feature_hashing",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    hashed AS (
      SELECT doc_id,
             CAST(CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) % 64 AS BIGINT)
               AS bucket,
             CASE WHEN strpos('01234567', substr(md5(tok), 16, 1)) > 0
                  THEN 1 ELSE -1 END AS sgn
      FROM toks
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id, bucket,
           CAST(SUM(sgn) AS BIGINT) AS weight
    FROM hashed GROUP BY doc_id, bucket
    """,
)
def q242_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FEATURE HASHING (the hashing trick): every token maps to one of
    64 buckets by md5, with a ±1 sign drawn from an independent md5
    nibble so collisions cancel in expectation — the fixed-width,
    vocabulary-free featurization linear models and wide-and-deep
    inputs use when the vocab is unbounded. Output is the sparse
    (doc, bucket, weight) triplet table. Everything is integer: the
    60-bit hash, the modulo, the signed sum — bit-identical in both
    engines (the q72 hash-derivation rule). One explode + one
    (doc, bucket)-keyed combiner aggregate; no vocabulary table ever
    materializes, which is the entire point at 100 TB."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    )
    h60 = F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("long")
    sgn = F.when(
        F.substring(F.md5("tok"), 16, 1).isin(*"01234567"), 1
    ).otherwise(-1)
    return (
        d.select(
            "doc_id", (h60 % 64).cast("bigint").alias("bucket"), sgn.alias("sgn")
        )
        .groupBy(F.col("doc_id").cast("bigint").alias("doc_id"), "bucket")
        .agg(F.sum("sgn").cast("bigint").alias("weight"))
    )


@query(
    "q245_length_bucketed_batching",
    oracle="""
    WITH d AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
             CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':shard'), 1, 8)
                  AS BIGINT) % 8 AS BIGINT) AS shard
      FROM documents
    ),
    ranked AS (
      SELECT doc_id, n_tok, shard,
             CAST(n_tok // 16 AS BIGINT) AS band,
             ROW_NUMBER() OVER (PARTITION BY n_tok // 16, shard
                                ORDER BY n_tok DESC, doc_id) AS rn
      FROM d
    )
    SELECT band, shard,
           CAST((rn - 1) // 8 AS BIGINT) AS batch_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MAX(n_tok) AS BIGINT) AS max_len,
           CAST(SUM(n_tok) AS BIGINT) AS tokens,
           CAST(MAX(n_tok) * COUNT(*) - SUM(n_tok) AS BIGINT) AS padding_waste
    FROM ranked
    GROUP BY band, shard, (rn - 1) // 8
    """,
)
def q245_length_bucketed_batching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LENGTH-BUCKETED BATCHING — the padding-efficiency step of a
    training data loader: group sequences into 16-token length bands,
    sort within band (descending, doc_id tiebreak), cut batches of 8,
    and report each batch's padding waste (max_len·n − Σlen — the
    tokens the GPU pads and throws away). Random batching wastes up to
    the band width per row; length bucketing bounds waste to the
    within-batch length spread. Scale honesty: the within-band sort is
    SHARDED by a stable doc hash (8 shards here ≈ data-loader workers)
    so no band ever needs a global sort — the same
    bounded-partition-state rule as q74's range-partitioned packing;
    waste statistics are unbiased across shards because the hash is
    independent of length. All-integer arithmetic end to end."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tok"),
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":shard"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            % 8
        ).alias("shard"),
    )
    w = Window.partitionBy("band", "shard").orderBy(F.col("n_tok").desc(), "doc_id")
    ranked = d.withColumn("band", F.floor(F.col("n_tok") / 16).cast("bigint")).withColumn(
        "rn", F.row_number().over(w)
    )
    return (
        ranked.withColumn(
            "batch_id", F.floor((F.col("rn") - 1) / 8).cast("bigint")
        )
        .groupBy("band", "shard", "batch_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.max("n_tok").cast("bigint").alias("max_len"),
            F.sum("n_tok").cast("bigint").alias("tokens"),
            (F.max("n_tok") * F.count(F.lit(1)) - F.sum("n_tok"))
            .cast("bigint")
            .alias("padding_waste"),
        )
    )


@query(
    "q260_prefix_cache_analysis",
    oracle="""
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS l FROM documents
    ),
    per_depth AS (
      SELECT t.k AS depth,
             array_to_string(l[1 : t.k], ' ') AS prefix
      FROM d, unnest([5, 10]) AS t(k)
      WHERE len(l) >= t.k
    ),
    grouped AS (
      SELECT depth, prefix, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM per_depth GROUP BY depth, prefix
    )
    SELECT CAST(depth AS BIGINT) AS depth,
           CAST(COUNT(*) AS BIGINT) AS n_prefix_groups,
           CAST(SUM(CASE WHEN n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_shared_groups,
           CAST(SUM(n_docs) AS BIGINT) AS n_docs_covered,
           CAST(SUM((n_docs - 1) * depth) AS BIGINT) AS cacheable_tokens
    FROM grouped GROUP BY depth
    """,
)
def q260_prefix_cache_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHARED-PREFIX (prompt-cache) analysis — how many tokens an
    inference server's prefix cache saves at each cache depth: group
    requests by their first-k tokens (k = 5, 10); every document after
    the first in a group reuses k cached tokens, so the saving is
    Σ(group−1)·k. This is the capacity-planning query behind KV-cache
    sharing / RadixAttention deployments — run it before sizing the
    cache tier. Plan: prefixes built array-side (slice in the scan
    projection, one row per requested depth — no explosion beyond
    |depths|×), one prefix-keyed combiner aggregate, then a tiny
    per-depth rollup. Prefix-key skew IS the signal: the hot prefix
    groups are exactly the cache hits being counted."""
    d = load(spark, sf_dir, "documents").select(F.split("text", " ").alias("l"))
    per_depth = d.select(
        F.explode(
            F.filter(
                F.transform(
                    F.array(F.lit(5), F.lit(10)),
                    lambda k: F.when(
                        F.size("l") >= k,
                        F.struct(
                            k.cast("bigint").alias("depth"),
                            F.array_join(F.slice("l", 1, k), " ").alias("prefix"),
                        ),
                    ),
                ),
                lambda s: s.isNotNull(),
            )
        ).alias("p")
    ).select(F.col("p.depth").alias("depth"), F.col("p.prefix").alias("prefix"))
    grouped = per_depth.groupBy("depth", "prefix").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    return grouped.groupBy("depth").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_prefix_groups"),
        F.sum(F.when(F.col("n_docs") > 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_shared_groups"),
        F.sum("n_docs").cast("bigint").alias("n_docs_covered"),
        F.sum((F.col("n_docs") - 1) * F.col("depth"))
        .cast("bigint")
        .alias("cacheable_tokens"),
    )


@query(
    "q267_repeat_factor_manifest",
    oracle="""
    WITH src AS (
      SELECT source,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
             CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY source
    ),
    wts AS (
      SELECT source, n_docs,
             CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000) AS BIGINT) AS w
      FROM src
    ),
    tot AS (SELECT CAST(SUM(w) AS BIGINT) AS tw FROM wts),
    quota AS (
      SELECT source, n_docs,
             CAST(1000 * w // tw AS BIGINT) AS base_copies,
             CAST(1000 * w % tw AS BIGINT) AS rem
      FROM wts, tot
    ),
    topped AS (
      SELECT source, n_docs, base_copies,
             CASE WHEN ROW_NUMBER() OVER (ORDER BY rem DESC, source)
                       <= 1000 - (SELECT SUM(base_copies) FROM quota)
                  THEN base_copies + 1 ELSE base_copies END AS target_copies
      FROM quota
    ),
    docs AS (
      SELECT d.doc_id, d.source, t.target_copies, t.n_docs,
             ROW_NUMBER() OVER (
               PARTITION BY d.source
               ORDER BY md5(CAST(d.doc_id AS VARCHAR) || ':rep'), d.doc_id
             ) AS hrank
      FROM documents d JOIN topped t ON t.source = d.source
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
           CAST(target_copies // n_docs
                + CASE WHEN hrank <= target_copies % n_docs THEN 1 ELSE 0 END
             AS BIGINT) AS n_copies
    FROM docs
    """,
)
def q267_repeat_factor_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EPOCH REPEAT-FACTOR MANIFEST — materialize the per-document copy
    counts a training loader actually reads: the q231 temperature
    weights become a 1000-copy budget via LARGEST-REMAINDER
    apportionment (floor quotas + the leftover copies to the biggest
    remainders — the seat-allocation algorithm, exact in int64, Σ ≡
    budget by construction), then each source's quota spreads over its
    documents by stable hash rank (base copies each, +1 for the first
    `quota mod n_docs` docs in hash order — deterministic fractional
    epochs, the reason a 2.3-epoch source reproduces exactly across
    reruns). Windows: one over the 20-row source table, one per-source
    hash rank (the q73 stratified machinery). The loader consumes this
    manifest verbatim; Σ n_copies per source equals its quota exactly
    (test)."""
    d = load(spark, sf_dir, "documents")
    src = d.groupBy("source").agg(
        F.sum(F.size(F.split("text", " "))).cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
    )
    wts = src.select(
        "source",
        "n_docs",
        F.floor(F.sqrt(F.col("n_tokens").cast("double")) * 1000000)
        .cast("bigint")
        .alias("w"),
    )
    # 20-row weight table read by the total and the quota projection;
    # the quota by the shortfall and the topped ranks — checkpoint both
    # so the corpus token-count scan runs once (r11 fact-rescan audit:
    # 5 scans -> 2, weights + the doc-level spread)
    wts = wts.localCheckpoint(eager=False)
    tot = wts.agg(F.sum("w").cast("bigint").alias("tw"))
    quota = wts.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        F.expr("CAST(1000 * w DIV tw AS BIGINT)").alias("base_copies"),
        F.expr("CAST(1000 * w % tw AS BIGINT)").alias("rem"),
    )
    quota = quota.localCheckpoint(eager=False)
    short = quota.agg(
        (F.lit(1000) - F.sum("base_copies")).cast("bigint").alias("short")
    )
    wr = Window.orderBy(F.col("rem").desc(), "source")
    topped = (
        quota.crossJoin(F.broadcast(short))
        .withColumn("rr", F.row_number().over(wr))
        .select(
            "source",
            "n_docs",
            F.when(F.col("rr") <= F.col("short"), F.col("base_copies") + 1)
            .otherwise(F.col("base_copies"))
            .alias("target_copies"),
        )
    )
    wh = Window.partitionBy("source").orderBy(
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":rep"))), "doc_id"
    )
    docs = d.select("doc_id", "source").join(F.broadcast(topped), "source").withColumn(
        "hrank", F.row_number().over(wh)
    )
    return docs.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "source",
        (
            F.expr("CAST(target_copies DIV n_docs AS BIGINT)")
            + F.when(
                F.col("hrank") <= F.expr("target_copies % n_docs"), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_copies"),
    )


@query(
    "q384_tokenizer_fertility",
    oracle="""
    WITH per_doc AS (
      SELECT lang,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS words,
             CAST(len(regexp_extract_all(text,
                  '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS subtoks,
             CAST(strlen(text) AS BIGINT) AS bytes
      FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(words) AS BIGINT) AS words,
           CAST(SUM(subtoks) AS BIGINT) AS subtokens,
           CAST(SUM(subtoks) AS DOUBLE) / SUM(words) AS fertility,
           CAST(SUM(bytes) AS DOUBLE) / SUM(subtoks) AS bytes_per_subtoken
    FROM per_doc GROUP BY lang
    """,
)
def q384_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOKENIZER FERTILITY — subtokens per word, the multilingual-cost
    metric every tokenizer paper reports: a language whose words
    shatter into many pieces pays proportionally more context window,
    more latency, and more per-token billing for the SAME content (the
    known inequity of English-centric vocabularies). Here the q233
    regex pre-tokenizer plays the subword tokenizer over the corpus
    text, whitespace words are the denominator (q51's rule), and
    bytes-per-subtoken completes the q305 accounting chain
    (bytes→chars→words→subtokens). Integer sums with the two ratios
    divided once at the edge — re-blendable across shards. This is
    the measurement that decides whether a vocabulary retrain (q229's
    BPE step) is worth the migration; the property test checks
    fertility >= the punctuation floor and that the q305 byte chain
    reconciles."""
    d = load(spark, sf_dir, "documents")
    per_doc = d.select(
        "lang",
        F.size(F.split("text", " ")).cast("long").alias("words"),
        F.size(
            F.regexp_extract_all("text", F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), 0)
        )
        .cast("long")
        .alias("subtoks"),
        F.octet_length("text").cast("long").alias("bytes"),
    )
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("words").cast("bigint").alias("words"),
        F.sum("subtoks").cast("bigint").alias("subtokens"),
        (F.sum("subtoks").cast("double") / F.sum("words")).alias("fertility"),
        (F.sum("bytes").cast("double") / F.sum("subtoks")).alias(
            "bytes_per_subtoken"
        ),
    )
