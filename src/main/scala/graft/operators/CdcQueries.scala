package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Driver-contract queries for the CDC surface (SURVEY.md §2.2-2.4), run over
  * the `documents` table's text bytes. Chunk parameters are sized to the
  * ~300-byte synthetic documents (expected 64 B chunks) — same algorithms and
  * constants-formulas as the 16 KiB reference experiment (`main.rs:18`), just a
  * smaller expected size.
  *
  * The fixed chunker emits an exact ANSI-SQL oracle (pure arithmetic). The
  * content-defined chunkers (AE/FastCDC/Rabin) have no SQL equivalent — the
  * driver records rows-only checks for them; their correctness gate is
  * ChunkerSpec/ChunkingSpec against the core ground truth.
  */
object CdcQueries {

  private val ExpectedSize = 64
  private val Seed = 42L
  // AE repo-variant window must be > 0 => expected > 256; with ~300-byte docs we
  // use the paper-variant window for a meaningful cut rate (SURVEY.md C3 keeps
  // the repo variant as default and the paper formula behind a flag — both are
  // exercised in tests; this query uses paper sizing for non-degenerate output).
  private val AeWindow = 37 // round(64 / (e-1)) — AeChunker.paper(64)

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)

  private def chunkCols(df: DataFrame): DataFrame =
    df.select(
      col("id").as("doc_id"),
      col("chunk_idx"),
      col("offset").cast("long").as("offset"),
      col("length").cast("long").as("length"))
      .orderBy("doc_id", "chunk_idx")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cdc_fixed_chunks" -> ((s, dir) =>
      chunkCols(Chunking.chunkTable(docs(s, dir), "doc_id", "text", "fixed", ExpectedSize))),

    "cdc_ae_chunks" -> ((s, dir) =>
      chunkCols(
        Chunking.chunkTable(
          docs(s, dir).select(col("doc_id"), col("text")), "doc_id", "text", "ae", AeWindow + 256))),

    "cdc_fastcdc_chunks" -> ((s, dir) =>
      chunkCols(Chunking.chunkTable(docs(s, dir), "doc_id", "text", "fastcdc", ExpectedSize, Seed))),

    "cdc_rabin_chunks" -> ((s, dir) =>
      chunkCols(Chunking.chunkTable(docs(s, dir), "doc_id", "text", "rabin", ExpectedSize, Seed))),

    // Flagship: the reference experiment's (COEFF, AVG) metrics per algorithm
    // (`main.rs:23`, `ae.rs:91`) over the whole corpus in one distributed pass.
    "cdc_dedup_metrics" -> ((s, dir) => {
      val d = docs(s, dir)
      val perAlgo = Seq(
        "fixed"   -> Chunking.chunkTable(d, "doc_id", "text", "fixed", ExpectedSize),
        "ae"      -> Chunking.chunkTable(d, "doc_id", "text", "ae", AeWindow + 256),
        "fastcdc" -> Chunking.chunkTable(d, "doc_id", "text", "fastcdc", ExpectedSize, Seed),
        "rabin"   -> Chunking.chunkTable(d, "doc_id", "text", "rabin", ExpectedSize, Seed)
      ).map { case (algo, chunks) =>
        Chunking.dedupMetrics(chunks).withColumn("algo", lit(algo))
      }
      perAlgo.reduce(_ unionByName _)
        .select("algo", "unique_bytes", "total_bytes", "distinct_chunks", "chunk_count",
          "dedup_coeff", "avg_chunk_size")
        .orderBy("algo")
    }),

    // The native Generator driven end-to-end from SQL (LATERAL VIEW), with
    // the fixed algorithm so the cut points carry an exact arithmetic oracle.
    "cdc_chunks_generator_sql" -> ((s, dir) => {
      graft.plans.GraftExtensions.register(s)
      docs(s, dir).createOrReplaceTempView("cdc_docs_v")
      s.sql(
        s"""SELECT d.doc_id, c.chunk_idx,
           |  CAST(c.offset AS BIGINT) AS offset, CAST(c.length AS BIGINT) AS length
           |FROM cdc_docs_v d
           |LATERAL VIEW cdc_chunks(encode(d.text, 'utf-8'), 'fixed', $ExpectedSize, 0) c
           |ORDER BY doc_id, chunk_idx""".stripMargin)
    }),

    // Per-document dedup metrics (A2/A3 grouped by id) over fixed chunking —
    // fixed boundaries are pure arithmetic, so chunk *content* is
    // SQL-computable and the whole metric pipeline has an exact oracle.
    "cdc_fixed_dedup_per_doc" -> ((s, dir) =>
      Chunking.dedupMetricsPerId(
        Chunking.chunkTable(docs(s, dir), "doc_id", "text", "fixed", ExpectedSize))
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")),

    // Strategy-A parallel chunking (overlapped segments + min-distance merge,
    // SURVEY.md P1) as a distributed query.
    "cdc_segmented_ae" -> ((s, dir) =>
      chunkCols(
        Chunking.segmentedChunkTable(
          docs(s, dir), "doc_id", "text", "ae", AeWindow + 256, segments = 4))),

    // Corpus-level metrics over fixed chunking — the one algorithm whose cut
    // points are pure arithmetic, so the WHOLE reference experiment
    // (scan → chunk → hash-dedup → COEFF/AVG, `main.rs:16-24`) gets an exact
    // end-to-end DuckDB oracle instead of a rows-only check.
    "cdc_fixed_dedup_metrics" -> ((s, dir) =>
      Chunking.dedupMetrics(
        Chunking.chunkTable(docs(s, dir), "doc_id", "text", "fixed", ExpectedSize))),

    // The reference experiment's parameter sweep (`main.rs:18` varies n):
    // corpus dedup metrics at several expected sizes in one distributed
    // query — fixed algorithm, so the whole sweep carries an exact oracle.
    "cdc_fixed_size_sweep" -> ((s, dir) => {
      val d = docs(s, dir)
      Seq(32, 64, 128).map { sz =>
        Chunking.dedupMetrics(Chunking.chunkTable(d, "doc_id", "text", "fixed", sz))
          .withColumn("expected_size", lit(sz.toLong))
      }.reduce(_ unionByName _)
        .select("expected_size", "unique_bytes", "total_bytes", "distinct_chunks",
          "chunk_count", "dedup_coeff", "avg_chunk_size")
        .orderBy("expected_size")
    }),

    // Change detection over fixed chunks: like cdc_change_detection below but
    // SQL-mirrorable end-to-end (substr chunking + anti-join diff), so the
    // CDC north-star path is hash-checked by the driver, not rows-only.
    "cdc_fixed_change_detection" -> ((s, dir) => {
      val v1 = docs(s, dir).select(col("doc_id"), col("text"))
      val v2 = v1.withColumn(
        "text",
        when(col("doc_id") % 3 === 0, regexp_replace(col("text"), "data", "DATA"))
          .otherwise(col("text")))
      val c1 = Chunking.chunkTable(v1, "doc_id", "text", "fixed", ExpectedSize)
      val c2 = Chunking.chunkTable(v2, "doc_id", "text", "fixed", ExpectedSize)
      Chunking.chunkDiff(c1, c2)
        .groupBy(col("id").as("doc_id"))
        .pivot("change", Seq("added", "removed"))
        .count()
        .na.fill(0L)
        .orderBy("doc_id")
    }),

    // Strategy-B parallel chunking (edge re-chunking partial+final,
    // SURVEY.md P3-P7) as a distributed per-doc metrics query. No SQL
    // oracle (content-defined cuts); contract-tested against the core
    // ground truth in ChunkingSpec.
    "cdc_edge_rechunk_metrics" -> ((s, dir) =>
      Chunking.edgeRechunkMetricsPerBlob(
        docs(s, dir), "doc_id", "text", "fastcdc", ExpectedSize, Seed, parts = 4)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")),

    // CDC as change detection: simulate a v2 corpus (every 3rd doc edited),
    // chunk both versions, report per-doc added/removed chunk counts.
    "cdc_change_detection" -> ((s, dir) => {
      val v1 = docs(s, dir).select(col("doc_id"), col("text"))
      val v2 = v1.withColumn(
        "text",
        when(col("doc_id") % 3 === 0, regexp_replace(col("text"), "data", "DATA"))
          .otherwise(col("text")))
      val c1 = Chunking.chunkTable(v1, "doc_id", "text", "fastcdc", ExpectedSize, Seed)
      val c2 = Chunking.chunkTable(v2, "doc_id", "text", "fastcdc", ExpectedSize, Seed)
      Chunking.chunkDiff(c1, c2)
        .groupBy(col("id").as("doc_id"))
        .pivot("change", Seq("added", "removed"))
        .count()
        .na.fill(0L)
        .orderBy("doc_id")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "cdc_fixed_size_sweep" -> {
      import Portable.rndSql
      def one(sz: Int) =
        s"""SELECT CAST($sz AS BIGINT) AS expected_size, unique_bytes, total_bytes, distinct_chunks, chunk_count,
           |  ${rndSql("unique_bytes / CAST(total_bytes AS DOUBLE)", 6)} AS dedup_coeff,
           |  ${rndSql("total_bytes / CAST(distinct_chunks AS DOUBLE)", 2)} AS avg_chunk_size
           |FROM (
           |  SELECT CAST(sum(len) AS BIGINT) AS unique_bytes,
           |         CAST(sum(len * cnt) AS BIGINT) AS total_bytes,
           |         count(*) AS distinct_chunks,
           |         CAST(sum(cnt) AS BIGINT) AS chunk_count
           |  FROM (SELECT chunk, min(len) AS len, count(*) AS cnt
           |        FROM (SELECT substr(text, off + 1, least($sz, n_chars - off)) AS chunk,
           |                     least($sz, n_chars - off) AS len
           |              FROM (SELECT text, n_chars, unnest(range(0, n_chars, $sz)) AS off
           |                    FROM documents))
           |        GROUP BY chunk))""".stripMargin
      Seq(32, 64, 128).map(one).mkString("", "\nUNION ALL\n", "\nORDER BY expected_size")
    },

    "cdc_fixed_dedup_metrics" -> {
      import Portable.rndSql
      s"""WITH ch AS (
         |  SELECT substr(text, off + 1, least($ExpectedSize, n_chars - off)) AS chunk,
         |         least($ExpectedSize, n_chars - off) AS len
         |  FROM (SELECT text, n_chars, unnest(range(0, n_chars, $ExpectedSize)) AS off
         |        FROM documents)),
         |g AS (SELECT chunk, min(len) AS len, count(*) AS cnt FROM ch GROUP BY 1),
         |m AS (SELECT CAST(sum(len) AS BIGINT) AS unique_bytes,
         |             CAST(sum(len * cnt) AS BIGINT) AS total_bytes,
         |             count(*) AS distinct_chunks,
         |             CAST(sum(cnt) AS BIGINT) AS chunk_count
         |      FROM g)
         |SELECT unique_bytes, total_bytes, distinct_chunks, chunk_count,
         |  ${rndSql("unique_bytes / CAST(total_bytes AS DOUBLE)", 6)} AS dedup_coeff,
         |  ${rndSql("total_bytes / CAST(distinct_chunks AS DOUBLE)", 2)} AS avg_chunk_size
         |FROM m""".stripMargin
    },

    "cdc_fixed_change_detection" ->
      s"""WITH v2 AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 3 = 0 THEN replace(text, 'data', 'DATA') ELSE text END AS text
         |  FROM documents),
         |c1 AS (SELECT DISTINCT doc_id, substr(text, off + 1, least($ExpectedSize, length(text) - off)) AS chunk
         |       FROM (SELECT doc_id, text, unnest(range(0, length(text), $ExpectedSize)) AS off
         |             FROM documents)),
         |c2 AS (SELECT DISTINCT doc_id, substr(text, off + 1, least($ExpectedSize, length(text) - off)) AS chunk
         |       FROM (SELECT doc_id, text, unnest(range(0, length(text), $ExpectedSize)) AS off
         |             FROM v2)),
         |ad AS (SELECT doc_id, count(*) AS added
         |       FROM (SELECT * FROM c2 EXCEPT SELECT * FROM c1) GROUP BY doc_id),
         |rm AS (SELECT doc_id, count(*) AS removed
         |       FROM (SELECT * FROM c1 EXCEPT SELECT * FROM c2) GROUP BY doc_id),
         |ids AS (SELECT doc_id FROM ad UNION SELECT doc_id FROM rm)
         |SELECT i.doc_id,
         |  CAST(coalesce(ad.added, 0) AS BIGINT) AS added,
         |  CAST(coalesce(rm.removed, 0) AS BIGINT) AS removed
         |FROM ids i LEFT JOIN ad ON ad.doc_id = i.doc_id LEFT JOIN rm ON rm.doc_id = i.doc_id
         |ORDER BY i.doc_id""".stripMargin,

    // Same arithmetic as cdc_fixed_chunks — the generator must agree with it.
    "cdc_chunks_generator_sql" ->
      s"""SELECT doc_id,
         |       CAST(off // $ExpectedSize AS INT) AS chunk_idx,
         |       off AS offset,
         |       CAST(least($ExpectedSize, n_chars - off) AS BIGINT) AS length
         |FROM (SELECT doc_id, n_chars, unnest(range(0, n_chars, $ExpectedSize)) AS off
         |      FROM documents)
         |ORDER BY doc_id, chunk_idx""".stripMargin,

    "cdc_fixed_dedup_per_doc" -> {
      import Portable.rndSql
      s"""WITH ch AS (
         |  SELECT doc_id, substr(text, off + 1, least($ExpectedSize, n_chars - off)) AS chunk,
         |         least($ExpectedSize, n_chars - off) AS len
         |  FROM (SELECT doc_id, text, n_chars, unnest(range(0, n_chars, $ExpectedSize)) AS off
         |        FROM documents)),
         |g AS (SELECT doc_id, chunk, min(len) AS len, count(*) AS cnt FROM ch GROUP BY 1, 2),
         |m AS (SELECT doc_id,
         |        CAST(sum(len) AS BIGINT) AS unique_bytes,
         |        CAST(sum(len * cnt) AS BIGINT) AS total_bytes,
         |        count(*) AS distinct_chunks,
         |        CAST(sum(cnt) AS BIGINT) AS chunk_count
         |      FROM g GROUP BY doc_id)
         |SELECT doc_id, unique_bytes, total_bytes, distinct_chunks, chunk_count,
         |  ${rndSql("unique_bytes / CAST(total_bytes AS DOUBLE)", 6)} AS dedup_coeff,
         |  ${rndSql("total_bytes / CAST(distinct_chunks AS DOUBLE)", 2)} AS avg_chunk_size
         |FROM m ORDER BY doc_id""".stripMargin
    },

    // Fixed chunking is pure arithmetic — exact DuckDB mirror via generate_series.
    "cdc_fixed_chunks" ->
      s"""SELECT doc_id,
         |       CAST(off // $ExpectedSize AS INT) AS chunk_idx,
         |       off AS offset,
         |       CAST(least($ExpectedSize, n_chars - off) AS BIGINT) AS length
         |FROM (SELECT doc_id, n_chars, unnest(range(0, n_chars, $ExpectedSize)) AS off
         |      FROM documents)
         |ORDER BY doc_id, chunk_idx""".stripMargin
  )
}
