package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{AeChunker, RabinChunker}
import graft.operators.Portable.round

/** Spark lift of the CDC chunkers: blob/text columns → a distributed chunk
  * table → dedup metrics, mirroring the reference pipeline
  * `main.rs:16-24` (scan → boundary scan → hash → dedup → metrics) on
  * DataFrame primitives.
  *
  * Design notes (100 TB stance):
  *  - The boundary scan is the only non-relational step; it runs inside the
  *    native `cdc_chunks` Generator ([[graft.plans.CdcChunks]]) — ONE
  *    codepath shared by this DataFrame lift, the SQL `LATERAL VIEW`
  *    surface, and the streaming twin. Everything downstream — hashing,
  *    dedup, metrics — is built-in, codegen'd expressions (`xxhash64`,
  *    `groupBy(...).agg`), so Catalyst handles pushdown/partial-agg and the
  *    shuffle keys are 64-bit hashes, not chunk payloads.
  *  - Chunk identity is `xxhash64` (deterministic) — a documented deviation
  *    from the reference's process-seeded SipHash (`ae.rs:76-78`), required for
  *    reproducible results (SURVEY.md §7.4).
  *  - For blobs far larger than a task (multi-GB), [[segmentedChunkTable]]
  *    explodes each blob into overlapped byte ranges first (strategy A of
  *    SURVEY.md §2.3), so the per-byte scan parallelizes *within* a blob.
  */
object Chunking {

  /** Chunk a DataFrame with a binary (or string — encoded UTF-8) payload column
    * into the canonical chunk table:
    * `(id, chunk_idx int, offset int, length int, chunk binary, hash long)`.
    *
    * Runs the boundary scan through the registered `cdc_chunks` Generator —
    * the analyzer plans it as a `Generate` node, streaming chunk rows out
    * without materializing the full per-blob bounds array the old UDF route
    * needed (r7 unification: UDF path deleted).
    */
  def chunkTable(
      df: DataFrame,
      idCol: String,
      payloadCol: String,
      algo: String,
      expectedSize: Int,
      seed: Long = 0L): DataFrame = {
    graft.plans.GraftExtensions.register(df.sparkSession)
    val payload: Column =
      if (df.schema(payloadCol).dataType == org.apache.spark.sql.types.StringType)
        encode(col(payloadCol), "UTF-8")
      else col(payloadCol)
    df.select(col(idCol).as("id"),
        call_function("cdc_chunks", payload, lit(algo), lit(expectedSize), lit(seed)))
      .withColumn("hash", xxhash64(col("chunk")))
  }

  /** Reference metrics A1-A4 over a chunk table, in ONE distributed pass:
    * dedup coefficient (`unique_bytes / total_bytes`, `ae.rs:91`), average
    * chunk size (`total_bytes / distinct_chunks`, `ae.rs:84`), exact distinct
    * count. Two-level agg: groupBy(hash) is the scale-out HashSet (A1); the
    * final single-row agg is tiny.
    */
  def dedupMetrics(chunks: DataFrame): DataFrame =
    chunks
      .groupBy(col("hash"))
      .agg(first(col("length")).as("len"), count(lit(1)).as("cnt"))
      .agg(
        sum(col("len")).as("unique_bytes"),
        sum(col("len") * col("cnt")).as("total_bytes"),
        count(lit(1)).as("distinct_chunks"),
        sum(col("cnt")).as("chunk_count"))
      .select(
        col("unique_bytes"),
        col("total_bytes"),
        col("distinct_chunks"),
        col("chunk_count"),
        round(col("unique_bytes") / col("total_bytes"), 6).as("dedup_coeff"),
        round(col("total_bytes") / col("distinct_chunks"), 2).as("avg_chunk_size"))

  /** Per-id (e.g. per-document) dedup metrics — same definitions, grouped. */
  def dedupMetricsPerId(chunks: DataFrame): DataFrame =
    chunks
      .groupBy(col("id"), col("hash"))
      .agg(first(col("length")).as("len"), count(lit(1)).as("cnt"))
      .groupBy(col("id"))
      .agg(
        sum(col("len")).as("unique_bytes"),
        sum(col("len") * col("cnt")).as("total_bytes"),
        count(lit(1)).as("distinct_chunks"),
        sum(col("cnt")).as("chunk_count"))
      .select(
        col("id"),
        col("unique_bytes"),
        col("total_bytes"),
        col("distinct_chunks"),
        col("chunk_count"),
        round(col("unique_bytes") / col("total_bytes"), 6).as("dedup_coeff"),
        round(col("total_bytes") / col("distinct_chunks"), 2).as("avg_chunk_size"))

  /** Scale path for huge blobs (SURVEY.md §7.4): explode each blob into
    * `segments` byte ranges, run the batch boundary scan (with its built-in
    * `window` lookback) per range — this is the distributable step — then merge
    * candidate cuts per blob with the reference's min-distance filter
    * (`ae.rs:72-74`). The merge is a narrow per-blob pass over a few hundred
    * offsets (KBs), done in `flatMap` after a per-blob grouping; the heavy
    * byte-scan work is spread across `segments × blobs` tasks.
    *
    * Supports the two algorithms the reference gives batch forms for:
    * "ae" (`ae.rs:31-53`) and "rabin" (`rabin.rs:61-90`).
    *
    * Scale note: here each (blob, segment) row carries the whole payload, which
    * is the in-row analogue of the reference cloning the input per thread
    * (`rabin.rs:99`). On a real cluster with multi-GB objects the same two-stage
    * shape applies, but stage 1 should read *byte ranges* straight from storage
    * (e.g. binaryFile offsets / ranged GETs) instead of carrying blob rows.
    */
  def segmentedChunkTable(
      df: DataFrame,
      idCol: String,
      payloadCol: String,
      algo: String,
      expectedSize: Int,
      seed: Long = 0L,
      segments: Int = 4,
      spreadSegments: Boolean = false): DataFrame = {
    graft.plans.GraftExtensions.register(df.sparkSession)
    val window = algo match {
      case "ae" => AeChunker(expectedSize).window
      case "rabin" => RabinChunker(expectedSize, seed.toInt).windowSize
      case other => throw new IllegalArgumentException(s"no batch bounds form for algo: $other")
    }
    val payload: Column =
      if (df.schema(payloadCol).dataType == org.apache.spark.sql.types.StringType)
        encode(col(payloadCol), "UTF-8")
      else col(payloadCol)

    val candidates =
      segmentCandidates(df, idCol, payload, algo, expectedSize, seed, segments, spreadSegments)

    // Stage 2 (narrow): per-blob ordered merge with the min-distance filter
    // (`ae.rs:72-74`) over a few hundred offsets — sort_array on (seg, cuts)
    // structs orders segments, then pure higher-order functions walk the
    // flattened cut list once (VERDICT r9 #3: no ScalaUDF in the plan). The
    // fold keeps cut `e` iff `e - last_kept >= window`; chunk i then spans
    // (prev_kept + 1, kept[i] - prev_kept), with prev_kept = -1 for i = 0 —
    // exactly the old merge UDF's walk.
    val merged = candidates
      .groupBy(col("id"))
      .agg(sort_array(collect_list(struct(col("seg"), col("cuts")))).as("segs"))
      .select(col("id"), flatten(col("segs").getField("cuts")).as("cuts"))
      .select(col("id"), expr(
        s"""aggregate(cuts, named_struct('last', -1, 'kept', CAST(array() AS ARRAY<INT>)),
           |  (acc, e) -> IF(e - acc.last >= $window,
           |    named_struct('last', e, 'kept', array_append(acc.kept, e)),
           |    acc)).kept""".stripMargin).as("kept"))
      .select(col("id"), explode(expr(
        """transform(kept, (e, i) -> named_struct(
          |  'chunk_idx', i,
          |  'offset', IF(i = 0, -1, element_at(kept, i)) + 1,
          |  'length', e - IF(i = 0, -1, element_at(kept, i))))""".stripMargin)).as("b"))
      .select(col("id"), col("b.chunk_idx").as("chunk_idx"),
        col("b.offset").as("offset"), col("b.length").as("length"))

    merged
      .join(df.select(col(idCol).as("id"), payload.as("payload")), "id")
      .select(
        col("id"),
        col("chunk_idx"),
        col("offset"),
        col("length"),
        substring(col("payload"), col("offset") + lit(1), col("length")).as("chunk"))
      .withColumn("hash", xxhash64(col("chunk")))
  }

  /** Stage 1 of strategy A: per (blob, segment) candidate cut offsets
    * through the native `cdc_segment_bounds` expression (the per-byte
    * scan). The id column keeps its ORIGINAL type throughout — a silent
    * cast("long") here turned non-numeric ids (e.g. binaryFile paths) into
    * null and collapsed every blob into one merge group (ADVICE r1).
    *
    * `spread`: exploded segment rows inherit the parent row's partition, so
    * a corpus of a FEW huge blobs would scan all segments of a blob in one
    * task — no within-blob parallelism. `spread = true` hash-repartitions
    * on (id, seg), shipping the payload once per segment (the distributed
    * analogue of the reference cloning the input per thread,
    * `rabin.rs:99`), so the per-byte scans fan across the cluster. Leave it
    * false for many-blob corpora, where cross-blob parallelism already
    * saturates and the extra payload shuffle is pure cost.
    */
  private[operators] def segmentCandidates(
      df: DataFrame,
      idCol: String,
      payload: Column,
      algo: String,
      expectedSize: Int,
      seed: Long,
      segments: Int,
      spread: Boolean): DataFrame = {
    graft.plans.GraftExtensions.register(df.sparkSession)
    val exploded = df
      .select(col(idCol).as("id"), payload.as("payload"))
      .select(col("id"), col("payload"), explode(sequence(lit(0), lit(segments - 1))).as("seg"))
    // Explicit partition count: with a bare repartition(cols), AQE sees a
    // few multi-MB rows as "small" by row stats and coalesces the exchange
    // back to one partition — exactly the serialization spread exists to
    // avoid. A user-specified count is exempt from AQE coalescing.
    val placed = if (spread) {
      val n = df.sparkSession.sessionState.conf.numShufflePartitions
      exploded.repartition(n, col("id"), col("seg"))
    } else exploded
    placed.select(col("id"), col("seg"),
      call_function("cdc_segment_bounds", col("payload"), lit(algo),
        lit(expectedSize), lit(seed), col("seg"), lit(segments)).as("cuts"))
  }

  /** JVM twin of the `xxhash64` Column expression (seed 42) for chunk
    * identities computed inside fused loops/UDFs.
    */
  private def xxh64(bytes: Array[Byte], from: Int, len: Int): Long =
    org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
      bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + from, len, 42L)

  /** Strategy B — edge-chunk re-chunking (`parallel.rs:88-120`, SURVEY.md
    * §2.3 P3-P7) as a distributed partial+final aggregation, per blob:
    *
    * Stage 1 (wide): each of `parts` payload slices is chunked independently;
    * interior chunks are deduplicated LOCALLY (the reference's per-thread
    * HashSet, `parallel.rs:38-51` — a chunk repeated across two slices counts
    * twice in unique bytes, faithfully), and one edge chunk per slice is held
    * back (even slices their last, odd slices their first).
    *
    * Stage 2 (narrow per blob): adjacent edge chunks are stitched pairwise
    * and re-chunked (`parallel.rs:61-86`; an odd trailing edge is dropped as
    * the reference's `i += 2` loop does); stitched chunks found in the global
    * set don't re-count. Metrics follow `parallel.rs:114-119`:
    * avg = unique_bytes / distinct.
    *
    * Chunk identity is xxhash64 (the engine-wide deterministic substitute for
    * the reference's process-seeded SipHash). Requires payloads of at least
    * `parts` bytes (as the reference's slicing does).
    */
  def edgeRechunkMetricsPerBlob(
      df: DataFrame,
      idCol: String,
      payloadCol: String,
      algo: String,
      expectedSize: Int,
      seed: Long = 0L,
      parts: Int = 4): DataFrame = {
    graft.plans.GraftExtensions.register(df.sparkSession)
    val nParts = parts
    val payload: Column =
      if (df.schema(payloadCol).dataType == org.apache.spark.sql.types.StringType)
        encode(col(payloadCol), "UTF-8")
      else col(payloadCol)
    // Degenerate payloads (< one byte per slice) would produce an empty
    // slice whose cs.last/cs.head has no element — skip them instead of
    // failing the whole job (ADVICE r2); the reference's slicing carries the
    // same precondition implicitly.
    val base = df.select(col(idCol).as("id"), payload.as("payload"))
      .filter(length(col("payload")) >= nParts)

    // Stage 1: per (blob, slice) → locally-distinct interior (hash, len)
    // rows + the held-back edge chunk bytes, through the native
    // `cdc_slice_chunks` Generator (VERDICT r9 #3: the Row-typed UDF route
    // is gone; interior chunk bytes never leave the generator).
    val sliced = base
      .select(col("id"), col("payload"), explode(sequence(lit(0), lit(nParts - 1))).as("p"))
      .select(col("id"), col("p"),
        call_function("cdc_slice_chunks", col("payload"), lit(algo),
          lit(expectedSize), lit(seed), col("p"), lit(nParts)))
    val interior = sliced
      .filter(!col("is_edge"))
      .select(col("id"), col("hash"), col("length").as("len"))

    // Stage 2: stitch adjacent edges pairwise — even slice p joins odd
    // slice p+1 on pair = p/2; an odd trailing edge joins nothing and is
    // dropped, as the reference's `i += 2` loop does — then re-chunk the
    // stitched bytes through the same `cdc_chunks` Generator as the main
    // path and dedup per (blob, hash). Only edge bytes (one chunk per
    // slice) shuffle into this join.
    val edges = sliced.filter(col("is_edge")).select(col("id"), col("p"), col("edge"))
    val even = edges.filter(col("p") % 2 === 0)
      .select(col("id"), (col("p") / 2).cast("int").as("pair"), col("edge").as("e0"))
    val odd = edges.filter(col("p") % 2 === 1)
      .select(col("id"), ((col("p") - 1) / 2).cast("int").as("pair"), col("edge").as("e1"))
    val stitched = even.join(odd, Seq("id", "pair"))
      .select(col("id"),
        call_function("cdc_chunks", concat(col("e0"), col("e1")), lit(algo),
          lit(expectedSize), lit(seed)))
      .select(col("id"), xxhash64(col("chunk")).as("hash"), col("length").as("len"))
      .groupBy(col("id"), col("hash")).agg(first(col("len")).as("len"))

    // Accounting: interiors count per-slice-locally; stitched chunks only if
    // absent from the interiors' global set; distinct = union of both.
    val interiorGlobal = interior.select(col("id"), col("hash"), col("len")).distinct()
    val newStitched = stitched.join(interiorGlobal.select(col("id"), col("hash")),
      Seq("id", "hash"), "left_anti")
    val allDistinct = interiorGlobal.select(col("id"), col("hash"))
      .unionByName(stitched.select(col("id"), col("hash"))).distinct()
      .groupBy(col("id")).agg(count(lit(1)).as("distinct_chunks"))

    base.select(col("id"), length(col("payload")).cast("long").as("total_bytes"))
      .join(interior.groupBy(col("id")).agg(sum(col("len")).as("ui")), Seq("id"), "left")
      .join(newStitched.groupBy(col("id")).agg(sum(col("len")).as("us")), Seq("id"), "left")
      .join(allDistinct, Seq("id"), "left")
      .select(
        col("id"),
        (coalesce(col("ui"), lit(0L)) + coalesce(col("us"), lit(0L))).as("unique_bytes"),
        col("total_bytes"),
        coalesce(col("distinct_chunks"), lit(0L)).as("distinct_chunks"))
      .withColumn("dedup_coeff", col("unique_bytes") / col("total_bytes"))
      .withColumn("avg_chunk_size", col("unique_bytes") / col("distinct_chunks"))
  }

  /** CDC as change detection (SURVEY.md §7.7): chunk two snapshots of a corpus
    * and diff the chunk-hash sets per id. Emits one row per changed chunk with
    * `change` ∈ {"added", "removed"}; unchanged chunks (same hash on both
    * sides) are dropped. This is the streaming analogue of the reference's
    * dedup loop applied across versions.
    */
  def chunkDiff(chunksOld: DataFrame, chunksNew: DataFrame): DataFrame = {
    val o = chunksOld.select(col("id"), col("hash"), col("length")).distinct()
    val n = chunksNew.select(col("id"), col("hash"), col("length")).distinct()
    val added = n.join(o, Seq("id", "hash"), "left_anti").withColumn("change", lit("added"))
    val removed = o.join(n, Seq("id", "hash"), "left_anti").withColumn("change", lit("removed"))
    added.unionByName(removed)
  }

  /** Register the SQL chunking surface (`cdc_chunks` table-valued generator,
    * `LATERAL VIEW cdc_chunks(payload, algo, size, seed)`) — delegates to the
    * single native codepath in [[graft.plans.GraftExtensions]]. The old
    * per-algo `cdc_bounds_<algo>` UDF registration is gone (r7 unification).
    */
  def registerSql(spark: SparkSession): Unit =
    graft.plans.GraftExtensions.register(spark)
}
