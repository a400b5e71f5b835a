package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SQL table-valued surface for the dedup and ANN families (the
  * `cdc_chunks` pattern extended beyond chunking): Catalyst `Generator`s
  * that expose the per-row cores of the Scala operators to `LATERAL VIEW`,
  * so MinHash banding, LSH candidate generation and top-k serving are
  * drivable from pure `spark.sql` — and, because each Generator CALLS the
  * same JVM core the DataFrame API uses ([[graft.operators.Dedup.bandKeysJvm]],
  * [[graft.operators.Similarity.lshSigsJvm]]), the SQL surface and the
  * Scala surface hash identically by construction (spec-pinned in
  * SqlSurfaceSpec; driver-checked through the *_sql queries' DuckDB
  * oracles).
  */

/** `minhash_bands(text)` → rows (band INT, bkey STRING): the production
  * 4-band × 4-row MinHash banding of a document's word-trigram shingles.
  * Banded candidate pairs from SQL:
  *
  * {{{
  * WITH b AS (SELECT doc_id, t.band, t.bkey
  *            FROM docs LATERAL VIEW minhash_bands(text) t)
  * SELECT DISTINCT x.doc_id id1, y.doc_id id2
  * FROM b x JOIN b y ON x.band = y.band AND x.bkey = y.bkey
  *                  AND x.doc_id < y.doc_id
  * }}}
  *
  * Shingle-less docs (< 3 tokens) emit no rows — same contract as the
  * batch band table.
  */
case class MinhashBands(text: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(text)

  override def checkInputDataTypes(): TypeCheckResult =
    if (text.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"minhash_bands(text): text must be STRING, got ${text.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess

  override def elementSchema: StructType = StructType(Seq(
    StructField("band", IntegerType, nullable = false),
    StructField("bkey", StringType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = text.eval(input)
    if (t == null) Iterator.empty
    else graft.operators.Dedup
      .bandKeysJvm(graft.operators.Dedup.shingleArrayJvm(t.toString))
      .iterator.map { case (band, key) =>
        InternalRow(band, UTF8String.fromString(key))
      }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinhashBands =
    copy(text = newChildren(0))
}

/** `vec_lsh_sigs(emb)` → rows (tbl INT, sig BIGINT): the hyperplane-LSH
  * signature of an embedding under each of the production tables — the
  * candidate-generation core of the ANN serve family, from SQL:
  *
  * {{{
  * WITH s AS (SELECT vec_id, t.tbl, t.sig
  *            FROM vecs LATERAL VIEW vec_lsh_sigs(emb) t)
  * SELECT ... FROM s q JOIN s n ON q.tbl = n.tbl AND q.sig = n.sig ...
  * }}}
  */
case class VecLshSigs(emb: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(emb)

  override def checkInputDataTypes(): TypeCheckResult = emb.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vec_lsh_sigs(emb): emb must be ARRAY<DOUBLE>, got ${other.simpleString}")
  }

  override def elementSchema: StructType = StructType(Seq(
    StructField("tbl", IntegerType, nullable = false),
    StructField("sig", LongType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val a = emb.eval(input)
    if (a == null) Iterator.empty
    else {
      val arr = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toDoubleArray()
      graft.operators.Similarity.lshSigsJvm(arr).iterator
        .map { case (t, sig) => InternalRow(t, sig) }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VecLshSigs =
    copy(emb = newChildren(0))
}
