package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge.{column, expression}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Character-bigram histogram over an ASCII string column as a native
  * TypedImperativeAggregate: one dense long[128*128] per task, updated
  * by a tight byte loop, partials merged by vector add — NO per-bigram
  * row explosion and no bigram-keyed shuffle. This replaces the
  * explode(transform(sequence...)) + groupBy model-build of
  * ta_bigram_typicality, whose Generate materialized one row per
  * character position of the corpus (the measured cost of that query's
  * model pass at sf0.1 was ~1.5 s of its ~2 s total; the histogram
  * aggregate computes the identical counts in one compiled pass).
  *
  * Scale shape: O(16384) state per task at ANY corpus size; the single
  * merged row is the trained model artifact (131 KiB), same bounded-
  * model contract as the LM/DSIR bucket tables.
  *
  * Input contract: the child string must be printable ASCII (the caller
  * strips [^ -~] first); bytes >= 128 would alias buckets, so update
  * masks to 7 bits exactly as code = (c1 & 0x7f) << 7 | (c2 & 0x7f) —
  * for the in-contract alphabet this is the identity.
  *
  * eval returns array<long> of length 16384, index = c1*128 + c2; for
  * 2-char ASCII strings the index order IS the lexicographic bigram
  * order, so "count desc, bigram asc" rankings read directly off the
  * dense array.
  */
case class CharBigramHistAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  private val Slots = 128 * 128

  override def createAggregationBuffer(): Array[Long] = new Array[Long](Slots)

  override def update(b: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val bytes = v.asInstanceOf[UTF8String].getBytes
      var i = 1
      while (i < bytes.length) {
        b(((bytes(i - 1) & 0x7f) << 7) | (bytes(i) & 0x7f)) += 1L
        i += 1
      }
    }
    b
  }

  override def merge(b: Array[Long], o: Array[Long]): Array[Long] = {
    var i = 0
    while (i < Slots) { b(i) += o(i); i += 1 }
    b
  }

  override def eval(b: Array[Long]): Any = new GenericArrayData(b)

  override def serialize(b: Array[Long]): Array[Byte] = {
    val out = new Array[Byte](Slots * 8)
    val bb = java.nio.ByteBuffer.wrap(out)
    var i = 0
    while (i < Slots) { bb.putLong(b(i)); i += 1 }
    out
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val b = new Array[Long](Slots)
    val bb = java.nio.ByteBuffer.wrap(bytes)
    var i = 0
    while (i < Slots) { b(i) = bb.getLong(); i += 1 }
    b
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"char_bigram_hist requires a STRING child, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "char_bigram_hist"

  override def withNewMutableAggBufferOffset(newOffset: Int): CharBigramHistAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CharBigramHistAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CharBigramHistAgg =
    copy(child = newChild)
}

/** Hashed word-n-gram bucket histogram (the TRAIN pass of the hashed-
  * feature model family — LM unigram buckets, DSIR bigram buckets) as a
  * native TypedImperativeAggregate: dense long[mod] per task updated by
  * the same compiled gram-hash loop the scoring pass uses
  * (TextHashBridge), partials merged by vector add. Replaces the
  * explode(hashed_gram_buckets) + groupBy(bucket) model build, which
  * materialized one row per gram occurrence of the corpus through a
  * Generate — the histogram computes identical counts with O(mod)
  * state and no bucket-keyed shuffle.
  */
case class HashedGramHistAgg(
    child: Expression,
    n: Int,
    seed: Long,
    mod: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {
  require(n >= 1 && mod >= 1, "hashed_gram_hist needs n >= 1, mod >= 1")

  override def createAggregationBuffer(): Array[Long] = new Array[Long](mod)

  override def update(b: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val buckets = TextHashBridge.hashedGramBuckets(
        v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], n, seed, mod.toLong)
      var i = 0
      val m = buckets.numElements()
      while (i < m) { b(buckets.getLong(i).toInt) += 1L; i += 1 }
    }
    b
  }

  override def merge(b: Array[Long], o: Array[Long]): Array[Long] = {
    var i = 0
    while (i < mod) { b(i) += o(i); i += 1 }
    b
  }

  override def eval(b: Array[Long]): Any = new GenericArrayData(b)

  override def serialize(b: Array[Long]): Array[Byte] = {
    val out = new Array[Byte](mod * 8)
    val bb = java.nio.ByteBuffer.wrap(out)
    var i = 0
    while (i < mod) { bb.putLong(b(i)); i += 1 }
    out
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val b = new Array[Long](mod)
    val bb = java.nio.ByteBuffer.wrap(bytes)
    var i = 0
    while (i < mod) { b(i) = bb.getLong(); i += 1 }
    b
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hashed_gram_hist requires an ARRAY<STRING> child, got ${other.catalogString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "hashed_gram_hist"

  override def withNewMutableAggBufferOffset(newOffset: Int): HashedGramHistAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HashedGramHistAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HashedGramHistAgg =
    copy(child = newChild)
}

object BigramHistAgg {
  /** Column face: dense hashed word-n-gram bucket histogram of a token-
    * array column (polyHash(gram, seed) % mod slots).
    */
  def hashedGramHist(c: Column, n: Int, seed: Long, mod: Int): Column =
    column(HashedGramHistAgg(expression(c), n, seed, mod).toAggregateExpression())

  /** Column face: dense 16384-slot char-bigram histogram of a string
    * column (printable-ASCII contract; see [[CharBigramHistAgg]]).
    */
  def charBigramHist(c: Column): Column =
    column(CharBigramHistAgg(expression(c)).toAggregateExpression())

  /** The bigram string for a histogram slot index. */
  def bigramOf(code: Int): String =
    s"${(code >> 7).toChar}${(code & 0x7f).toChar}"
}
