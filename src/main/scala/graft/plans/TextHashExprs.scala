package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static bridge for the MinHash/SimHash hash loops — compiled JVM loops
  * instead of per-character `aggregate` higher-order functions (Spark has
  * no codegen for array lambdas, so the HOF form runs interpreted: measured
  * ~40 ms/doc of pure hash overhead in round 2; this bridge is the same
  * integer math at native-loop speed, so every oracle is unchanged).
  */
object TextHashBridge {
  val M: Long = 1000000007L

  /** polyHashStr: acc = (acc * 131 + charCode) mod M, acc0 = seed mod M —
    * identical to the `aggregate`-HOF form in TextFunctions.polyHashStr
    * (ascii() = the character's code point; the corpus is ASCII).
    */
  def polyHash(s: UTF8String, seed: Long): Long = {
    val str = s.toString
    var acc = seed % M
    var i = 0
    while (i < str.length) {
      acc = (acc * 131 + str.charAt(i).toLong) % M
      i += 1
    }
    acc
  }

  /** k-seed MinHash signature over a token array: for each seed
    * 0x9e3779b9 * (s+1), the minimum polyHash over the tokens. Empty input
    * yields all-null (matching array_min over an empty array).
    */
  def minHashSig(toks: ArrayData, k: Int): ArrayData = {
    val n = toks.numElements()
    if (n == 0) return new GenericArrayData(Array.fill[Any](k)(null))
    val out = new Array[Any](k)
    var s = 0
    while (s < k) {
      val seed = 0x9e3779b9L * (s + 1)
      var mn = Long.MaxValue
      var i = 0
      while (i < n) {
        val h = polyHash(toks.getUTF8String(i), seed)
        if (h < mn) mn = h
        i += 1
      }
      out(s) = mn
      s += 1
    }
    new GenericArrayData(out)
  }

  /** 32-bit SimHash: per-bit majority vote over the token hashes
    * (seed 0x85ebca6b), bit set iff the vote is strictly positive —
    * identical math to the HOF form (empty input -> 0).
    */
  def simHash(toks: ArrayData): Long = {
    val n = toks.numElements()
    val votes = new Array[Long](32)
    var i = 0
    while (i < n) {
      val h = polyHash(toks.getUTF8String(i), 0x85ebca6bL)
      var b = 0
      while (b < 32) {
        if (((h >> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 32) {
      if (votes(b) > 0) out |= 1L << b
      b += 1
    }
    out
  }

  /** Count of `s`'s character bigrams present in `model` — the scoring
    * half of the corpus-trained typicality filter, as one compiled scan
    * over the string (the HOF form built a per-row array of ~L two-char
    * strings and ran an interpreted `filter`).
    */
  def bigramHits(s: UTF8String, model: java.util.HashSet[String]): Int = {
    val str = s.toString
    var hits = 0
    var i = 0
    while (i < str.length - 1) {
      if (model.contains(str.substring(i, i + 2))) hits += 1
      i += 1
    }
    hits
  }

  private def isWsChar(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** One-pass Gopher repetition stats off the raw text: word count,
    * distinct-word count, and the per-doc modal word-bigram (max count,
    * ties to the lexicographically largest bigram — the corpus is ASCII,
    * where UTF-16, UTF-8-binary and DuckDB `ORDER BY bg DESC` orders all
    * agree). Tokenization is exactly
    * `filter(split(lower(text), "\\s+"), length > 0)`: maximal runs of
    * non-`\s` characters (`\s` = the Java regex class) of the lowercased
    * text. Returns (n_words, n_distinct, top_bigram, top_n); the bigram
    * pair is null when the doc has fewer than two words.
    */
  def gopherStats(s: UTF8String): InternalRow = {
    val str = s.toLowerCase.toString
    val words = new java.util.ArrayList[String]()
    val L = str.length
    var i = 0
    while (i < L) {
      while (i < L && isWsChar(str.charAt(i))) i += 1
      val st = i
      while (i < L && !isWsChar(str.charAt(i))) i += 1
      if (i > st) words.add(str.substring(st, i))
    }
    val n = words.size
    val distinct = new java.util.HashSet[String](math.max(16, n * 2))
    var j = 0
    while (j < n) { distinct.add(words.get(j)); j += 1 }
    var topBg: String = null
    var topN = 0L
    if (n >= 2) {
      val counts = new java.util.HashMap[String, java.lang.Long](math.max(16, n * 2))
      j = 0
      while (j < n - 1) {
        val bg = words.get(j) + " " + words.get(j + 1)
        val prev = counts.get(bg)
        val c = if (prev == null) 1L else prev.longValue + 1L
        counts.put(bg, c)
        // monotone argmax: each bigram eventually reaches its final count,
        // and the (count, bigram) replacement rule is order-insensitive
        if (c > topN || (c == topN && bg.compareTo(topBg) > 0)) {
          topN = c; topBg = bg
        }
        j += 1
      }
    }
    val row = new GenericInternalRow(4)
    row.setInt(0, n)
    row.setInt(1, distinct.size)
    if (topBg == null) { row.setNullAt(2); row.setNullAt(3) }
    else { row.update(2, UTF8String.fromString(topBg)); row.setLong(3, topN) }
    row
  }

  /** All word n-grams of the text, space-joined, in one compiled pass:
    * tokenize exactly like [[gopherStats]]
    * (`filter(split(lower(text), "\\s+"), length > 0)`), then emit each
    * gram as a SUBSTRING of the single-space-rejoined token string — no
    * per-gram slice/join allocations (the HOF form allocated an array
    * plus ~n small strings per gram, interpreted). Fewer than n words
    * yields an empty array.
    */
  def wordGrams(s: UTF8String, n: Int): ArrayData = {
    val str = s.toLowerCase.toString
    val words = new java.util.ArrayList[String]()
    val L = str.length
    var i = 0
    while (i < L) {
      while (i < L && isWsChar(str.charAt(i))) i += 1
      val st = i
      while (i < L && !isWsChar(str.charAt(i))) i += 1
      if (i > st) words.add(str.substring(st, i))
    }
    val w = words.size
    if (w < n) return new GenericArrayData(new Array[Any](0))
    val sb = new java.lang.StringBuilder(str.length)
    val starts = new Array[Int](w)
    var k = 0
    while (k < w) {
      starts(k) = sb.length
      sb.append(words.get(k))
      if (k < w - 1) sb.append(' ')
      k += 1
    }
    val joined = sb.toString
    val out = new Array[Any](w - n + 1)
    k = 0
    while (k <= w - n) {
      val end = starts(k + n - 1) + words.get(k + n - 1).length
      out(k) = UTF8String.fromString(joined.substring(starts(k), end))
      k += 1
    }
    new GenericArrayData(out)
  }


  /** Space-joined word n-grams under the ALNUM tokenizer
    * (`filter(split(lower(text), "[^a-z0-9]+"), len > 0)` — the
    * dd_exact_substring token stream), one compiled pass: same
    * single-rejoin + substring-slicing trick as [[wordGrams]], but the
    * token boundary is any non-[a-z0-9] char after lowercasing instead
    * of whitespace. Fewer than n tokens yields an empty array.
    */
  def alnumGrams(s: UTF8String, n: Int): ArrayData = {
    val str = s.toLowerCase.toString
    def isTok(c: Char): Boolean =
      (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
    val words = new java.util.ArrayList[String]()
    val L = str.length
    var i = 0
    while (i < L) {
      while (i < L && !isTok(str.charAt(i))) i += 1
      val st = i
      while (i < L && isTok(str.charAt(i))) i += 1
      if (i > st) words.add(str.substring(st, i))
    }
    val w = words.size
    if (w < n) return new GenericArrayData(new Array[Any](0))
    val sb = new java.lang.StringBuilder(str.length)
    val starts = new Array[Int](w)
    var k = 0
    while (k < w) {
      starts(k) = sb.length
      sb.append(words.get(k))
      if (k < w - 1) sb.append(' ')
      k += 1
    }
    val joined = sb.toString
    val out = new Array[Any](w - n + 1)
    k = 0
    while (k <= w - n) {
      val end = starts(k + n - 1) + words.get(k + n - 1).length
      out(k) = UTF8String.fromString(joined.substring(starts(k), end))
      k += 1
    }
    new GenericArrayData(out)
  }
  /** DISTINCT word n-grams of the text with their within-doc occurrence
    * counts, in first-occurrence order (LinkedHashMap — deterministic).
    * This is the row-local limit of map-side combining for gram-stream
    * pipelines: `explode(wordGramCounts(..))` yields exactly what
    * `explode(wordGrams(..)).groupBy(g, doc_id).count()` yields, without
    * the corpus-wide (g, doc_id) shuffle.
    */
  def wordGramCounts(s: UTF8String, n: Int): ArrayData = {
    val grams = wordGrams(s, n)
    val m = grams.numElements()
    if (m == 0) return new GenericArrayData(new Array[Any](0))
    val counts = new java.util.LinkedHashMap[UTF8String, Array[Long]](
      math.max(16, m * 2))
    var i = 0
    while (i < m) {
      val g = grams.getUTF8String(i)
      val prev = counts.get(g)
      if (prev == null) counts.put(g, Array(1L)) else prev(0) += 1L
      i += 1
    }
    val out = new Array[Any](counts.size)
    val it = counts.entrySet().iterator()
    var k = 0
    while (it.hasNext) {
      val e = it.next()
      val row = new GenericInternalRow(2)
      row.update(0, e.getKey)
      row.setLong(1, e.getValue()(0))
      out(k) = row
      k += 1
    }
    new GenericArrayData(out)
  }

  /** Sum of per-gram micro-log table lookups over the token array's
    * word n-grams: for each space-joined n-gram (n=1 -> the tokens
    * themselves), bucket = polyHash(gram, seed) % mod, accumulate
    * table(bucket). The compiled form of the interpreted
    * `aggregate(toks, 0L, (acc, t) -> acc + element_at(tableLit,
    * pmod(polyHashStr(t, seed), mod)))` fold the DSIR / LM-perplexity
    * scoring passes ran — identical integer math, so the oracles are
    * unchanged.
    */
  def hashedGramMicroSum(toks: ArrayData, n: Int, seed: Long,
      table: Array[Long], mod: Long): Long = {
    val m = toks.numElements()
    var sum = 0L
    if (n == 1) {
      var i = 0
      while (i < m) {
        sum += table((polyHash(toks.getUTF8String(i), seed) % mod).toInt)
        i += 1
      }
    } else {
      var i = 0
      while (i + n <= m) {
        val sb = new java.lang.StringBuilder
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks.getUTF8String(i + j).toString)
          j += 1
        }
        val h = polyHash(UTF8String.fromString(sb.toString), seed)
        sum += table((h % mod).toInt)
        i += 1
      }
    }
    sum
  }

  /** Bucket ids of the token array's word n-grams:
    * polyHash(gram, seed) % mod per space-joined gram — the compiled
    * TRAIN-side companion of [[hashedGramMicroSum]] (the model pass
    * explodes these Longs instead of interpreting a per-char HOF hash
    * over materialized gram strings).
    */
  def hashedGramBuckets(toks: ArrayData, n: Int, seed: Long,
      mod: Long): ArrayData = {
    val m = toks.numElements()
    val cnt = if (n == 1) m else math.max(m - n + 1, 0)
    val out = new Array[Any](cnt)
    if (n == 1) {
      var i = 0
      while (i < m) {
        out(i) = polyHash(toks.getUTF8String(i), seed) % mod
        i += 1
      }
    } else {
      var i = 0
      while (i + n <= m) {
        val sb = new java.lang.StringBuilder
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks.getUTF8String(i + j).toString)
          j += 1
        }
        out(i) = polyHash(UTF8String.fromString(sb.toString), seed) % mod
        i += 1
      }
    }
    new GenericArrayData(out)
  }

  /** Count of maximal non-whitespace runs — `size(filter(split(text,
    * "\\s+"), length > 0))` as one compiled scan with zero allocations.
    */
  def wordCount(s: UTF8String): Int = {
    val str = s.toString
    val L = str.length
    var n = 0
    var i = 0
    while (i < L) {
      while (i < L && isWsChar(str.charAt(i))) i += 1
      if (i < L) n += 1
      while (i < L && !isWsChar(str.charAt(i))) i += 1
    }
    n
  }

  /** [n, sum_i c_i * rint(ln(c_i) * 1e6)] over the BYTE histogram of the
    * string — the exact-integer parts of the Shannon entropy
    * H = ln(n) - (1/n) * sum c_i ln c_i. Only the final combination is
    * float (on exact integers, identical in any engine); the per-symbol
    * micro-logs are order-free integer sums. Byte == character on this
    * ASCII corpus (documented: byte entropy for multi-byte inputs).
    */
  def charEntropyParts(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val counts = new Array[Int](256)
    var i = 0
    while (i < bytes.length) { counts(bytes(i) & 0xff) += 1; i += 1 }
    var n = 0L
    var sum = 0L
    var j = 0
    while (j < 256) {
      val c = counts(j)
      if (c > 0) {
        n += c
        sum += c.toLong * math.rint(math.log(c.toDouble) * 1e6).toLong
      }
      j += 1
    }
    new GenericArrayData(Array[Any](n, sum))
  }
}

/** `word_count(text)` — whitespace-token count as a native codegen'd
  * expression (no token-array materialization, no interpreted filter HOF).
  */
case class WordCountExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "word_count"

  override protected def nullSafeEval(input: Any): Any =
    TextHashBridge.wordCount(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextHashBridge.wordCount($c)")

  override protected def withNewChildInternal(newChild: Expression): WordCountExpr =
    copy(child = newChild)
}

/** `char_entropy_parts(text)` — [n, micro-log sum] of the byte histogram
  * in one compiled scan (see [[TextHashBridge.charEntropyParts]]); the
  * caller combines them into Shannon entropy with one ln + one division
  * on exact integers.
  */
case class CharEntropyPartsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_entropy_parts"

  override protected def nullSafeEval(input: Any): Any =
    TextHashBridge.charEntropyParts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextHashBridge.charEntropyParts($c)")

  override protected def withNewChildInternal(newChild: Expression): CharEntropyPartsExpr =
    copy(child = newChild)
}

/** `hashed_gram_micro_sum(toks)` — the codegen'd scoring pass of the
  * hashed-feature model family (DSIR importance weights, LM-perplexity
  * gate): sums a broadcast micro-log table over the hashed word n-grams
  * of the token array. The model table rides along as a referenced
  * Array[Long] indexed by bucket, exactly the map the interpreted
  * `aggregate`+`element_at` fold looked up per gram.
  */
case class HashedGramMicroSumExpr(child: Expression, n: Int, seed: Long,
    table: Array[Long]) extends UnaryExpression {
  require(n >= 1, "hashed_gram_micro_sum n must be >= 1")
  require(table.nonEmpty, "hashed_gram_micro_sum needs a non-empty table")
  override def dataType: DataType = LongType
  override def prettyName: String = "hashed_gram_micro_sum"

  override protected def nullSafeEval(input: Any): Any =
    TextHashBridge.hashedGramMicroSum(input.asInstanceOf[ArrayData], n, seed,
      table, table.length.toLong)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("microTable", table, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.TextHashBridge.hashedGramMicroSum($c, $n, ${seed}L, $ref, ${table.length}L)")
  }

  override protected def withNewChildInternal(newChild: Expression): HashedGramMicroSumExpr =
    copy(child = newChild)
}

/** `hashed_gram_buckets(toks)` — the codegen'd TRAIN pass of the
  * hashed-feature model family: the bucket ids of the token array's
  * word n-grams, ready to explode into the model aggregation.
  */
case class HashedGramBucketsExpr(child: Expression, n: Int, seed: Long,
    mod: Long) extends UnaryExpression {
  require(n >= 1 && mod >= 1, "hashed_gram_buckets needs n >= 1, mod >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hashed_gram_buckets"

  override protected def nullSafeEval(input: Any): Any =
    TextHashBridge.hashedGramBuckets(input.asInstanceOf[ArrayData], n, seed, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.TextHashBridge.hashedGramBuckets($c, $n, ${seed}L, ${mod}L)")

  override protected def withNewChildInternal(newChild: Expression): HashedGramBucketsExpr =
    copy(child = newChild)
}

/** `word_gram_counts(text, n)` — distinct word n-grams with within-doc
  * occurrence counts as `array<struct<g:string, c:bigint>>`, codegen'd.
  * Exploding this is the shuffle-free equivalent of exploding the raw
  * gram stream and aggregating on (g, doc_id).
  */
case class WordGramCountsExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "word_gram_counts n must be >= 1")
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("g", StringType, nullable = false),
    StructField("c", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "word_gram_counts"

  override protected def nullSafeEval(input: Any): Any =
    TextHashBridge.wordGramCounts(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextHashBridge.wordGramCounts($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordGramCountsExpr =
    copy(child = newChild)
}

/** `word_grams(text, n)` — the space-joined word n-grams of `text` as a
  * native codegen'd expression; the shingle generator for the
  * decontamination and boilerplate-mask queries (one compiled pass off
  * the string instead of an interpreted transform+slice+array_join
  * chain over a pre-split token array).
  */
case class WordGramsExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "word_grams n must be >= 1")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_grams"

  override protected def nullSafeEval(input: Any): Any =
    TextHashBridge.wordGrams(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextHashBridge.wordGrams($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordGramsExpr =
    copy(child = newChild)
}

/** `alnum_grams(text, n)` — space-joined word n-grams under the
  * alnum tokenizer (`[^a-z0-9]+` boundaries after lower()), codegen'd;
  * the window generator for the exact-substring dedup family (one
  * compiled pass instead of the interpreted regex-split + filter +
  * transform/sequence + slice + array_join chain).
  */
case class AlnumGramsExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "alnum_grams n must be >= 1")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "alnum_grams"

  override protected def nullSafeEval(input: Any): Any =
    TextHashBridge.alnumGrams(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextHashBridge.alnumGrams($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): AlnumGramsExpr =
    copy(child = newChild)
}

/** `gopher_stats(text)` — the Gopher repetition-filter signals (word
  * count, distinct-word count, modal word-bigram + its count) in ONE
  * compiled pass over the string. The HOF form (array_sort of the per-row
  * bigram array + an interpreted `aggregate` fold) had the right
  * topology — row-local, zero wide shuffles — but ran outside codegen at
  * ~40 ms/doc; this keeps the same semantics inside whole-stage codegen.
  */
case class GopherStatsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_words", IntegerType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("top_bigram", StringType, nullable = true),
    StructField("top_n", LongType, nullable = true)))
  override def prettyName: String = "gopher_stats"

  override protected def nullSafeEval(input: Any): Any =
    TextHashBridge.gopherStats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextHashBridge.gopherStats($c)")

  override protected def withNewChildInternal(newChild: Expression): GopherStatsExpr =
    copy(child = newChild)
}

/** `bigram_hits(text)` — counts the character bigrams of `text` that are
  * in a trained model set, straight off the string (no per-row bigram
  * array, no interpreted `filter` HOF — the scoring pass of the
  * train-then-score typicality filter stays inside whole-stage codegen).
  * A string shorter than 2 chars has no bigrams (returns 0).
  */
case class BigramHitsExpr(child: Expression, model: Seq[String])
    extends UnaryExpression {
  // one HashSet per (deserialized) expression instance, shared across rows
  @transient private lazy val modelSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](math.max(16, model.size * 2))
    model.foreach(s.add)
    s
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "bigram_hits"

  override protected def nullSafeEval(input: Any): Any =
    TextHashBridge.bigramHits(input.asInstanceOf[UTF8String], modelSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bigramModel", modelSet, "java.util.HashSet")
    defineCodeGen(ctx, ev, c => s"graft.plans.TextHashBridge.bigramHits($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): BigramHitsExpr =
    copy(child = newChild)
}

/** `minhash_sig(tokens)` — the k-seed MinHash signature as a native
  * expression with codegen (one-line invoke of the static bridge, so the
  * surrounding projection stays inside whole-stage codegen).
  */
case class MinHashSigExpr(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    TextHashBridge.minHashSig(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextHashBridge.minHashSig($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}

/** `simhash(tokens)` — the 32-bit majority-vote fingerprint, codegen'd. */
case class SimHashExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash"

  override protected def nullSafeEval(input: Any): Any =
    TextHashBridge.simHash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextHashBridge.simHash($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHashExpr =
    copy(child = newChild)
}
