package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native per-row expressions for the shingle/MinHash/SimHash hot path.
 *
 * Spark's higher-order functions (`transform`, `aggregate`, `zip_with`)
 * are CodegenFallback: every lambda application is an interpreted
 * expression-tree walk with per-element allocation. The composed
 * shingle→minhash pipeline evaluates ~(tokens × numHashes) lambdas per
 * document, which dominates the whole dedup pipeline at corpus scale.
 * These expressions replace that with one JVM method call per row
 * running a tight primitive loop — no lambda dispatch, no intermediate
 * arrays beyond the output.
 *
 * Tokenization matches [[graft.functions.TextFunctions.tokens]] exactly
 * (lower → trim spaces → Java-regex split on \s+ → [""]-guard), so the
 * operators keep their semantics; only the 64-bit mixing functions
 * differ from the previous xxhash64 composition, which changes no
 * result values (Jaccard/Hamming are computed on the hashed SETS).
 */
object TextHash {

  /** splitmix64 finalizer — a full-avalanche 64-bit mix (public domain,
    * Steele et al., "Fast Splittable Pseudorandom Number Generators"). */
  @inline def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** FNV-1a 64 over UTF-8 bytes — stable, allocation-free string hash. */
  @inline def fnv1a(bytes: Array[Byte], from: Int, until: Int): Long = {
    var h = 0xCBF29CE484222325L
    var i = from
    while (i < until) { h ^= (bytes(i) & 0xFFL); h *= 0x100000001B3L; i += 1 }
    h
  }

  private val Whitespace = java.util.regex.Pattern.compile("\\s+")

  /** Tokens of `text` under the exact TextFunctions.tokens contract:
    * Spark's `trim` strips 0x20 ONLY (not tabs/newlines — Java
    * String.trim would), and Spark's `split` keeps leading/trailing
    * empty tokens (Java's default split drops trailing ones), so both
    * are reproduced precisely — a doc like "\tfoo" tokenizes
    * identically through the native and the composed path. */
  def tokenize(text: UTF8String): Array[String] = {
    val lowered = text.toLowerCase.toString
    var b = 0
    var e = lowered.length
    while (b < e && lowered.charAt(b) == ' ') b += 1
    while (e > b && lowered.charAt(e - 1) == ' ') e -= 1
    val s = lowered.substring(b, e)
    if (s.isEmpty) Array.empty[String] else Whitespace.split(s, -1)
  }
}

/** Column-level builders for the native text-hash expressions. */
object TextHashBuilders {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge

  def hashedShingles(text: Column, shingleLen: Int): Column =
    ColumnBridge.column(HashedShingleSet(ColumnBridge.expression(text), shingleLen))

  def minhashSignature(sh: Column, numHashes: Int): Column =
    ColumnBridge.column(MinHashSignature(ColumnBridge.expression(sh), numHashes))

  def simhash64(text: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(text)))

  def positionedShingles(toks: Column, shingleLen: Int): Column =
    ColumnBridge.column(
      PositionedShingleHashes(ColumnBridge.expression(toks), shingleLen))

  /** table-generating: one output row per word n-gram — alias the two
    * generated columns with `.as(Seq("pos", "ngram"))` */
  def ngramGenerate(text: Column, n: Int): Column =
    ColumnBridge.column(NgramGenerate(ColumnBridge.expression(text), n))
}

/**
 * Distinct 64-bit hashes of the `shingleLen`-token shingles of a
 * document — the MinHash/Jaccard input set as `array<long>`, computed
 * in one pass (tokenize → rolling token-hash window → set-dedupe).
 * Documents with fewer than `shingleLen` tokens yield an empty array
 * (callers filter those, as with the composed form).
 */
case class HashedShingleSet(child: Expression, shingleLen: Int)
    extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "hashed_shingles"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val toks = TextHash.tokenize(input.asInstanceOf[UTF8String])
    val n = toks.length - shingleLen + 1
    if (n <= 0) return new GenericArrayData(Array.empty[Long])
    // per-token hashes once, then combine windows (order-sensitive mix)
    val th = new Array[Long](toks.length)
    var i = 0
    while (i < toks.length) {
      val b = toks(i).getBytes("UTF-8")
      th(i) = TextHash.fnv1a(b, 0, b.length)
      i += 1
    }
    val seen = new java.util.HashSet[java.lang.Long](n * 2)
    val out = new Array[Long](n)
    var m = 0
    i = 0
    while (i < n) {
      var h = 0x27D4EB2F165667C5L
      var j = 0
      while (j < shingleLen) { h = TextHash.mix64(h ^ th(i + j)); j += 1 }
      if (seen.add(h)) { out(m) = h; m += 1 }
      i += 1
    }
    new GenericArrayData(if (m == n) out else java.util.Arrays.copyOf(out, m))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * Per-POSITION 64-bit hashes of the `shingleLen`-token windows of a
 * pre-split token array — element p is the hash of tokens
 * [p, p+shingleLen) — the exact-substring-dedup input
 * ([[graft.operators.Dedup.substringDedup]]). Unlike
 * [[HashedShingleSet]] it neither tokenizes (the CALLER's split
 * defines positions, so removal can reconstruct the original text
 * byte-for-byte — no lowercasing) nor dedupes (every occurrence keeps
 * its position). Per-token hashes are computed once and windows
 * combine them order-sensitively: O(n·shingleLen) long mixes per
 * document, no window strings materialized. Fewer than `shingleLen`
 * tokens → empty array.
 */
case class PositionedShingleHashes(child: Expression, shingleLen: Int)
    extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "positioned_shingles"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val nTok = arr.numElements()
    val n = nTok - shingleLen + 1
    if (n <= 0) return new GenericArrayData(Array.empty[Long])
    val th = new Array[Long](nTok)
    var i = 0
    while (i < nTok) {
      // null token (shouldn't occur from split, but arrays admit it)
      // hashes as the empty string
      val t = if (arr.isNullAt(i)) UTF8String.EMPTY_UTF8
        else arr.getUTF8String(i)
      val b = t.getBytes
      th(i) = TextHash.fnv1a(b, 0, b.length)
      i += 1
    }
    val out = new Array[Long](n)
    i = 0
    while (i < n) {
      var h = 0x27D4EB2F165667C5L
      var j = 0
      while (j < shingleLen) { h = TextHash.mix64(h ^ th(i + j)); j += 1 }
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * MinHash signature of a hashed-shingle set: element i is
 * min over the set of mix64(h ^ seed_i) — `numHashes` independent
 * permutation approximations in a single (set × numHashes) primitive
 * loop. Empty input → null (no signature exists).
 */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "minhash_signature"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  private val seeds: Array[Long] =
    Array.tabulate(numHashes)(i => TextHash.mix64(0x5851F42D4C957F2DL * (i + 1)))

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var k = 0
      while (k < numHashes) {
        val v = TextHash.mix64(h ^ seeds(k))
        if (v < mins(k)) mins(k) = v
        k += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * Native table-generating function (SURVEY §2.5 UDTF row): one input
 * row fans out to one row per word n-gram, `(pos, ngram)`. A custom
 * Catalyst `Generator` is the engine's UDTF extension point — the
 * analyzer plans it as a `Generate` node exactly like built-in
 * explode/posexplode (so it distributes and pipelines; no driver
 * collection), while a Scala UDF could only return an array to explode
 * afterwards. Tokenization shares [[TextHash.tokenize]]'s exact
 * contract. Fewer than `n` tokens (or null text) generates nothing.
 */
case class NgramGenerate(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  require(n >= 1, s"ngram size must be >= 1, got $n")

  override def prettyName: String = "ngram_generate"

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("ngram", StringType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = child.eval(input)
    if (t == null) Nil
    else {
      val toks = TextHash.tokenize(t.asInstanceOf[UTF8String])
      val m = toks.length - n + 1
      if (m <= 0) Nil
      else (0 until m).map { i =>
        InternalRow(i,
          UTF8String.fromString(toks.slice(i, i + n).mkString(" ")))
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * 60-bit ENGINE-PORTABLE SimHash: identical to [[SimHash64]] except the
 * per-token hash is the first 15 hex chars of md5(token) — a value any
 * SQL engine reproduces as
 * `CAST('0x' || substr(md5(t), 1, 15) AS BIGINT)` — so the DuckDB
 * oracle can replay the full signature + banding pipeline. 60 bits
 * (not 64) because a 16-hex-char parse can overflow a signed BIGINT in
 * SQL; bands become 4 × 15 bits. Use [[SimHash64]] (FNV+splitmix, no
 * md5 per token) when cross-engine verifiability isn't needed.
 */
case class SimHash60Portable(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "simhash60_portable"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val toks = TextHash.tokenize(input.asInstanceOf[UTF8String])
    if (toks.isEmpty) return null
    val md = java.security.MessageDigest.getInstance("MD5")
    val counters = new Array[Int](60)
    var i = 0
    while (i < toks.length) {
      val d = md.digest(toks(i).getBytes("UTF-8"))
      // first 15 hex chars = the top 60 bits of the first 8 digest bytes
      var x = 0L
      var k = 0
      while (k < 8) { x = (x << 8) | (d(k) & 0xFFL); k += 1 }
      val h = x >>> 4
      var j = 0
      while (j < 60) {
        if (((h >>> j) & 1L) == 1L) counters(j) += 1 else counters(j) -= 1
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 60) { if (counters(j) > 0) sig |= (1L << j); j += 1 }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * 64-bit SimHash of the token multiset (Charikar STOC'02): per bit
 * position, the sign of Σ ±1 over token hashes. One pass over tokens
 * with a 64-slot counter array per row — the composed form evaluated
 * 64 interpreted lambdas per TOKEN. Empty docs → null.
 */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "simhash64"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val toks = TextHash.tokenize(input.asInstanceOf[UTF8String])
    if (toks.isEmpty) return null
    val counters = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      val b = toks(i).getBytes("UTF-8")
      val h = TextHash.mix64(TextHash.fnv1a(b, 0, b.length))
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) counters(j) += 1 else counters(j) -= 1
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) { if (counters(j) > 0) sig |= (1L << j); j += 1 }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
