package graft

import graft.functions.TextFunctions
import graft.ingest.{CdcPipeline, SampleData}
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/**
 * Property tests (SURVEY §5.3): the invariants the reference's
 * at-least-once + unique-key contract depends on, checked across
 * multiple generator seeds (deterministic, seed-parameterized inputs
 * rather than fixed fixtures).
 */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val seeds = Seq(0L, 7L, 42L, 99L, 1234L)

  test("unmarshal(marshal(x)) == x for any generator seed") {
    seeds.foreach { seed =>
      val txns = SampleData.transactions(spark, 20, seed = seed)
      val back = CdcPipeline.dynamoStreamsPath(SampleData.toCdcEnvelopes(txns))
      assert(back.orderBy("transaction_id").collect().toSeq ===
        txns.orderBy("transaction_id").collect().toSeq, s"seed=$seed")
    }
  }

  test("conditional counts never exceed COUNT(*)") {
    seeds.foreach { seed =>
      val txns = SampleData.transactions(spark, 50, seed = seed)
      val row = txns.agg(
        count(lit(1)).as("n"),
        count(when(col("risk_score") === "HIGH", 1)).as("high")).collect()(0)
      assert(row.getLong(1) <= row.getLong(0), s"seed=$seed")
    }
  }

  test("text invariants: token count, quality range, fingerprint shape") {
    val texts = Seq("", " ", "a", "the quick brown fox",
      "x y z w v u t s r q", "the the the the", "  padded   spaces  ",
      "ONE-token")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val rows = df.select(
      TextFunctions.tokenCount(col("text")).as("n"),
      TextFunctions.qualityScore(col("text")).as("q"),
      TextFunctions.contentFingerprint(col("text")).as("fp"),
      size(TextFunctions.shingles(col("text"), 3)).as("nsh")).collect()
    rows.foreach { r =>
      assert(r.getLong(0) >= 0)
      assert(r.getDouble(1) >= 0.0 && r.getDouble(1) <= 1.0)
      assert(r.getString(2).length === 32) // md5 hex
      assert(r.getInt(3) >= 0)
    }
  }

  test("native tokenizer matches Spark's trim/split on pathological whitespace") {
    // exact-parity contract (TextHashExpressions.TextHash.tokenize):
    // Spark trim strips spaces ONLY; Spark split keeps empty tokens.
    val texts = Seq("", " ", "\t", "\tfoo bar baz", "foo bar\t", "a b c",
      "  x  Y\tz  ", "one\n\ntwo three", "UPPER lower MiXeD case here", "\n",
      " leading and trailing ", "multi   space   runs   here")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    // the composed path's token array vs the native path's token count,
    // plus full shingle-set-size parity (native hashes per window of
    // the SAME token sequence)
    val rows = df.select(
      size(TextFunctions.tokens(col("text"))).as("n_composed"),
      size(graft.functions.expressions.TextHashBuilders
        .hashedShingles(col("text"), 2)).as("nsh_native"),
      size(TextFunctions.shingles(col("text"), 2)).as("nsh_composed"),
      col("text")).collect()
    rows.foreach { r =>
      assert(r.getInt(1) === r.getInt(2),
        s"shingle sets diverge for ${r.getString(3).replace("\t", "\\t")}")
    }
  }

  test("jaccard pairs are ordered (a<b), bounded, above threshold") {
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"),
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon eta"),
      (3L, "unrelated words entirely different content here")
    ).toDF("doc_id", "text")
    val pairs = Dedup.minhashLsh(docs, threshold = 0.3, shingleLen = 2).collect()
    pairs.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= 0.3 && r.getDouble(2) <= 1.0)
    }
    // the exact duplicate pair is always found with jaccard 1.0
    assert(pairs.exists(r => r.getLong(0) == 0L && r.getLong(1) == 1L &&
      r.getDouble(2) == 1.0))
  }

  test("merge is idempotent for any batch seed (at-least-once contract)") {
    seeds.take(3).foreach { seed =>
      val root = new org.apache.hadoop.fs.Path(freshDir(s"prop_merge_$seed"))
      val t = graft.table.TxTable.create(spark, root, "t",
        graft.model.Schemas.transactions, Seq("date"))
      val batch = SampleData.transactions(spark, 15, seed = seed)
      t.merge(batch, "transaction_id", "processing_timestamp")
      val once = t.toDF.orderBy("transaction_id").collect().toSeq
      t.merge(batch, "transaction_id", "processing_timestamp")
      val twice = t.toDF.orderBy("transaction_id").collect().toSeq
      assert(once === twice, s"seed=$seed")
    }
  }

  test("merge LWW matches a reference fold for random dup-heavy batches") {
    // the aggregate-based dedup must implement EXACTLY the last-writer-
    // wins contract a driver-side fold defines: per key, the greatest
    // NON-NULL orderCol wins (a null loses to any value), then
    // delete-flagged winners evict. Order values are UNIQUE per batch
    // (no ties — a tie's winner is explicitly arbitrary), plus two
    // all-null-order keys: one upsert-only (a row must survive, the
    // window's NULLS-LAST behavior) and one delete-only (must evict).
    seeds.foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val rows = (0 until 80).map { i =>
        (s"k${rnd.nextInt(12)}", java.lang.Long.valueOf(i.toLong),
          s"v$i", rnd.nextInt(100) < 20)
      } ++ Seq(
        ("kn_keep", null.asInstanceOf[java.lang.Long], "nk1", false),
        ("kn_keep", null.asInstanceOf[java.lang.Long], "nk2", false),
        ("kn_del", null.asInstanceOf[java.lang.Long], "nd1", true),
        ("kn_del", null.asInstanceOf[java.lang.Long], "nd2", true))
      val batch = rows.toDF("id", "ts", "v", "del")
      val expectLive = rows.groupBy(_._1).map { case (k, rs) =>
        k -> rs.maxBy(r => Option(r._2).map(_.longValue).getOrElse(Long.MinValue))
      }.collect { case (k, r) if !r._4 => k -> ((r._2, r._3)) }
      val root = new org.apache.hadoop.fs.Path(freshDir(s"prop_lww_$seed"))
      val t = graft.table.TxTable.create(spark, root, "t",
        batch.drop("del").schema, Nil)
      t.merge(batch, "id", "ts", deleteCol = Some("del"))
      val got = t.toDF.collect()
        .map(r => r.getString(0) ->
          ((if (r.isNullAt(1)) null else java.lang.Long.valueOf(r.getLong(1)),
            r.getString(2)))).toMap
      assert(got.keySet === expectLive.keySet, s"seed=$seed")
      expectLive.foreach { case (k, (ts, v)) =>
        assert(got(k)._1 === ts, s"seed=$seed key=$k winning ts")
        // v is determined wherever ts is non-null (unique ordering)
        if (ts != null) assert(got(k)._2 === v, s"seed=$seed key=$k value")
      }
    }
  }
}
