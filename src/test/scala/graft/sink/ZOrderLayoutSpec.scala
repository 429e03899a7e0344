package graft.sink

import graft.SparkSpec
import graft.functions.ZOrder
import org.apache.spark.sql.functions._

/** Z-order layout: Morton math parity with the local twin, and the layout
  * property that buckets cover disjoint z-ranges while bounding BOTH layout
  * columns — the data-skipping contract a single-column sort cannot give
  * the second column. */
class ZOrderLayoutSpec extends SparkSpec {

  test("zorder2 column math equals the local reference twin") {
    import spark.implicits._
    val rng = new scala.util.Random(42)
    val pairs = Seq.fill(200)(
      (rng.nextLong().abs & 0x7FFFFFFFL, rng.nextLong().abs & 0x7FFFFFFFL)) ++
      Seq((0L, 0L), (0x7FFFFFFFL, 0x7FFFFFFFL), (1L, 0L), (0L, 1L),
        (0x7FFFFFFFL, 0L), (0L, 0x7FFFFFFFL))
    val got = pairs.toDF("a", "b")
      .select(ZOrder.zorder2(col("a"), col("b")).as("z"))
      .as[Long].collect().toSeq
    val want = pairs.map { case (a, b) => ZOrder.zorder2Local(a, b) }
    assert(got == want)
    // interleave is a bijection on the sampled domain: z-order never
    // collides distinct (a, b) pairs
    assert(want.distinct.size == pairs.distinct.size)
  }

  test("zorderK: local-twin parity, 2-col equivalence with zorder2, codegen parity") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val triples = Seq.fill(100)((rng.nextInt(1 << 20).toLong,
      rng.nextInt(1 << 20).toLong, rng.nextInt(1 << 20).toLong))
    val dfK = triples.toDF("a", "b", "c")
    def run(): Seq[Long] = dfK
      .select(ZOrder.zorderK(array(col("a"), col("b"), col("c"))).as("z"))
      .as[Long].collect().toSeq
    val modeKey = "spark.sql.codegen.factoryMode"
    val prior = spark.conf.getOption(modeKey)
    try {
      spark.conf.set(modeKey, "CODEGEN_ONLY")
      val gen = run()
      spark.conf.set(modeKey, "NO_CODEGEN")
      assert(gen == run()) // generated == interpreted
      assert(gen == triples.map(t => ZOrder.zorderKLocal(Seq(t._1, t._2, t._3))))
    } finally prior match {
      case Some(v) => spark.conf.set(modeKey, v)
      case None => spark.conf.unset(modeKey)
    }
    // k=2 round-robin layout is exactly the magic-mask zorder2 (31-bit domain)
    val pairs = Seq.fill(50)((rng.nextLong().abs & 0x7FFFFFFFL,
      rng.nextLong().abs & 0x7FFFFFFFL))
    val viaK = pairs.toDF("a", "b")
      .select(ZOrder.zorderK(array(col("a"), col("b"))).as("z")).as[Long].collect().toSeq
    assert(viaK == pairs.map { case (a, b) => ZOrder.zorder2Local(a, b) })
  }

  test("3-column z-ordered write: disjoint slabs, all three dimensions bounded") {
    val li = graft.Tables(spark, sf0001, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    val out = java.nio.file.Files.createTempDirectory("graft_zorderk_spec").toString
    PartitionedSink.writeZOrderedK(li, out,
      Seq("l_partkey", "l_suppkey", "l_orderkey"), nBuckets = 64)
    val back = PartitionedSink.readBack(spark, out)
    assert(back.count() == li.count())
    // 64 buckets = 2 top bits per dimension -> most buckets bound every
    // column to about a quarter of its global span
    val spans = back.groupBy("zbucket")
      .agg((max("l_partkey") - min("l_partkey")).as("ps"),
        (max("l_suppkey") - min("l_suppkey")).as("ss"),
        (max("l_orderkey") - min("l_orderkey")).as("os"))
      .collect()
    def g(c: String) = li.agg(max(c) - min(c)).head.getLong(0)
    val (gp, gs, go) = (g("l_partkey"), g("l_suppkey"), g("l_orderkey"))
    val tight = spans.count(r => r.getAs[Long]("ps") <= gp / 2 + 1 &&
      r.getAs[Long]("ss") <= gs / 2 + 1 && r.getAs[Long]("os") <= go / 2 + 1)
    assert(tight * 2 >= spans.length,
      s"only $tight/${spans.length} buckets 3-D tight (spans $gp,$gs,$go)")
  }

  test("z-ordered write: content identity, disjoint z-slabs, 2-D clustering") {
    val li = graft.Tables(spark, sf0001, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    val out = java.nio.file.Files.createTempDirectory("graft_zorder_spec").toString
    PartitionedSink.writeZOrdered(li, out, "l_partkey", "l_suppkey", nBuckets = 16)
    val back = PartitionedSink.readBack(spark, out).cache()
    try {
      // content identity through the round trip
      assert(back.count() == li.count())
      assert(back.agg(sum("l_orderkey")).head.getLong(0) ==
        li.agg(sum("l_orderkey")).head.getLong(0))

      // recompute z in the same normalized space the writer used
      val mm = li.agg(min("l_partkey"), max("l_partkey"),
        min("l_suppkey"), max("l_suppkey")).head
      val (aMin, aSpan) = (mm.getLong(0), math.max(1L, mm.getLong(1) - mm.getLong(0)))
      val (bMin, bSpan) = (mm.getLong(2), math.max(1L, mm.getLong(3) - mm.getLong(2)))
      val stats = back
        .withColumn("z", ZOrder.zorder2(
          expr(s"((cast(l_partkey as bigint) - $aMin) * 65535) div $aSpan"),
          expr(s"((cast(l_suppkey as bigint) - $bMin) * 65535) div $bSpan")))
        .groupBy(col("zbucket").cast("long").as("bucket"))
        .agg(min("z").as("zmin"), max("z").as("zmax"),
          (max("l_partkey") - min("l_partkey")).as("part_span"),
          (max("l_suppkey") - min("l_suppkey")).as("supp_span"))
        .orderBy("bucket")
        .collect()
      assert(stats.length > 1 && stats.length <= 16)

      // equal-width slabs: every bucket's z-range is disjoint from the next
      stats.sliding(2).foreach { case Array(lo, hi) =>
        assert(lo.getAs[Long]("zmax") < hi.getAs[Long]("zmin"),
          s"overlapping z-slabs: $lo vs $hi")
      }

      // 2-D clustering: a majority of buckets bound BOTH columns to at
      // most half their global span (slabs crossing a high z-curve bit can
      // legitimately span one full dimension — but not most of them)
      val gPart = li.agg(max("l_partkey") - min("l_partkey")).head.getLong(0)
      val gSupp = li.agg(max("l_suppkey") - min("l_suppkey")).head.getLong(0)
      val tight = stats.count(r =>
        r.getAs[Long]("part_span") <= gPart / 2 + 1 &&
        r.getAs[Long]("supp_span") <= gSupp / 2 + 1)
      assert(tight * 2 >= stats.length,
        s"only $tight/${stats.length} buckets are 2-D tight (global spans $gPart×$gSupp)")
    } finally back.unpersist(): Unit
  }
}
