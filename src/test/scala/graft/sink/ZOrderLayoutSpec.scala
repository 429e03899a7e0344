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
