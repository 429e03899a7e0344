package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The vector kernels implement real `doGenCode` (no CodegenFallback).
  * CODEGEN_ONLY forces generated evaluation — a broken doGenCode throws
  * here instead of silently falling back — and NO_CODEGEN pins the
  * interpreted twin; both must produce bit-identical results. */
class VectorCodegenSpec extends SparkSpec {
  import spark.implicits._

  private val modeKey = "spark.sql.codegen.factoryMode"

  private def results(): Seq[(Double, Double, Long, Double)] = {
    val df = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0), Seq("a", "c", "e"), Seq("b", "c", "e")),
      (Seq(0.5, -1.5), Seq(2.0, 2.0), Seq("x"), Seq("x")),
      (Seq.empty[Double], Seq(1.0), Seq.empty[String], Seq("q")))
      .toDF("va", "vb", "sa", "sb")
    df.select(
      vectors.dot_product(col("va"), col("vb")).as("dot"),
      vectors.cosine_similarity(col("va"), col("vb")).as("cos"),
      vectors.sorted_intersect_count(col("sa"), col("sb")).as("common"),
      vectors.math_ln(col("vb").getItem(0)).as("ln"))
      .collect().toSeq
      .map(r => (r.getDouble(0), r.getDouble(1), r.getLong(2), r.getDouble(3)))
  }

  test("int8 pack/dot: byte layout, exact dots, codegen parity, range guard") {
    val df = Seq(
      (Seq(127L, -127L, 0L, 1L), Seq(127L, 127L, 5L, -2L)),
      (Seq(-128L, 127L), Seq(127L, -128L))).toDF("a", "b")
    def run(): Seq[Long] = df.select(
      vectors.int8_dot(vectors.int8_pack(col("a")), vectors.int8_pack(col("b")))
        .as("d")).collect().toSeq.map(_.getLong(0))
    val prior = spark.conf.getOption(modeKey)
    try {
      spark.conf.set(modeKey, "CODEGEN_ONLY")
      val gen = run()
      spark.conf.set(modeKey, "NO_CODEGEN")
      val interp = run()
      assert(gen == interp)
      assert(gen == Seq(127L * 127 - 127L * 127 + 0 - 2, -128L * 127 + 127L * -128))
    } finally prior match {
      case Some(v) => spark.conf.set(modeKey, v)
      case None => spark.conf.unset(modeKey)
    }
    // packed form is exactly dim bytes — the 4×-vs-float32 bandwidth cut
    val bytes = df.select(vectors.int8_pack(col("a")).as("p"))
      .collect().map(_.getAs[Array[Byte]](0))
    assert(bytes(0).length == 4 && bytes(0).toSeq == Seq[Byte](127, -127, 0, 1))
    // out-of-int8-range values throw instead of silently clamping
    val err = intercept[Exception] {
      Seq(Seq(128L)).toDF("a").select(vectors.int8_pack(col("a"))).collect()
    }
    assert(err.getMessage != null)
  }

  test("generated and interpreted evaluation agree bit-for-bit") {
    val prior = spark.conf.getOption(modeKey)
    try {
      spark.conf.set(modeKey, "CODEGEN_ONLY")
      val gen = results()
      spark.conf.set(modeKey, "NO_CODEGEN")
      val interp = results()
      // bit-pattern compare so the NaN cosine of the empty-vector row
      // counts as equal to itself
      def bits(t: (Double, Double, Long, Double)) =
        (java.lang.Double.doubleToLongBits(t._1), java.lang.Double.doubleToLongBits(t._2),
          t._3, java.lang.Double.doubleToLongBits(t._4))
      assert(gen.map(bits) == interp.map(bits))
      // spot-check absolute values (dot = 4+10+18; cos of the x-x pair = 1
      // up to fp; merge-count intersections; ln(4))
      assert(gen.head._1 == 32.0)
      assert(math.abs(gen(1)._2 - (0.5 * 2.0 - 1.5 * 2.0) /
        (math.sqrt(0.25 + 2.25) * math.sqrt(8.0))) < 1e-15)
      assert(gen.head._3 == 2L && gen(1)._3 == 1L && gen(2)._3 == 0L)
      assert(gen.head._4 == Math.log(4.0))
    } finally {
      prior match {
        case Some(v) => spark.conf.set(modeKey, v)
        case None => spark.conf.unset(modeKey)
      }
    }
  }
}
