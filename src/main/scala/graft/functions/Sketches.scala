package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Sketch aggregation kernels as typed `Aggregator`s.
  *
  * Why not N parallel `min()`/`sum()` column aggregates: 64 aggregate
  * expressions per group blow past whole-stage-codegen's limits and fall
  * back to per-expression interpreted evaluation — measured 40-60 s at
  * sf0.1 vs seconds for a single compiled buffer. Each Aggregator keeps one
  * primitive-array buffer per group, supports map-side partial aggregation
  * and merge (so the shuffle carries one buffer per (partition, doc), not
  * per token), and runs a tight `while` loop per input.
  */
object Sketches {

  /** MinHash over pre-hashed inputs: buffer i holds
    * min((a_i·x + b_i) mod p) across the group's base hashes x.
    */
  final class MinHashAgg(numPerm: Int, a: Array[Long], b: Array[Long], p: Long)
      extends Aggregator[Long, Array[Long], Seq[Long]] {
    def zero: Array[Long] = Array.fill(numPerm)(Long.MaxValue)
    def reduce(buf: Array[Long], x: Long): Array[Long] = {
      var i = 0
      while (i < numPerm) {
        val h = (a(i) * x + b(i)) % p
        if (h < buf(i)) buf(i) = h
        i += 1
      }
      buf
    }
    def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var i = 0
      while (i < numPerm) { if (y(i) < x(i)) x(i) = y(i); i += 1 }
      x
    }
    def finish(buf: Array[Long]): Seq[Long] = buf.toSeq
    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  }

  /** SimHash-64 over pre-hashed tokens: per-bit ±1 vote, packed to a Long. */
  object SimHashAgg extends Aggregator[Long, Array[Int], Long] {
    def zero: Array[Int] = new Array[Int](64)
    def reduce(buf: Array[Int], h: Long): Array[Int] = {
      var i = 0
      while (i < 64) {
        buf(i) += (if (((h >>> i) & 1L) == 1L) 1 else -1)
        i += 1
      }
      buf
    }
    def merge(x: Array[Int], y: Array[Int]): Array[Int] = {
      var i = 0
      while (i < 64) { x(i) += y(i); i += 1 }
      x
    }
    def finish(buf: Array[Int]): Long = {
      var sig = 0L
      var i = 0
      while (i < 64) { if (buf(i) > 0) sig |= (1L << i); i += 1 }
      sig
    }
    def bufferEncoder: Encoder[Array[Int]] = ExpressionEncoder[Array[Int]]()
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }
}
