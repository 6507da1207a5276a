package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared PCA driver kernel over the [[OuterProductSum]] Gram buffer
  * — ONE implementation for the batch query (q186/q187) and the
  * streaming incremental maintenance (StreamPipeline.maintainGram):
  * a component recomputed from a merged streaming store is bitwise
  * the batch component because both run exactly this code on exactly
  * the same integers.
  *
  * Exactness contract (the q186 oracle replays it step for step):
  * components quantize ONCE to 1e-4 integers; the scatter matrix
  * M = n·Σxy − Σx·Σy is exact BigInt, converted ONCE per entry to
  * double (correctly rounded); all dots are fixed-order ascending;
  * every normalized iterate snaps to the 1e-6 grid so 1-ulp
  * differences cannot compound across the 10 iterations.
  */
object PowerIteration {

  /** The battery's embedding quantization: 1e-4 fixed point. */
  def quantize(vec: Column): Column =
    transform(vec.cast("array<double>"), x => floor(x * lit(1e4) + lit(0.5)).cast("long"))

  /** Flat Gram buffer [dim² outer | dim sums | count] of a vector
    * column — one map-side aggregate pass, dim²-bounded result. */
  def gramBuffer(df: DataFrame, vecCol: Column, dim: Int): Array[Long] =
    df.agg(OuterProductSum.column(quantize(vecCol), dim).as("b"))
      .collect()(0).getAs[scala.collection.Seq[Long]]("b").toArray

  def dotSeq(a: Array[Double], b: Array[Double]): Double = {
    var sAcc = 0d; var k = 0
    while (k < a.length) { sAcc += a(k) * b(k); k += 1 }; sAcc
  }

  /** 10 snapped power iterations from the all-ones start — the
    * dominant-eigenvector kernel both engines replay step for step. */
  def iterate(m: Array[Array[Double]], dim: Int): Array[Double] = {
    var v = Array.fill(dim)(1d)
    for (_ <- 1 to 10) {
      val w = Array.tabulate(dim)(i => dotSeq(m(i), v))
      val nrm = math.sqrt(dotSeq(w, w))
      v = w.map(x => math.floor(x / nrm * 1e6 + 0.5) / 1e6)
    }
    v
  }

  /** Rayleigh quotient v·Mv / v·v — the eigenvalue in M's units. */
  def rayleigh(m: Array[Array[Double]], v: Array[Double], dim: Int): Double = {
    val mv = Array.tabulate(dim)(i => dotSeq(m(i), v))
    dotSeq(v, mv) / dotSeq(v, v)
  }

  /** Hotelling deflation: M' = M − λ·v·vᵀ — removes the found
    * component so the next [[iterate]] converges to the runner-up. */
  def deflate(m: Array[Array[Double]], v: Array[Double], lam: Double,
              dim: Int): Array[Array[Double]] =
    Array.tabulate(dim, dim)((i, j) => m(i)(j) - lam * v(i) * v(j))

  /** (n, per-dim integer sums, snapped top component, scatter matrix)
    * from a flat Gram buffer. */
  def top(buf: Array[Long], dim: Int): (Long, Array[Long], Array[Double], Array[Array[Double]]) = {
    val n = buf(dim * dim + dim)
    val sxRows = Array.tabulate(dim)(i => buf(dim * dim + i))
    val m = Array.tabulate(dim, dim) { (i, j) =>
      (BigInt(n) * BigInt(buf(i * dim + j)) - BigInt(sxRows(i)) * BigInt(sxRows(j))).toDouble
    }
    (n, sxRows, iterate(m, dim), m)
  }
}
