package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Table profiling (q193) — ONE code path for the batch query and the
  * streaming maintainer (StreamPipeline.profileMaintain).
  *
  * The per-column state is EXACTLY mergeable, so the live form needs
  * no approximation on top of the batch form:
  *  - n_rows / n_null are additive counters;
  *  - the KMV k-min set merges by union → re-k-min (the k smallest of
  *    a union are always within the union of k-smallests — the
  *    standard KMV mergeability), and the merge is a pure array
  *    expression over two ≤k arrays.
  * A maintained store therefore serves a profile BIT-IDENTICAL to a
  * batch rebuild over the same rows, under ANY arrival order
  * (ProfileStreamSpec pins a shuffled split).
  *
  * Canonicalization (the BIGINT pre-hash): numeric/timestamp columns
  * map directly (ints verbatim; doubles to micro-units — injective on
  * ≤2-decimal money data; timestamps to epoch-µs), strings via the
  * md5 detour — every branch replays exactly in ANSI SQL, so the
  * DuckDB oracle reproduces the estimate itself.
  *
  * Scale shape: the counts arm is one aggregate row over one scan;
  * the sketch arm is the KmvMinsAgg bounded heap — map tasks reduce
  * to ≤k distinct hashes per column before the exchange (0.1 MB
  * shuffle vs the exact profile's 464 MB at the 100× probe). The
  * state is |cols| rows with ≤k-long arrays — constant-size forever.
  */
object TableProfile {

  val K: Int = 64

  /** The BIGINT pre-hash for one column. `kind`: "int" | "double" |
    * "ts" | "str". */
  def canon(c: String, kind: String): Column = kind match {
    case "double" => floor(col(c) * lit(1e6) + lit(0.5)).cast("long")
    case "ts" => unix_micros(col(c))
    case "str" => graft.functions.NearDup.md5TokenHash(col(c))
    case _ => col(c).cast("long")
  }

  /** Per-column state over `df`: (col_name, n_rows, n_null,
    * hs: ascending array of the ≤k smallest distinct KMV hashes).
    * ONE scan, one explode, one aggregate: the row/null counters ride
    * the same stacked stream as the sketch (n_null = rows − non-null
    * pre-hashes; KmvMins itself skips null hashes), so the earlier
    * two-arm form's second scan and broadcast join are gone. */
  def state(df: DataFrame, colTypes: Seq[(String, String)], k: Int = K): DataFrame = {
    // Round-16 optimization (guide §2.5 input skew): the explode +
    // md5 + bounded-heap aggregate all run INSIDE the scan stage, so
    // their parallelism is the scan's split count — and parquet can't
    // split below row-group boundaries, which pins a single small
    // file to ~3 tasks however many cores are idle (q193's whole
    // sf0.1 cost was one 3-task stage). Fan the input out to the
    // session's parallelism ONLY when the scan undershoots it: at any
    // real scale splits ≫ cores and this is a no-op — no constant, no
    // extra shuffle where volume exists.
    val in = Skew.fanOut(df)
    val stacked = in.select(explode(array(colTypes.map { case (c, kind) =>
        struct(lit(c).as("col_name"), canon(c, kind).as("t")) }: _*)).as("e"))
      .select(col("e.col_name").as("col_name"), col("e.t").as("t"))
    stacked
      .select(col("col_name"), col("t"), graft.functions.Sketches.kmvHash(col("t")).as("h"))
      .groupBy(col("col_name"))
      .agg(count(lit(1)).as("n_rows"),
        (count(lit(1)) - count(col("t"))).as("n_null"),
        graft.functions.KmvMins.column(col("h"), k).as("hs"))
  }

  /** Merge two state tables: counters add, k-min sets union →
    * re-k-min — a pure array expression, no re-scan of anything. */
  def merge(a: DataFrame, b: DataFrame, k: Int = K): DataFrame =
    a.unionByName(b)
      .groupBy(col("col_name"))
      .agg(sum(col("n_rows")).as("n_rows"), sum(col("n_null")).as("n_null"),
        slice(array_sort(array_distinct(flatten(collect_list(col("hs"))))), 1, k).as("hs"))

  /** The q193 output from a state table: exact counts + the KMV
    * estimate ((kk-1)·P/h_k, exact below k). */
  def profile(st: DataFrame, k: Int = K): DataFrame = {
    def r4(c: Column) = floor(c * lit(10000d) + lit(0.5d)) / lit(10000d)
    val P = graft.functions.Sketches.P
    st.select(col("col_name"), col("n_rows"), col("n_null"),
      r4(when(size(col("hs")) < k, size(col("hs")).cast("double"))
        .otherwise((size(col("hs")) - 1).cast("double") * lit(P.toDouble)
          / element_at(col("hs"), k).cast("double"))).as("n_distinct_est"))
  }
}
