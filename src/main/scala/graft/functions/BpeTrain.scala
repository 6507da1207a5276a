package graft.functions

import scala.collection.mutable.ListBuffer

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BYTE-PAIR-ENCODING tokenizer training (Sennrich, Haddow, Birch —
  * "Neural Machine Translation of Rare Words with Subword Units", ACL
  * 2016) as DataFrame rounds — the iterative highest-frequency-pair
  * loop, shaped like [[Similarity.lloydIterate]]:
  *
  *  - the corpus collapses ONCE to the word-TYPE table (word, count)
  *    — at 100 TB that is vocabulary-sized, not corpus-sized, and it
  *    is the only data the training loop ever touches;
  *  - each word is a DOUBLE-SPACE-joined symbol string seeded with
  *    its characters plus a `</w>` end marker;
  *  - each round counts adjacent symbol pairs weighted by word count
  *    (one partial-agg shuffle of pair types), picks the max-count
  *    pair with (a, b) lexicographic tiebreak — a 1-row action, the
  *    round's only driver traffic — and rewrites every sequence with
  *    plain string `replace`;
  *  - persists rotate per round so lineage stays one round deep.
  *
  * WHY double spaces: `replace` scans left-to-right, non-overlapping,
  * continuing AFTER each replacement — so with single-space joins,
  * " a b " consumes the boundary space shared with a following
  * occurrence and "b a n a n a" merges (a,n) only once per pass,
  * unlike reference BPE (whose regex uses non-consuming lookarounds —
  * unavailable here because DuckDB's RE2 has no lookbehind). With
  * two-space gaps, the pattern " a  b " takes one space from each
  * side, every gap stays two spaces after replacement, and adjacent
  * occurrences all merge while overlapping ones stay greedy-left —
  * exactly the reference semantics, from a plain replace that behaves
  * identically in Spark and DuckDB. That parity is what lets the
  * oracle replay the entire training loop.
  *
  * The learned merge sequence IS the tokenizer: applying merges in
  * order ([[applyMerges]]) tokenizes any text with the trained vocab,
  * making token counts faithful to how an LLM pipeline counts (vs the
  * regex approximation of `bpeishTokens`).
  */
object BpeTrain {

  private val Sep = "  " // two spaces — see class doc

  /** Seed symbol sequence: double-space-joined characters + end
    * marker, padded with two spaces each side. SQL substring form
    * (not regex split) so the oracle derives identical symbols. */
  private def charSeq(word: Column): Column =
    concat(lit(Sep),
      concat_ws(Sep, transform(sequence(lit(1), length(word)),
        i => call_function("substring", word, i, lit(1)))),
      lit(Sep + "</w>" + Sep))

  private def mergeOnce(seq: Column, a: String, b: String): Column =
    call_function("replace", seq, lit(s" $a  $b "), lit(s" ${a + b} "))

  /** The word-type table: (w, wn) distinct words with occurrence
    * counts over `textCol` of `docs`. */
  def wordTypes(docs: DataFrame, textCol: Column): DataFrame =
    docs.select(explode(TextAnalysis.wordTokens(textCol)).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("wn"))

  /** Adjacent-pair counts over the current sequences: (a, b, n) with
    * n = occurrences weighted by word count. */
  private def pairCounts(seqs: DataFrame): DataFrame =
    seqs
      .select(col("wn"), split(trim(col("seq")), Sep).as("syms"))
      // a fully-merged word (one symbol) has no pairs — and must be
      // filtered BEFORE the transform: Spark's sequence(1, 0) counts
      // DOWN to [1, 0] and element_at(_, 0) throws
      .filter(size(col("syms")) >= 2)
      .select(col("wn"), explode(expr(
        "transform(sequence(1, size(syms) - 1), i -> struct(element_at(syms, i) AS a, element_at(syms, i + 1) AS b))")).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("wn")).as("n"))

  /** Train `merges` BPE merge steps. Returns the merge table
    * (step, sym_a, sym_b, pair_n, merged) in training order.
    *
    * GUARDED HYBRID (the [[graft.operators.ConnectedComponents]]
    * regime call): the loop's working set is the word-TYPE table,
    * which is vocabulary-sized — when it fits comfortably on the
    * driver (<= `driverMaxTypes` rows) the identical algorithm runs
    * there in one pass instead of paying 2 Spark jobs per merge round
    * (a 1,000-word vocabulary does not need a cluster 24 times).
    * Above the gate, DataFrame rounds with rotating persists — the
    * 100 TB path, where even a billion-doc corpus yields a word-type
    * table of merely millions of rows. BpeSpec pins both paths to
    * identical merge sequences. */
  def train(spark: SparkSession, docs: DataFrame, textCol: Column, merges: Int,
            driverMaxTypes: Long = 1000000L): DataFrame = {
    require(merges >= 1)
    val types = wordTypes(docs, textCol)
    // One action decides the regime AND feeds the driver path: collect
    // at most gate+1 rows — if the cap wasn't hit, that IS the full
    // word-type table (no second aggregation pass), else fall through
    // to the distributed loop. The gate clamps so a caller passing a
    // > Int.MaxValue threshold degrades to "largest collectable" rather
    // than overflowing limit() into a negative AnalysisException.
    val gate = math.min(driverMaxTypes, Int.MaxValue - 1L).toInt
    val sample = types.limit(gate + 1).collect()
    val learned =
      if (sample.length <= gate)
        trainDriver(sample.map(r => (r.getString(0), r.getLong(1))), merges)
      else trainDistributed(spark, types, merges)
    import spark.implicits._
    learned.toSeq.toDF("step", "sym_a", "sym_b", "pair_n")
      .select(col("step").cast("long").as("step"), col("sym_a"), col("sym_b"),
        col("pair_n"), concat(col("sym_a"), col("sym_b")).as("merged"))
  }

  /** Driver-regime training: same sequences, same counts, same
    * tiebreaks, same greedy replace semantics as the DataFrame path. */
  private def trainDriver(types: Array[(String, Long)],
                          merges: Int): Seq[(Int, String, String, Long)] = {
    var seqs: Array[(Array[String], Long)] =
      types.map { case (w, wn) => ((1 to w.length).map(i => w.substring(i - 1, i)).toArray :+ "</w>", wn) }
    val learned = ListBuffer.empty[(Int, String, String, Long)]
    for (step <- 1 to merges) {
      val counts = collection.mutable.HashMap.empty[(String, String), Long]
      seqs.foreach { case (syms, wn) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + wn)
          i += 1
        }
      }
      if (counts.nonEmpty) {
        val ((a, b), n) = counts.minBy { case ((a, b), n) => (-n, a, b) }
        learned += ((step, a, b, n))
        // greedy left-to-right non-overlapping merge — the array form
        // of the two-space replace
        seqs = seqs.map { case (syms, wn) =>
          val out = collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
              out += (a + b); i += 2
            } else { out += syms(i); i += 1 }
          }
          (out.toArray, wn)
        }
      }
    }
    learned.toSeq
  }

  private def trainDistributed(spark: SparkSession, types: DataFrame,
                               merges: Int): Seq[(Int, String, String, Long)] = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    var seqs = types
      .select(col("w"), col("wn"), charSeq(col("w")).as("seq"))
      .persist(lvl)
    val learned = ListBuffer.empty[(Int, String, String, Long)]
    try {
      for (step <- 1 to merges) {
        val top = pairCounts(seqs)
          .orderBy(col("n").desc, col("a"), col("b"))
          .limit(1).collect()
        if (top.nonEmpty) {
          val (a, b, n) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
          learned += ((step, a, b, n))
          val next = seqs.withColumn("seq", mergeOnce(col("seq"), a, b)).persist(lvl)
          next.count()
          seqs.unpersist(blocking = false)
          seqs = next
        }
      }
    } finally seqs.unpersist(blocking = false)
    learned.toSeq
  }

  /** Tokenize with a trained merge list: per word, apply every merge
    * in training order (the standard BPE inference rule) and count
    * the resulting symbols. Pure column expression — the nested
    * replace chain is built once on the driver from the (small) merge
    * table and runs codegen'd over any corpus size. */
  def applyMerges(word: Column, merges: Seq[(String, String)]): Column = {
    val merged = merges.foldLeft(charSeq(word)) { case (c, (a, b)) => mergeOnce(c, a, b) }
    size(split(trim(merged), Sep))
  }
}
