package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.ChunkedFrame

/** ChunkedFrame's contract: the two-level (chunk -> block + halo)
  * evaluation equals the direct per-key window BIT FOR BIT, in both
  * the dense regime (many rows per chunk) and the sparse one (chunks
  * far smaller than the frame width, where a frame spans many chunk
  * boundaries and the halo must have composed correctly through the
  * block assembly). */
class ChunkedFrameSpec extends SparkSpec {
  import spark.implicits._

  private def direct(df: org.apache.spark.sql.DataFrame, width: Int) = {
    val fr = Window.partitionBy(col("event_type")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(-width, Window.currentRow)
    df.select(col("event_id"), col("event_type"), col("ts"), col("vd"),
      count(lit(1)).over(fr).as("n_w"),
      sum(col("vd")).over(fr).as("s1"),
      sum(col("vd") * col("vd")).over(fr).as("s2"))
  }

  test("chunked trailing sums equal the direct window on real events") {
    val ev = Tables.events(spark, "/root/testdata/sf0.01")
      .withColumn("vd", col("value").cast("decimal(18,4)"))
      .select(col("event_id"), col("event_type"), col("ts"), col("vd"))
    val a = direct(ev, 19)
    val b = ChunkedFrame.withTrailingDecimalSums(ev, "event_type",
      date_trunc("hour", col("ts")), Seq("ts", "event_id"), "vd", width = 19)
      .select(a.columns.map(col): _*)
    assert(a.count() == b.count() && a.count() > 0)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "chunked evaluation must be bit-identical to the direct window")
  }

  test("sparse chunks (rows per chunk << width) and tiny blocks still compose exactly") {
    // 1 row per hour-chunk, width 19, blockSize 25: every frame spans
    // ~19 chunk boundaries and nearly every block boundary — the
    // adversarial regime for halo assembly.
    val ev = spark.range(0, 500).select(
      col("id").as("event_id"),
      (col("id") % 3).cast("string").as("event_type"),
      (lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")).cast("long")
        + col("id") * 3600).cast("timestamp").as("ts"),
      ((col("id") * 37 % 1000) / lit(10.0)).cast("decimal(18,4)").as("vd"))
    val a = direct(ev, 19)
    val b = ChunkedFrame.withTrailingDecimalSums(ev, "event_type",
      date_trunc("hour", col("ts")), Seq("ts", "event_id"), "vd",
      width = 19, blockSize = 25)
      .select(a.columns.map(col): _*)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  private def directGainLoss(df: org.apache.spark.sql.DataFrame, width: Int) = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("ts"), col("event_id"))
    val fr = w.rowsBetween(-width, Window.currentRow)
    df.withColumn("__df", col("vd") - lag(col("vd"), 1).over(w))
      .select(col("event_id"), col("event_type"),
        sum(when(col("__df") > 0, col("__df")).otherwise(lit(0))).over(fr).as("sg"),
        sum(when(col("__df") < 0, -col("__df")).otherwise(lit(0))).over(fr).as("sl"),
        count(col("__df")).over(fr).as("n_d"))
  }

  test("chunked gain/loss diff sums equal the direct lag+frame window") {
    val ev = Tables.events(spark, "/root/testdata/sf0.01")
      .withColumn("vd", col("value").cast("decimal(18,4)"))
      .select(col("event_id"), col("event_type"), col("ts"), col("vd"))
    val a = directGainLoss(ev, 13)
    val b = ChunkedFrame.withTrailingGainLossSums(ev, "event_type",
      date_trunc("hour", col("ts")), Seq("ts", "event_id"), "vd", width = 13)
      .select(a.columns.map(col): _*)
    assert(a.count() == b.count() && a.count() > 0)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "chunked diff-frame evaluation must be bit-identical to the direct window")
  }

  test("gain/loss halo composes across tiny blocks (derived-value lookback edge)") {
    // blockSize 25, width 13: the halo is 14 rows and nearly every
    // frame crosses a block boundary — if the halo were only `width`
    // wide, the earliest in-frame diff would lose its lag predecessor
    // and the first body row of each block would drift.
    val ev = spark.range(0, 500).select(
      col("id").as("event_id"),
      (col("id") % 3).cast("string").as("event_type"),
      (lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")).cast("long")
        + col("id") * 3600).cast("timestamp").as("ts"),
      ((col("id") * 37 % 1000) / lit(10.0)).cast("decimal(18,4)").as("vd"))
    val a = directGainLoss(ev, 13)
    val b = ChunkedFrame.withTrailingGainLossSums(ev, "event_type",
      date_trunc("hour", col("ts")), Seq("ts", "event_id"), "vd",
      width = 13, blockSize = 25)
      .select(a.columns.map(col): _*)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("globalRank equals row_number - 1 under the direct per-key window") {
    val ev = Tables.events(spark, "/root/testdata/sf0.01")
      .select(col("event_id"), col("event_type"), col("value"))
    val direct = ev.withColumn("g",
      row_number().over(Window.partitionBy(col("event_type"))
        .orderBy(col("value"), col("event_id"))) - 1)
      .select(col("event_id"), col("g").cast("long"))
    val chunked = ChunkedFrame.globalRank(ev, "event_type",
      floor(col("value")), Seq("value", "event_id"))
      .select(col("event_id"), col("__g").as("g"))
    assert(direct.exceptAll(chunked).isEmpty && chunked.exceptAll(direct).isEmpty,
      "two-level prefix rank must reproduce row_number exactly")
  }

  test("ntile arithmetic over (g, N) matches native ntile at every small N") {
    // q127 derives ntile(4) from the global rank instead of sorting
    // each key wholesale; the uneven-remainder edge (first N%n tiles
    // take one extra row) is exactly where a naive g*n/N formula
    // breaks — exercise every N in 1..25 as its own key.
    val rows = (1 to 25).flatMap(n => (0 until n).map(i => (s"k$n", i.toLong)))
    val df = rows.toDF("k", "v")
    val native = df.withColumn("t",
      ntile(4).over(Window.partitionBy(col("k")).orderBy(col("v"))).cast("long"))
    val totals = df.groupBy(col("k")).agg(count(lit(1)).as("__n"))
    val derived = df.join(broadcast(totals), Seq("k"))
      .withColumn("__g", col("v")) // v IS the 0-based rank by construction
      .withColumn("t2",
        when(col("__g") < (expr("__n DIV 4") + 1) * expr("__n % 4"),
          expr("__g DIV (__n DIV 4 + 1)") + 1)
          .otherwise(expr("__n % 4") +
            expr("(__g - (__n DIV 4 + 1) * (__n % 4)) DIV (__n DIV 4)") + 1)
          .cast("long"))
    val diff = native.select(col("k"), col("v"), col("t"))
      .join(derived.select(col("k"), col("v"), col("t2")), Seq("k", "v"))
      .filter(col("t") =!= col("t2"))
    assert(diff.isEmpty, "derived ntile must match native ntile for all group sizes")
  }

  test("chunked running max equals the direct unbounded window on real events") {
    val ev = Tables.events(spark, "/root/testdata/sf0.01")
      .select(col("event_id"), col("event_type"), col("ts"), col("value"))
    val run = Window.partitionBy(col("event_type")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val a = ev.select(col("event_id"), col("event_type"),
      max(col("value")).over(run).as("peak"))
    val b = ChunkedFrame.withRunningMax(ev, "event_type",
      date_trunc("hour", col("ts")), Seq("ts", "event_id"), "value", "peak")
      .select(a.columns.map(col): _*)
    assert(a.count() == b.count() && a.count() > 0)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "chunked running max must be bit-identical to the direct window")
  }

  test("chunked running sum equals the direct unbounded window (dense, sparse, null prefixes)") {
    // dense: real events, exact long values (json k field)
    val evd = Tables.events(spark, "/root/testdata/sf0.01")
      .select(col("event_id"), col("event_type"), col("ts"),
        get_json_object(col("props"), "$.k").cast("long").as("v"))
    val run = Window.partitionBy(col("event_type")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val a = evd.select(col("event_id"), col("event_type"), sum(col("v")).over(run).as("rs"))
    val b = ChunkedFrame.withRunningSum(evd, "event_type",
      date_trunc("hour", col("ts")), Seq("ts", "event_id"), "v", "rs")
      .select(a.columns.map(col): _*)
    assert(a.count() == b.count() && a.count() > 0)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "chunked running sum must be bit-identical to the direct window")
    // sparse chunks + leading null runs + an all-null mid-chunk: the
    // when-guard must reproduce sum()'s ignore-nulls semantics
    val evs = spark.range(0, 300).select(
      col("id").as("event_id"),
      (col("id") % 3).cast("string").as("event_type"),
      (lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")).cast("long")
        + col("id") * 3600).cast("timestamp").as("ts"),
      when(col("id") < 30 || col("id").between(150, 170), lit(null).cast("long"))
        .otherwise((col("id") * 37 % 100) - 50).as("v"))
    val a2 = evs.select(col("event_id"), col("event_type"), sum(col("v")).over(run).as("rs"))
    val b2 = ChunkedFrame.withRunningSum(evs, "event_type",
      date_trunc("hour", col("ts")), Seq("ts", "event_id"), "v", "rs")
      .select(a2.columns.map(col): _*)
    assert(a2.count() == b2.count())
    assert(a2.exceptAll(b2).isEmpty && b2.exceptAll(a2).isEmpty)
  }

  test("running max: sparse chunks, ties, and null prefixes compose exactly") {
    // 1 row/hour-chunk (every prefix crosses chunk boundaries), value
    // ties across chunks, and a leading all-null run per key — the
    // null-semantics edge where greatest() must reproduce max()'s
    // ignore-nulls behavior.
    val ev = spark.range(0, 300).select(
      col("id").as("event_id"),
      (col("id") % 3).cast("string").as("event_type"),
      (lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")).cast("long")
        + col("id") * 3600).cast("timestamp").as("ts"),
      when(col("id") < 30, lit(null).cast("double"))
        .otherwise((col("id") * 37 % 100).cast("double")).as("value"))
    val run = Window.partitionBy(col("event_type")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val a = ev.select(col("event_id"), col("event_type"),
      max(col("value")).over(run).as("peak"))
    val b = ChunkedFrame.withRunningMax(ev, "event_type",
      date_trunc("hour", col("ts")), Seq("ts", "event_id"), "value", "peak")
      .select(a.columns.map(col): _*)
    assert(a.count() == b.count())
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("running max: seeded-random corpora (duplicate ts, negatives, scattered nulls) stay exact") {
    import spark.implicits._
    for (seed <- Seq(7, 23, 91)) {
      val rnd = new scala.util.Random(seed)
      val rows = (0 until 800).map { i =>
        (i.toLong,
          s"k${rnd.nextInt(4)}",
          // duplicate timestamps ACROSS keys and within keys: the
          // (ts, event_id) order prefix must disambiguate
          new java.sql.Timestamp(1704067200000L + rnd.nextInt(50) * 3600000L + rnd.nextInt(3) * 1000L),
          if (rnd.nextInt(10) == 0) None else Some(rnd.nextDouble() * 200 - 100))
      }
      val ev = rows.toDF("event_id", "event_type", "ts", "value")
      val run = Window.partitionBy(col("event_type")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val a = ev.select(col("event_id"), col("event_type"),
        max(col("value")).over(run).as("peak"))
      val b = ChunkedFrame.withRunningMax(ev, "event_type",
        date_trunc("hour", col("ts")), Seq("ts", "event_id"), "value", "peak")
        .select(a.columns.map(col): _*)
      assert(a.count() == b.count())
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty, s"seed $seed diverged")
    }
  }

  test("running max never partitions a window by the bare key") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("event_type"), col("ts"), col("value"))
    val plan = ChunkedFrame.withRunningMax(ev, "event_type",
      date_trunc("hour", col("ts")), Seq("ts", "event_id"), "value", "peak")
      .queryExecution.optimizedPlan.toString
    val windowSpecs = plan.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windowSpecs.nonEmpty)
    windowSpecs.foreach { l =>
      assert(!l.matches(".*windowspecdefinition\\(event_type#\\d+, [a-z_]+#\\d+L? ASC.*"),
        s"window partitions by bare key:\n$l")
    }
  }

  test("the frame window never partitions by the bare key (the parallelism ceiling)") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("vd", col("value").cast("decimal(18,4)"))
      .select(col("event_id"), col("event_type"), col("ts"), col("vd"))
    val plan = ChunkedFrame.withTrailingDecimalSums(ev, "event_type",
      date_trunc("hour", col("ts")), Seq("ts", "event_id"), "vd", width = 19)
      .queryExecution.optimizedPlan.toString
    // every Window node must carry a composite partition spec —
    // (key, chunk) or (key, block) — never event_type alone
    val windowSpecs = plan.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windowSpecs.nonEmpty)
    windowSpecs.foreach { l =>
      assert(!l.matches(".*windowspecdefinition\\(event_type#\\d+, [a-z_]+#\\d+L? ASC.*"),
        s"window partitions by bare key:\n$l")
    }
  }

  private def chain(t: Throwable): String =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")

  test("hot-chunk guard: a band past maxChunkRows dies loudly on every entry point") {
    // round-15 Next #2 (the DayGrid move one level down): a chunk
    // expression that collapses a key's order domain — here lit(1) —
    // grows one (key, chunk) band without bound; each entry point
    // must fail with the band named, BEFORE the local-rank sort
    // becomes a silent multi-GB task. 10 rows, bound 5.
    val df = (1 to 10).map(i => ("a", i.toLong, i.toLong)).toDF("k", "ts", "v")
      .withColumn("vd", col("v").cast("decimal(18,4)"))
    def boom(caller: String)(f: => Unit): Unit = {
      val msg = chain(intercept[Exception](f))
      assert(msg.contains(s"$caller: a single (key, chunk) band exceeds 5 rows"),
        s"expected the $caller band-contract failure, got: $msg")
      assert(msg.contains("10 rows for key a"), s"band not named: $msg")
    }
    boom("ChunkedFrame.globalRank") {
      ChunkedFrame.globalRank(df, "k", lit(1), Seq("ts"),
        maxChunkRows = 5).collect()
    }
    boom("ChunkedFrame.globalRank") { // the trailing-frame family rides globalRank
      ChunkedFrame.withTrailingDecimalSums(df, "k", lit(1), Seq("ts"), "vd",
        width = 3, maxChunkRows = 5).collect()
    }
    boom("ChunkedFrame.globalRank") {
      ChunkedFrame.withTrailingGainLossSums(df, "k", lit(1), Seq("ts"), "vd",
        width = 3, maxChunkRows = 5).collect()
    }
    boom("ChunkedFrame.withRunningSums") {
      ChunkedFrame.withRunningSum(df, "k", lit(1), Seq("ts"), "v", "rs",
        maxChunkRows = 5).collect()
    }
    boom("ChunkedFrame.withRunningMax") {
      ChunkedFrame.withRunningMax(df, "k", lit(1), Seq("ts"), "v", "rm",
        maxChunkRows = 5).collect()
    }
  }

  test("hot-chunk guard: at exactly the bound every value is untouched") {
    // the guard is when()-wrapped around the band prefix each output
    // row reads — at cnt == bound it must pass through bit-identically
    val df = (1 to 10).map(i => ("a", i.toLong, i.toLong)).toDF("k", "ts", "v")
    val rs = ChunkedFrame.withRunningSum(df, "k", lit(1), Seq("ts"), "v", "rs",
        maxChunkRows = 10)
      .orderBy("ts").select("rs").as[Long].collect()
    assert(rs.toSeq == (1 to 10).map(i => i.toLong * (i + 1) / 2))
    val g = ChunkedFrame.globalRank(df, "k", lit(1), Seq("ts"),
        maxChunkRows = 10)
      .orderBy("ts").select("__g").as[Long].collect()
    assert(g.toSeq == (0L until 10L))
  }
}
