package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyed MERGE upsert, engine-side.
  *
  * Reference: both Snowflake loaders stage rows then run
  * `MERGE INTO target USING stage ON pk WHEN MATCHED THEN UPDATE WHEN
  * NOT MATCHED THEN INSERT` (load_to_snowflake.py:220-241,
  * realtime_load_to_snowflake.py:225-250). No warehouse here: the same
  * semantics as a full-outer-join rewrite producing the post-merge
  * snapshot. Running it inside foreachBatch with a PK makes
  * at-least-once delivery idempotent — the same exactly-once-per-key
  * trick the reference gets from Snowflake MERGE.
  *
  * Scale: one shuffle on the key columns for the join (or a broadcast
  * when the source micro-batch is small — Catalyst/AQE decides). For a
  * partitioned target table, pair with dynamic partition overwrite so
  * only touched partitions rewrite.
  */
object MergeUpsert {

  /** Post-merge snapshot: source rows win on key match ("when matched
    * update all"), unmatched source rows insert, unmatched target rows
    * carry over. Source must be unique per key (pre-dedup with
    * Dedup.keepLast for pandas keep='last' parity). Both sides must
    * share the same schema: keys ++ value columns. */
  def upsert(target: DataFrame, source: DataFrame, keys: Seq[String]): DataFrame = {
    val valueCols = target.columns.filterNot(keys.contains)
    require(source.columns.sorted.sameElements(target.columns.sorted),
      s"schema mismatch: ${source.columns.mkString(",")} vs ${target.columns.mkString(",")}")
    val t = target.select(target.columns.map(c => col(c).as(s"t_$c")).toIndexedSeq: _*)
    val s = source.select(source.columns.map(c => col(c).as(s"s_$c")).toIndexedSeq: _*)
    val cond = keys.map(k => t(s"t_$k") === s(s"s_$k")).reduce(_ && _)
    val merged = t.join(s, cond, "full_outer")
    val outCols: Seq[Column] =
      keys.map(k => coalesce(col(s"s_$k"), col(s"t_$k")).as(k)) ++
        valueCols.map { c =>
          // source wins only when its key matched/inserted; use the key
          // presence (never null on source rows) as the discriminator so
          // legitimately-null source values still overwrite.
          when(col(s"s_${keys.head}").isNotNull, col(s"s_$c")).otherwise(col(s"t_$c")).as(c)
        }
    merged.select(outCols: _*)
  }

  /** Upsert + `last_updated` stamping as the reference loaders do
    * (load_to_snowflake.py:161). Timestamp injected for determinism. */
  def upsertStamped(target: DataFrame, source: DataFrame, keys: Seq[String], loadTs: java.sql.Timestamp): DataFrame =
    upsert(target, source.withColumn("last_updated", lit(loadTs)),
      keys) // target must already carry last_updated

  /** SCHEMA-EVOLUTION upsert: align source and target BY NAME with an
    * explicit per-class policy, instead of [[upsert]]'s exact-schema
    * require (the reference re-creates DDL per run and would silently
    * start failing when a producer adds a field — at 100 TB scale,
    * upstream schema drift is an operating condition, not an error):
    *
    *  - ADDED source columns extend the output schema; pre-existing
    *    target rows read NULL there (warehouse ADD COLUMN semantics);
    *  - DROPPED source columns survive: matched rows KEEP the target
    *    value (an absent column is "no opinion", NOT an overwrite
    *    with null — the rule [[upsert]]'s source-wins discriminator
    *    could not express); fresh inserts read NULL there;
    *  - RETYPED common columns fail fast with the exact drift listed
    *    — silent coercion is how a warehouse corrupts quietly;
    *  - keys must exist on both sides, always.
    *
    * Same single-shuffle full-outer plan as [[upsert]]. */
  def upsertEvolve(target: DataFrame, source: DataFrame, keys: Seq[String]): DataFrame = {
    val tCols = target.columns.toSeq
    val sCols = source.columns.toSeq
    require(keys.forall(tCols.contains) && keys.forall(sCols.contains),
      s"merge keys ${keys.mkString(",")} must exist on both sides")
    val retyped = tCols.intersect(sCols).filter(c =>
      target.schema(c).dataType != source.schema(c).dataType)
    require(retyped.isEmpty,
      s"column type drift, refusing to coerce silently: " +
        retyped.map(c => s"$c ${target.schema(c).dataType.simpleString}->" +
          source.schema(c).dataType.simpleString).mkString(", "))
    val added = sCols.filterNot(tCols.contains)
    val dropped = tCols.filterNot(sCols.contains).filterNot(keys.contains)
    val commonVals = tCols.filter(sCols.contains).filterNot(keys.contains)
    val t = target.select(tCols.map(c => col(c).as(s"t_$c")).toIndexedSeq: _*)
    val s = source.select(sCols.map(c => col(c).as(s"s_$c")).toIndexedSeq: _*)
    val cond = keys.map(k => t(s"t_$k") === s(s"s_$k")).reduce(_ && _)
    val srcPresent = col(s"s_${keys.head}").isNotNull
    val outCols: Seq[Column] =
      keys.map(k => coalesce(col(s"s_$k"), col(s"t_$k")).as(k)) ++
        commonVals.map(c => when(srcPresent, col(s"s_$c")).otherwise(col(s"t_$c")).as(c)) ++
        dropped.map(c => col(s"t_$c").as(c)) ++ // absent from source = no opinion
        added.map(c => col(s"s_$c").as(c))      // target rows read null
    t.join(s, cond, "full_outer").select(outCols: _*)
  }
}
