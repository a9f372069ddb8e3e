package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ER — field-level survivorship ("golden record" merge): after entity
  * resolution clusters duplicate records (`Components.resolveEntities`,
  * the link step the reference's correlation server would need to unify
  * one device seen under MAC-randomized aliases — README.md:16-19),
  * each cluster's records merge into ONE survivor row, with a per-field
  * election rule rather than a whole-row winner (that whole-row form is
  * `Components.clusterRepresentatives`): take the freshest status, the
  * max price, the most frequent category — classic MDM survivorship.
  *
  * Scale shape (SURVEY §4): every rule is a map-combinable aggregate —
  * Max/Min/Latest ride ONE groupBy over the records (Latest is the
  * arg-max struct trick, no window over the data), and each Mode field
  * adds one (key, value)-count pass whose second level is
  * key-cardinality-sized. The shuffles carry (key, field) slivers, never
  * whole records; nothing collects, nothing windows partitionless.
  */
object Survivorship {

  /** Per-field election rule. All ties resolve deterministically. */
  sealed trait Rule
  /** Largest value wins (orderable types). */
  final case class MaxOf(field: String) extends Rule
  /** Smallest value wins. */
  final case class MinOf(field: String) extends Rule
  /** Value carried by the record with the greatest (orderCol, tieCol) —
    * "freshest wins" when orderCol is a timestamp/version. */
  final case class LatestOf(field: String, orderCol: String, tieCol: String)
      extends Rule
  /** Most frequent value wins; ties break toward the SMALLEST value so
    * the election is deterministic under any partitioning. */
  final case class ModeOf(field: String) extends Rule

  /** One survivor row per `keyCol` cluster: (keyCol, n_records,
    * <one column per rule, named by the caller>). `rules` output names
    * must be unique and must not collide with `keyCol`/`n_records`. */
  def goldenRecord(records: DataFrame, keyCol: String,
      rules: Seq[(String, Rule)]): DataFrame = {
    require(rules.nonEmpty, "goldenRecord needs at least one rule")
    val outs = rules.map(_._1)
    require(outs.distinct.size == outs.size,
      s"duplicate output names in rules: ${outs.diff(outs.distinct).mkString(", ")}")
    require(!outs.contains(keyCol) && !outs.contains("n_records"),
      s"rule output names must not collide with '$keyCol'/'n_records'")

    // one groupBy carries count + every non-mode rule (arg-max struct
    // for Latest: the aggregate IS the election, no per-key sort)
    val simpleAggs: Seq[Column] = rules.collect {
      case (out, MaxOf(f))  => max(col(f)).as(out)
      case (out, MinOf(f))  => min(col(f)).as(out)
      case (out, LatestOf(f, o, t)) =>
        max(struct(col(o).as("_o"), col(t).as("_t"), col(f).as("_v")))
          .getField("_v").as(out)
    }
    val base = records.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_records"), simpleAggs: _*)

    // each mode field: (key, value) counts → min-struct((-n, value)) =
    // highest count, smallest value at ties (the same election used by
    // resolveEntities' canonical pick)
    val withModes = rules.collect { case (out, ModeOf(f)) => (out, f) }
      .foldLeft(base) { case (acc, (out, f)) =>
        val mode = records.groupBy(col(keyCol), col(f).as("_mv"))
          .agg(count(lit(1)).as("_mn"))
          .groupBy(col(keyCol))
          .agg(min(struct((-col("_mn")).as("_nn"), col("_mv").as("_v")))
            .getField("_v").as(out))
        acc.join(mode, Seq(keyCol))
      }
    // stable column order: key, n_records, rules in caller order
    withModes.select(col(keyCol) +: col("n_records") +: outs.map(col): _*)
  }
}
