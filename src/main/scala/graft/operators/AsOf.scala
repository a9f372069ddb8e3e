package graft.operators

import org.apache.spark.sql.DataFrame

/** Public as-of join API (J5's general form — align each left row with
  * the latest right row at or before it, per key; see
  * org.apache.spark.sql.graft.AsOfJoin for the operator internals and
  * the compose-path comparison). Column names shared between sides are
  * disambiguated by the caller (select/alias first, as with any join).
  *
  * @param toleranceUs  max left.time − right.time in microseconds;
  *                     negative = unbounded (pure "latest at or before")
  */
object AsOf {
  def join(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTimeCol: String, rightTimeCol: String,
      toleranceUs: Long = -1L): DataFrame =
    org.apache.spark.sql.graft.AsOfJoinApi.join(
      left, right, keys, keys, leftTimeCol, rightTimeCol, toleranceUs)

  /** Variant with differently-named keys on the right side (avoids
    * duplicate output column names — as-of join is LEFT OUTER, so all
    * right columns survive into the output). */
  def join2(left: DataFrame, right: DataFrame,
      leftKeys: Seq[String], rightKeys: Seq[String],
      leftTimeCol: String, rightTimeCol: String,
      toleranceUs: Long): DataFrame =
    org.apache.spark.sql.graft.AsOfJoinApi.join(
      left, right, leftKeys, rightKeys, leftTimeCol, rightTimeCol, toleranceUs)
}
