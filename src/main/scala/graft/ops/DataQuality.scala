package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality checks (the dbt-tests / Deequ-shaped
  * family): each check yields one (check, column, n_violations) row;
  * a report is the union. The reference's static schema guards
  * (SURVEY §2.2 P4) are the degenerate compile-time form of this —
  * these run against the DATA.
  *
  * Scale shape: all row-local predicates (not-null, accepted-values,
  * range) fold into ONE conditional aggregate — a single
  * partial-agg-friendly corpus scan regardless of how many such checks
  * are registered. Uniqueness is one groupBy on the key; referential
  * integrity is one anti-join per relationship (the orphan side is the
  * probe — the parent dim broadcasts when small, AQE's choice).
  */
object DataQuality {

  /** A row-local predicate check: violation when `bad` is true. */
  final case class RowCheck(name: String, column: String, bad: Column)

  def notNull(c: String): RowCheck =
    RowCheck("not_null", c, col(c).isNull)

  def acceptedValues(c: String, values: Seq[Any]): RowCheck =
    RowCheck("accepted_values", c, !col(c).isin(values: _*) || col(c).isNull)

  def inRange(c: String, lo: Double, hi: Double): RowCheck =
    RowCheck("in_range", c, col(c) < lo || col(c) > hi || col(c).isNull)

  /** All row-local checks in ONE aggregate pass over `df`: one
    * conditional count per check in a single agg, then an
    * explode(array(struct…)) unpivot of the 1-row result. */
  def rowChecks(df: DataFrame, checks: Seq[RowCheck]): DataFrame = {
    require(checks.nonEmpty, "rowChecks: no checks given")
    val aggs = checks.zipWithIndex.map { case (ck, i) =>
      count(when(ck.bad, lit(1))).as(s"v$i")
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(checks.zipWithIndex.map { case (ck, i) =>
        struct(lit(ck.name).as("check"), lit(ck.column).as("column"),
          col(s"v$i").as("n_violations"))
      }: _*)).as("r"))
      .select(col("r.check").as("check"), col("r.column").as("column"),
        col("r.n_violations").as("n_violations"))
  }

  /** Duplicate-key count for a uniqueness check: number of EXTRA rows
    * beyond the first per key (0 when the key is unique). */
  def uniqueKey(df: DataFrame, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .agg(coalesce(sum(col("n") - 1), lit(0L)).as("n_violations"))
      .select(lit("unique").as("check"),
        lit(keyCols.mkString(",")).as("column"), col("n_violations"))

  /** Order-independent table checksum for replica/engine
    * reconciliation: per-row md5 of the null-tagged string encoding,
    * folded with TWO permutation-invariant combiners — XOR (catches
    * value drift; weakness: an even number of identical rows cancels)
    * and modular sum (catches duplicate-row multiplicity; mod 1e9+7
    * keeps |rows| × 1e9 far from long overflow). Comparing checksums
    * of two 100 TB replicas costs one scan each and exchanges 24
    * bytes. */
  def tableChecksum(df: DataFrame, cols: Seq[String]): DataFrame = {
    // \u0001-separated so ("ab","c") and ("a","bc") encode differently;
    // cross-ENGINE comparison additionally requires columns whose
    // string rendering is identical on both sides (integers, strings -
    // not doubles/timestamps, whose formatting is engine-specific)
    val enc = concat_ws("",
      cols.map(c => coalesce(col(c).cast("string"), lit("\\N"))): _*)
    val h = graft.functions.TextOps.md5Long60(enc)
    df.select(h.as("h"))
      .agg(count(lit(1)).as("n_rows"),
        coalesce(bit_xor(col("h")), lit(0L)).as("xor_sum"),
        coalesce(sum(col("h") % 1000000007L), lit(0L)).as("mod_sum"))
  }

  /** Orphan count for a referential-integrity check: child rows whose
    * key has no parent. */
  def referential(child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String): DataFrame =
    child.select(col(childKey))
      .join(parent.select(col(parentKey).as(childKey)),
        Seq(childKey), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit("referential").as("check"),
        lit(childKey).as("column"), col("n_violations"))
}
