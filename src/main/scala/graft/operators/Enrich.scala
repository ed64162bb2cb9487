package graft.operators

import java.sql.Date

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Derived-column operators (reference `App.scala:166-169, 204-205, 233-236`).
  *
  * All are pure scalar expressions: codegen'd, no shuffle, scale-free.
  * The reference uses wall-clock `current_date()`; the engine takes an
  * explicit as-of date so results are deterministic and oracle-comparable
  * (see FIXTURES.md "Determinism requirements").
  */
object Enrich {

  /** Deterministic stand-in for the reference's `current_date()`
    * (`App.scala:166, 168, 262`) — after the fixtures' max ship date.
    */
  val DefaultAsOf: Date = Date.valueOf("2002-01-01")

  /** `age_in_years = year(asOf) - year_built` (`App.scala:166`). */
  def ageInYears(yearBuilt: Column, asOf: Date = DefaultAsOf): Column =
    year(lit(asOf)) - yearBuilt

  /** `days_on_market` (`App.scala:167-169`): still listed -> days since
    * listing as of `asOf`; removed -> listing duration. Null-aware CASE WHEN.
    */
  def daysOnMarket(listed: Column, removed: Column, asOf: Date = DefaultAsOf): Column =
    when(removed.isNull, datediff(lit(asOf), listed))
      .otherwise(datediff(removed, listed))

  /** Linear transform `hourly_wage * 40 * 52` (`App.scala:204-205`). */
  def annualize(hourlyWage: Column): Column = hourlyWage * 40 * 52

  /** Ratio with the reference's IEEE double semantics (`App.scala:233-236`):
    * x/0 -> +-Infinity, 0/0 -> NaN. Spark 4's default ANSI mode would throw
    * instead, so the zero-denominator cases are branched explicitly (CASE
    * WHEN evaluates lazily — the division never sees a zero).
    */
  def ratio(num: Column, den: Column): Column =
    when(den === 0,
      when(num === 0, lit(Double.NaN))
        .when(num > 0, lit(Double.PositiveInfinity))
        .otherwise(lit(Double.NegativeInfinity)))
      .otherwise(num / den)
}
