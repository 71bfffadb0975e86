package newspipe.io

import org.apache.spark.sql.types._

/** Schema-evolution arbitration for the lake's add-files commits
  * ([[Lake.appendAtomic]], [[Lake.mergeInto]]) — the commit-time
  * compatibility check Delta performs and a plain parquet append lacks.
  *
  * Two failure modes this guards:
  *
  *  1. '''Poisoned layer head''': an increment whose column shares a name
  *     with the recorded schema but carries an incompatible type would
  *     commit fine (parquet files are self-describing) and then fail every
  *     subsequent read of the layer at scan time (explicit-schema vs
  *     physical-type conversion error) until a restore. Commit is the only
  *     place this is cheap to stop.
  *  2. '''Silent lossy coercion''': union-based merge rewrites inherit
  *     Spark's set-operation type widening, which happily resolves
  *     `int` vs `string` to `string` — recording a schema the carried
  *     parquet files can not be read with.
  *
  * Widening is allowed along the exact promotions Spark 4's parquet
  * vectorized reader performs when the requested schema is wider than the
  * file's physical type (verified against this build): the integral chain
  * `byte → short → int → long`, `float → double`, exact
  * integral-to-double (`byte/short/int → double`; `long → double` is
  * REFUSED — 64-bit integers don't fit a 53-bit mantissa), and the
  * Delta 3.x decimal matrix (also reader-verified on this build):
  * `decimal(p,s) → decimal(p′,s′)` whenever no digit can be lost —
  * integer digits don't shrink (`p′−s′ ≥ p−s`) and scale doesn't shrink
  * (`s′ ≥ s`) — plus integral-to-decimal when the integral range fits the
  * target's integer digits (`byte/short/int/long → decimal` with
  * `p−s ≥ 3/5/10/20`): the money-column migration. A widened
  * commit records the wider type; files written before it read through
  * promotion, no rewrite. An increment NARROWER than the recorded type
  * needs no schema change at all — its files promote on read the same way.
  */
object SchemaEvolution {

  /** Can a value of `from` be read as `to` with zero information loss by
    * the parquet reader's type promotion?
    */
  def widens(from: DataType, to: DataType): Boolean = (from, to) match {
    case (ByteType, ShortType | IntegerType | LongType | DoubleType) => true
    case (ShortType, IntegerType | LongType | DoubleType) => true
    case (IntegerType, LongType | DoubleType) => true
    case (FloatType, DoubleType) => true
    // decimal → wider decimal: lossless iff integer digits and scale both
    // survive (scale-up pads zeros; the reader rescales unscaled values)
    case (f: DecimalType, t: DecimalType) =>
      t != f && t.scale >= f.scale &&
        t.precision - t.scale >= f.precision - f.scale
    // integral → decimal: the full integral range must fit the target's
    // integer digits (max digit counts: byte 3, short 5, int 10, long 20)
    case (ByteType, t: DecimalType) => t.precision - t.scale >= 3
    case (ShortType, t: DecimalType) => t.precision - t.scale >= 5
    case (IntegerType, t: DecimalType) => t.precision - t.scale >= 10
    case (LongType, t: DecimalType) => t.precision - t.scale >= 20
    case _ => false
  }

  /** The evolved schema of a layer after committing `increment` against
    * `recorded`: per name-matching field the widest of the two types (or a
    * loud refusal when neither direction widens), recorded-only fields
    * kept (increment rows read null), increment-only fields appended when
    * `allowNew` (carried files read null) and refused otherwise.
    * Field order: recorded fields first (stable layer shape), then new.
    */
  def evolve(recorded: StructType, increment: StructType,
      allowNew: Boolean, context: String): StructType = {
    val incByName = increment.fields.map(f => f.name -> f).toMap
    val evolved = recorded.fields.map { old =>
      incByName.get(old.name) match {
        case None => old
        case Some(inc) if inc.dataType == old.dataType => old
        case Some(inc) if widens(old.dataType, inc.dataType) =>
          old.copy(dataType = inc.dataType)
        case Some(inc) if widens(inc.dataType, old.dataType) => old
        case Some(inc) => throw new IllegalArgumentException(
          s"$context: column '${old.name}' is ${old.dataType.simpleString} " +
            s"in the layer but ${inc.dataType.simpleString} in the " +
            "increment — neither is a safe widening of the other " +
            "(allowed: byte→short→int→long, float→double, " +
            "byte/short/int→double). Committing it would poison every " +
            "subsequent read of the layer; cast the increment explicitly.")
      }
    }
    val newFields = increment.fields.filterNot(f =>
      recorded.fieldNames.contains(f.name))
    if (newFields.nonEmpty && !allowNew) throw new IllegalArgumentException(
      s"$context: increment adds columns " +
        s"${newFields.map(_.name).mkString(", ")} the layer lacks — pass " +
        "allowSchemaEvolution = true to add them (carried files read null)")
    StructType(evolved ++ newFields)
  }
}
