package graft.model

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's BACnet-style prioritized point value
  * (`Iot.Database/IotValue.cs:17-22`): 17 parallel (value, timestamp)
  * slots; the effective value is the first non-null slot in priority order
  * (IotValue.cs:299-343). Slot names per IotValue.cs:722-845.
  *
  * Spark shape: `slots: array<struct<value:string, ts:timestamp>>` of
  * length 17 (index 0 = priority 1). Resolution is a pure expression, so
  * it runs inside whole-stage codegen.
  */
object IotValue {

  val NumSlots = 17

  /** Priority slot indices (1-based, as in the reference). */
  val ManualOperatorOverride = 1
  val CriticalEquipmentControl = 2
  val ControlStrategy = 9
  val Default = 15
  val Fallback = 16
  val QueryDriven = 17 // slot 17 stores the query config (IotValue.cs:1193-1252)

  /** Flag bits (IotValueFlags.cs:4-14). */
  val AllowManualOperator = 1
  val TimeSeries = 2
  val BlockChain = 4
  val PasswordValue = 8
  val LogChange = 16
  val ValueInterpolated = 32
  val Priority9Only = 64

  val slotType: DataType = ArrayType(StructType(Seq(
    StructField("value", StringType, nullable = true),
    StructField("ts", TimestampType, nullable = true))))

  /** First non-null slot value in priority order (IotValue.cs:299-343).
    * Slot 17 holds the query configuration, not a candidate value — the
    * reference's getter iterates `i < Values.Length - 1` and so never
    * resolves it; we slice to slots 1-16 to match.
    */
  def resolvePriority(slots: Column): Column = {
    val candidates = slice(slots, 1, NumSlots - 1)
    val firstNonNull = filter(candidates, s => s.getField("value").isNotNull)
    // get() is 0-based and null-safe on empty arrays (vs element_at, which
    // throws under ANSI mode when every slot is null)
    get(firstNonNull, lit(0)).getField("value")
  }

  /** 1-based priority that produced the resolved value, null if none.
    * Capped at 16: slot 17 (QueryConfiguration) never resolves.
    */
  def resolvedPriorityIndex(slots: Column): Column = {
    val idx = array_position(
      transform(slice(slots, 1, NumSlots - 1),
        s => s.getField("value").isNotNull), true)
    when(idx === 0, lit(null).cast("int")).otherwise(idx.cast("int"))
  }

  /** Write-rule guard (IotValue.cs:123-139): slots 1 and 8 require the
    * AllowManualOperator flag; Priority9Only restricts writes to slot 9.
    * Returns whether a write of `priority` is allowed given `flags`.
    */
  def writeAllowed(priority: Column, flags: Column): Column = {
    val manualOk = !priority.isin(ManualOperatorOverride, 8) ||
      flags.bitwiseAND(AllowManualOperator) =!= 0
    val p9Ok = flags.bitwiseAND(Priority9Only) === 0 ||
      priority === ControlStrategy
    manualOk && p9Ok
  }

  def hasFlag(flags: Column, bit: Int): Column = flags.bitwiseAND(bit) =!= 0

  /** Query-driven point value (IotValue.cs:299-327, 1193-1252): slot 14 is
    * filled from a registered continuous query's result at read time (the
    * query config itself lives in slot 17). `value`/`ts` null leaves the
    * slot empty.
    */
  val QueryDrivenSlot = 14

  def withQueryDrivenSlot(slots: Column, value: Column, ts: Column): Column =
    transform(slots, (s, i) =>
      when(i === QueryDrivenSlot - 1 && value.isNotNull,
        struct(value.as("value"), ts.as("ts"))).otherwise(s))

  /** Password-value hashing (IotValue.cs:1117-1145 ToPasswordHash):
    * null stays null ("no value"), empty stays empty ("no password" —
    * the reference distinguishes the two), anything else becomes its
    * lowercase SHA-256 hex. Codegen'd `sha2`, usable at scan scale.
    */
  def toPasswordHash(c: Column): Column =
    when(c.isNull, lit(null).cast("string"))
      .when(c === "", lit(""))
      .otherwise(sha2(c, 256))

  /** IsHash / IsPasswordHash (IotValue.cs:549-584): a 64-char hex
    * string.
    */
  def isHash(c: Column): Column =
    c.isNotNull && c.rlike("^[a-fA-F0-9]{64}$")

  /** IsPasswordMatches (IotValue.cs:584-616): stored hash equals the
    * candidate's hash.
    */
  def passwordMatches(stored: Column, password: String): Column =
    stored === toPasswordHash(lit(password))
}
