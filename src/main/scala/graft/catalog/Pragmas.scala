package graft.catalog

import java.io.{FileInputStream, FileOutputStream}
import java.nio.file.{Files, Paths}
import java.util.Properties

/** The reference's engine pragmas
  * (`LiteDB/Engine/EnginePragmas.cs:70-160`, names in `Pragmas.cs`):
  * USER_VERSION, COLLATION, TIMEOUT, LIMIT_SIZE, UTC_DATE, CHECKPOINT.
  * The reference persists them in the datafile header page; the facade
  * persists them as a properties file under the database root — same
  * contract (per-database, survives reopen), lakehouse storage.
  *
  * Semantics kept / mapped:
  *   - USER_VERSION: free application schema-version int, get/set.
  *   - COLLATION: read-only through the pragma surface, exactly like the
  *     reference ("Pragma COLLATION is read only. Use Rebuild options.").
  *   - TIMEOUT: must be > 0. Stored and reported; the parquet facade has
  *     no lock manager, so it is advisory (documented divergence).
  *   - LIMIT_SIZE: must be >= 4 pages (32768) and >= the current store
  *     size — both validations from the reference — and IS enforced:
  *     facade writes fail once the store exceeds it.
  *   - UTC_DATE: the engine pins UTC end to end (session TZ, stored
  *     micros), so true is accepted and false is rejected loudly rather
  *     than silently reading local-time dates (documented divergence —
  *     the reference defaults to local-time reads).
  *   - CHECKPOINT: must be >= 0. The WAL-pages-per-checkpoint analog in
  *     a parquet store is small-file maintenance: `GraftDatabase
  *     .checkpoint()` compacts any table directory holding more than
  *     this many data files (0 disables, like the reference).
  */
final class Pragmas(root: String, collationName: () => String,
    storeSizeFn: () => Long) {

  /** Raw-walk size fallback for callers without a live-size notion. */
  def this(root: String, collationName: () => String) =
    this(root, collationName, () => Pragmas.storeSize(root))

  import Pragmas._

  private val path = Paths.get(s"$root/pragmas.properties")

  private def load(): Properties = {
    val p = new Properties()
    if (Files.exists(path)) {
      val in = new FileInputStream(path.toFile)
      try p.load(in) finally in.close()
    }
    p
  }

  private def save(p: Properties): Unit = {
    val out = new FileOutputStream(path.toFile)
    try p.store(out, "graft engine pragmas") finally out.close()
  }

  def get(name: String): Any = name.toUpperCase match {
    case UserVersion => load().getProperty(UserVersion, "0").toInt
    case Collation   => collationName()
    case Timeout     => load().getProperty(Timeout, "60").toInt
    case LimitSize   => load().getProperty(LimitSize,
      Long.MaxValue.toString).toLong
    case UtcDate     => load().getProperty(UtcDate, "true").toBoolean
    case Checkpoint  => load().getProperty(Checkpoint, "1000").toInt
    case other => throw new IllegalArgumentException(
      s"unknown pragma '$other' (known: ${names.mkString(", ")})")
  }

  def set(name: String, value: Any): Unit = {
    val p = load()
    name.toUpperCase match {
      case UserVersion =>
        p.setProperty(UserVersion, asInt(name, value).toString)
      case Collation => throw new IllegalStateException(
        "Pragma COLLATION is read only. Use Rebuild options.")
      case Timeout =>
        val v = asInt(name, value)
        if (v <= 0) throw new IllegalArgumentException(
          "Pragma TIMEOUT must be greater than zero")
        p.setProperty(Timeout, v.toString)
      case LimitSize =>
        val v = asLong(name, value)
        if (v < MinLimitSize) throw new IllegalArgumentException(
          s"Pragma LIMIT_SIZE must be at least 4 pages ($MinLimitSize bytes)")
        val current = storeSizeFn()
        if (v < current) throw new IllegalArgumentException(
          "Pragma LIMIT_SIZE must be greater or equal to the current " +
            s"store size ($current bytes)")
        p.setProperty(LimitSize, v.toString)
      case UtcDate => value match {
        case true | "true" => p.setProperty(UtcDate, "true")
        case _ => throw new IllegalArgumentException(
          "Pragma UTC_DATE=false is not supported: this engine pins UTC " +
            "end to end (reference stores UTC and converts on read; " +
            "a lakehouse must not make stored bytes reader-local)")
      }
      case Checkpoint =>
        val v = asInt(name, value)
        if (v < 0) throw new IllegalArgumentException(
          "Pragma CHECKPOINT must be greater or equal to zero")
        p.setProperty(Checkpoint, v.toString)
      case other => throw new IllegalArgumentException(
        s"unknown pragma '$other' (known: ${names.mkString(", ")})")
    }
    save(p)
  }

  /** All pragmas as (name, value) rows — the `$database` face. */
  def all: Seq[(String, String)] = names.map(n => n -> get(n).toString)

  private def asLong(name: String, value: Any): Long = value match {
    case i: Int => i.toLong
    case l: Long => l
    case s: String if s.matches("-?\\d+") => s.toLong
    case other => throw new IllegalArgumentException(
      s"pragma $name expects an integer, got $other")
  }

  // int-typed pragmas must range-check BEFORE narrowing — a silent .toInt
  // wrap would store a value the validation just rejected
  private def asInt(name: String, value: Any): Int = {
    val v = asLong(name, value)
    if (v < Int.MinValue || v > Int.MaxValue)
      throw new IllegalArgumentException(
        s"pragma $name is a 32-bit value, got $v")
    v.toInt
  }
}

object Pragmas {
  val UserVersion = "USER_VERSION"
  val Collation = "COLLATION"
  val Timeout = "TIMEOUT"
  val LimitSize = "LIMIT_SIZE"
  val UtcDate = "UTC_DATE"
  val Checkpoint = "CHECKPOINT"
  val names: Seq[String] =
    Seq(UserVersion, Collation, Timeout, LimitSize, UtcDate, Checkpoint)

  /** 4 × the reference's 8 KiB page (`EnginePragmas.cs` LIMIT_SIZE rule). */
  val MinLimitSize: Long = 32768L

  /** Total on-disk size of a database root — metadata-only walk. */
  def storeSize(root: String): Long = {
    val r = Paths.get(root)
    if (!Files.exists(r)) 0L
    else {
      val s = Files.walk(r)
      try s.filter(Files.isRegularFile(_))
        .mapToLong(f => Files.size(f)).sum()
      finally s.close()
    }
  }
}
