package graft.table

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.cells.BinnedTime

/** Table pre-split computation — the reference's DefaultSplitter
  * (geomesa-index-api/.../conf/splitter/DefaultSplitter.scala:29-229 with
  * SplitPatternParser.scala): split points configured as user data
  * (`z3.min/max/bits`, `attr.<name>.pattern[N]`, `id.pattern[N]`,
  * `z2.bits`) that the reference hands to the key-value store to
  * pre-split tablets. The byte layouts are reproduced exactly (fixture-
  * tested against DefaultSplitterTest): z3 = 2-byte time bin ++ 8-byte
  * z with `bits` leading value bits (first z bit always 0), attribute
  * strings = the pattern's character cross product, numbers lexicoded as
  * sign-flipped fixed-width hex (AttributeIndexKey.encodeForQuery).
  *
  * Spark-side, split points are write-time distribution boundaries: a
  * sorted index layout distributes rows by [[Splitter.rangeId]] — the
  * number of split points <= the key falls before it — giving the same
  * balanced pre-split regions as the reference's tablet boundaries
  * without a table server. The assignment is a pure Catalyst `aggregate`
  * over literal boundaries (driver-computed, tiny), evaluated map-side. */
object Splitter {

  /** `k1:v1,k2:v2` — the reference's KVPairParser. */
  def parseOptions(options: String): Map[String, String] =
    options.split(',').iterator.map(_.trim).filter(_.nonEmpty).map { kv =>
      val i = kv.indexOf(':')
      require(i > 0, s"not a key:value pair: $kv")
      kv.substring(0, i).trim -> kv.substring(i + 1).trim
    }.toMap

  /** Reference DefaultSplitter.getSplits: split points for an index
    * type from a `k:v,...` options string. */
  def splits(sft: Sft.Schema, index: String, options: String): Seq[Array[Byte]] = {
    val opts = Option(options).map(parseOptions).getOrElse(Map.empty)
    index match {
      case "id" => idSplits(opts)
      case "attr" => attributeSplits(sft, opts)
      case "z3" | "xz3" => z3Splits(sft, opts)
      case "z2" | "xz2" => z2Splits(opts)
      case other => throw new IllegalArgumentException(s"Unhandled index type $other")
    }
  }

  // ---- index-specific splits ------------------------------------------

  private def patternsOf(opts: Map[String, String], option: String): Seq[String] =
    (Iterator.single(opts.get(option).orNull) ++
      Iterator.range(2, Int.MaxValue).map(i => opts.get(s"$option$i").orNull))
      .takeWhile(_ != null).toSeq

  /** Feature-id splits; hex distribution `[0][4][8][c]` by default. */
  private def idSplits(opts: Map[String, String]): Seq[Array[Byte]] = {
    val patterns =
      if (opts.contains("id.pattern")) patternsOf(opts, "id.pattern")
      else Seq("[0]", "[4]", "[8]", "[c]")
    patterns.flatMap(parsePattern).flatMap(stringPatternSplits)
  }

  /** Per-indexed-attribute splits from `attr.<name>.pattern[N]`. */
  private def attributeSplits(sft: Sft.Schema, opts: Map[String, String]): Seq[Array[Byte]] = {
    // same notion of "indexed" as the rest of the engine (true|join|full,
    // never the default geometry) — Sft.secondaryIndexed
    val secondary = sft.secondaryIndexed.toSet
    val indexed = sft.fields.filter(f => secondary.contains(f.name))
    indexed.flatMap { f =>
      val ranges = patternsOf(opts, s"attr.${f.name}.pattern").flatMap(parsePattern)
      val numeric = Set("Int", "Integer", "Long", "Short", "Byte")(f.typeName)
      if (numeric) {
        try ranges.flatMap(numberPatternSplits(_, f.typeName))
        catch {
          case e: NumberFormatException =>
            throw new IllegalArgumentException(s"Trying to create splits for attribute '${f.name}' " +
              s"of type ${f.typeName}, but splits could not be parsed as a number", e)
        }
      } else ranges.flatMap(stringPatternSplits)
    }
  }

  /** One split per time bin between z3.min and z3.max, times 2^bits
    * z-prefix splits (first z bit is always 0 — DefaultSplitter
    * .scala:152). */
  private def z3Splits(sft: Sft.Schema, opts: Map[String, String]): Seq[Array[Byte]] = {
    val min = opts.get("z3.min")
    val max = opts.get("z3.max")
    if (min.isEmpty) return Seq(Array.empty)
    val period = BinnedTime.period(sft.userDataMap.getOrElse("geomesa.z3.interval", "week"))
    def toMillis(s: String): Long =
      try graft.plans.Cql.parseInstant(s).toEpochMilli
      catch { case _: Exception =>
        throw new IllegalArgumentException(s"Could not convert dates '$min/$max' for splits") }
    val minBin = BinnedTime.toBinned(period, toMillis(min.get)).bin
    val maxBin = BinnedTime.toBinned(period, max.map(toMillis).getOrElse(System.currentTimeMillis())).bin
    val times = (minBin to maxBin).map(b => Array((b >> 8).toByte, b.toByte))
    opts.get("z3.bits").map(_.toInt) match {
      case None => times
      case Some(bits) =>
        for (time <- times; z <- bitSplits(bits, maskedBits = 1)) yield time ++ z
    }
  }

  /** 2^bits splits on the z2 value (first two z bits always 0). */
  private def z2Splits(opts: Map[String, String]): Seq[Array[Byte]] =
    opts.get("z2.bits").map(b => bitSplits(b.toInt, maskedBits = 2)).getOrElse(Seq(Array.empty))

  /** All 2^bits prefixes as 8-byte big-endian values with `maskedBits`
    * leading zero bits. */
  private[table] def bitSplits(bits: Int, maskedBits: Int): Seq[Array[Byte]] = {
    require(bits > 0 && bits < 64, "Bit split must be between 1 and 63")
    (0L until (1L << bits)).map { i =>
      val v = i << (64 - maskedBits - bits)
      (0 until 8).map(b => (v >>> (8 * (7 - b))).toByte).toArray
    }
  }

  // ---- the split pattern DSL ------------------------------------------

  /** `[A-Z]`, `[0-35-8]`, `[a][0-9]` — each bracket level is a union of
    * single chars and inclusive ranges; levels cross-product into
    * (from, to) string pairs (reference SplitPatternParser). */
  private[table] def parsePattern(pattern: String): Seq[(String, String)] = {
    val s = pattern.replaceAll("\\s", "")
    require(s.nonEmpty && s.head == '[' && s.last == ']', s"Invalid split pattern: $pattern")
    val levels: Seq[Seq[(String, String)]] = s.substring(1, s.length - 1).split("\\]\\[").toSeq.map { level =>
      require(level.nonEmpty, s"Invalid split pattern: $pattern")
      val out = Seq.newBuilder[(String, String)]
      var i = 0
      while (i < level.length) {
        if (i + 2 < level.length && level.charAt(i + 1) == '-') {
          out += ((level.charAt(i).toString, level.charAt(i + 2).toString)); i += 3
        } else {
          out += ((level.charAt(i).toString, level.charAt(i).toString)); i += 1
        }
      }
      out.result()
    }
    levels.reduceLeft { (left, right) =>
      for (a <- left; b <- right) yield (a._1 + b._1, a._2 + b._2)
    }
  }

  private def stringPatternSplits(range: (String, String)): Seq[Array[Byte]] =
    (0 until range._1.length)
      .map(i => (range._1.charAt(i) to range._2.charAt(i)).map(c => Array(c.toByte)))
      .reduceLeft { (left, right) => for (a <- left; b <- right) yield a ++ b }

  /** Digit-position permutations lexicoded like AttributeIndexKey
    * .encodeForQuery: fixed-width hex of the sign-flipped value. */
  private def numberPatternSplits(range: (String, String), typeName: String): Seq[Array[Byte]] = {
    val digitRanges = (0 until range._1.length).map { i =>
      (Integer.parseInt(range._1.charAt(i).toString), Integer.parseInt(range._2.charAt(i).toString))
    }
    val values = digitRanges.foldLeft(Seq("")) { (acc, r) =>
      for (v <- acc; d <- r._1 to r._2) yield v + d
    }
    values.map(v => lexicode(v, typeName).getBytes(StandardCharsets.UTF_8))
  }

  private[table] def lexicode(value: String, typeName: String): String = typeName match {
    case "Int" | "Integer" => "%08x".format(value.toInt ^ Int.MinValue)
    case "Long" => "%016x".format(value.toLong ^ Long.MinValue)
    case "Short" => "%04x".format((value.toShort ^ Short.MinValue) & 0xffff)
    case "Byte" => "%02x".format((value.toByte ^ Byte.MinValue) & 0xff)
    case other => throw new IllegalArgumentException(s"cannot lexicode type $other")
  }

  // ---- Spark integration ----------------------------------------------

  /** Region id of a BinaryType key column against the split points: the
    * count of split points <= the key (Spark's BinaryType ordering is
    * the same unsigned-lexicographic order as the reference's tablet
    * boundaries). Pure Catalyst over literal boundaries — use as the
    * distribution column of a pre-split sorted write
    * (`df.repartition(splits.size + 1, rangeId(...))` + in-partition
    * sort). */
  def rangeId(key: Column, splits: Seq[Array[Byte]]): Column = {
    require(splits.nonEmpty, "no split points")
    val boundaries = array(splits.map(lit): _*)
    aggregate(boundaries, lit(0),
      (acc, s) => acc + when(key >= s, 1).otherwise(0))
  }
}
