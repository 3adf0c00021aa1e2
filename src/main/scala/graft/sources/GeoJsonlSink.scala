package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

import graft.GraftError
import graft.geom.{GeoJsonEncode, WkbCodec}

/** Line-delimited GeoJSON EXPORT — the write direction of the `geojsonl`
  * source: one Feature per line, geometry re-encoded from the WKB `geom`
  * column, every other column a property. Executor-parallel (one part
  * file per partition, written to a temp name and renamed — a retried
  * task re-renames the same final name, so speculative attempts stay
  * idempotent), driver only prepares the directory. Round-trip contract:
  * `read(write(read(x)))` is row-identical to `read(x)` including double
  * bits (shortest-round-trip printing) — pinned by GeoJsonlSinkSpec and
  * the q92 oracle (the round-tripped fixture must still hash-match the
  * closed-form q75 oracle).
  */
object GeoJsonlSink {

  /** @param mode "error" (fail if dir has part files) or "overwrite" */
  def write(df: DataFrame, dir: String, geomCol: String = "geom",
            mode: String = "error"): Unit = {
    val path = Paths.get(dir)
    Files.createDirectories(path)
    val existing = Option(path.toFile.listFiles())
      .getOrElse(Array.empty).filter(_.getName.endsWith(".geojsonl"))
    mode match {
      case "overwrite" => existing.foreach(f => { f.delete(); () })
      case "error" =>
        if (existing.nonEmpty)
          throw GraftError.TableExists(s"geojsonl dir not empty: $dir")
      case other => throw new IllegalArgumentException(s"bad mode $other")
    }
    val schema = df.schema
    val geomIdx = schema.fieldIndex(geomCol)
    require(schema(geomIdx).dataType == BinaryType, s"$geomCol must be WKB binary")
    val attrs = schema.fields.zipWithIndex.filter(_._2 != geomIdx)
    df.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      if (rows.hasNext) {
        val pid = org.apache.spark.TaskContext.get().partitionId()
        val att = org.apache.spark.TaskContext.get().taskAttemptId()
        val tmp = Paths.get(dir, f"part-$pid%05d.$att%d.tmp")
        val out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
          Files.newOutputStream(tmp), StandardCharsets.UTF_8), 1 << 20)
        try {
          val sb = new StringBuilder(256)
          rows.foreach { r =>
            sb.setLength(0)
            sb.append("""{"type":"Feature","geometry":""")
            if (r.isNullAt(geomIdx)) sb.append("null")
            else sb.append(GeoJsonEncode.encode(WkbCodec.read(r.getAs[Array[Byte]](geomIdx))))
            sb.append(""","properties":{""")
            var first = true
            attrs.foreach { case (f, i) =>
              if (!first) sb.append(',')
              first = false
              jsonString(f.name, sb); sb.append(':')
              if (r.isNullAt(i)) sb.append("null")
              else f.dataType match {
                case StringType => jsonString(r.getString(i), sb)
                case LongType => sb.append(r.getLong(i))
                case IntegerType => sb.append(r.getInt(i))
                case DoubleType =>
                  // JSON has no NaN/Infinity literal — null-encode non-finite
                  // values so every emitted line stays parseable (the
                  // read-back half of the round-trip contract)
                  val d = r.getDouble(i)
                  if (java.lang.Double.isFinite(d)) sb.append(d.toString)
                  else sb.append("null")
                case BooleanType => sb.append(r.getBoolean(i))
                case other => throw new IllegalArgumentException(
                  s"geojsonl write: unsupported property type $other for ${f.name}")
              }
            }
            sb.append("}}\n")
            out.write(sb.toString)
          }
        } finally out.close()
        // idempotent publish: every attempt of partition pid renames onto
        // the same final name
        Files.move(tmp, Paths.get(dir, f"part-$pid%05d.geojsonl"),
          StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
        ()
      }
    }
  }

  private def jsonString(s: String, sb: StringBuilder): Unit = {
    sb.append('"')
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"')
    ()
  }
}
