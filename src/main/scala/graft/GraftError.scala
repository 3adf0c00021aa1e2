package graft

/** Error taxonomy mirroring the reference's `enum Error`
  * (`/root/reference/src/error.rs:5-32`) — same user-facing variants, as a
  * sealed Scala hierarchy. */
sealed abstract class GraftError(msg: String) extends RuntimeException(msg)

object GraftError {
  final case class FailedValidation(msg: String) extends GraftError(msg)
  final case class UnsupportedFileExtension(path: String)
    extends GraftError(s"Unsupported file extension: $path")
  final case class UnsupportedShapeType(shapeType: Int)
    extends GraftError(s"Unsupported shape type: $shapeType")
  final case class MixedDataTypes(column: String)
    extends GraftError(s"Mixed data types in column: $column")
  final case class TableExists(table: String)
    extends GraftError(s"Table already exists: $table (save mode fail)")
  final case class InvalidMode(mode: String)
    extends GraftError(s"Invalid save mode: $mode (expected fail|overwrite|append)")
  final case class Format(msg: String) extends GraftError(msg)
  /** North-rule extension (not in the reference taxonomy): a snapshot
    * manifest CAS lost a concurrent-writer race — re-read `current`, retry. */
  final case class ConcurrentCommit(table: String, snapshot: Long)
    extends GraftError(s"Concurrent commit of snapshot $snapshot to $table lost the race")
}
