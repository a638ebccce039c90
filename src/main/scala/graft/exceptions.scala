package graft

/** Exception hierarchy mirroring the reference's public error contract
  * (reference: awswrangler/exceptions.py:4-101). Sealed so callers can
  * match exhaustively; names preserved for API parity.
  */
sealed abstract class GraftException(msg: String) extends RuntimeException(msg)

object exceptions {
  final case class InvalidCompression(msg: String)         extends GraftException(msg)
  final case class InvalidArgumentValue(msg: String)       extends GraftException(msg)
  final case class InvalidArgumentType(msg: String)        extends GraftException(msg)
  final case class InvalidArgumentCombination(msg: String) extends GraftException(msg)
  final case class InvalidArgument(msg: String)            extends GraftException(msg)
  final case class UnsupportedType(msg: String)            extends GraftException(msg)
  final case class UndetectedType(msg: String)             extends GraftException(msg)
  final case class ServiceApiError(msg: String)            extends GraftException(msg)
  final case class InvalidTable(msg: String)               extends GraftException(msg)
  final case class QueryFailed(msg: String)                extends GraftException(msg)
  final case class QueryCancelled(msg: String)             extends GraftException(msg)
  final case class EmptyDataFrame(msg: String)             extends GraftException(msg)
  final case class InvalidConnection(msg: String)          extends GraftException(msg)
  final case class InvalidDatabaseType(msg: String)        extends GraftException(msg)
  final case class RedshiftLoadError(msg: String)          extends GraftException(msg)
  final case class InvalidRedshiftDiststyle(msg: String)   extends GraftException(msg)
  final case class InvalidRedshiftDistkey(msg: String)     extends GraftException(msg)
  final case class InvalidRedshiftSortstyle(msg: String)   extends GraftException(msg)
  final case class InvalidRedshiftSortkey(msg: String)     extends GraftException(msg)
  final case class InvalidRedshiftPrimaryKeys(msg: String) extends GraftException(msg)
  final case class InvalidSchemaConvergence(msg: String)   extends GraftException(msg)
  final case class InvalidConfiguration(msg: String)       extends GraftException(msg)
  final case class NoFilesFound(msg: String)               extends GraftException(msg)
  final case class InvalidDataFrame(msg: String)           extends GraftException(msg)
  final case class InvalidFile(msg: String)                extends GraftException(msg)
}
