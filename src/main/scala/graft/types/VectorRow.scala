package graft.types

/** The engine's row type (SURVEY §1.1): sequential id, L2-normalized
  * float vector, JSON-string metadata. Used for typed Dataset views at API
  * boundaries; hot paths stay DataFrame/Catalyst.
  */
final case class VectorRow(id: Long, vector: Seq[Float], metadata: String)
