package graft.queries

import graft.QueryDef

object Dedup {
  def defs: Seq[QueryDef] = Seq.empty
}
