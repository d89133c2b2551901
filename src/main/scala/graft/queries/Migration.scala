package graft.queries

import graft.QueryDef

object Migration {
  def defs: Seq[QueryDef] = Seq.empty
}
