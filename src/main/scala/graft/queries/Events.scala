package graft.queries

import graft.QueryDef

object Events {
  def defs: Seq[QueryDef] = Seq.empty
}
