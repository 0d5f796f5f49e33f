package graft.queries

import graft.QueryDef

// Placeholder registries — filled in module by module (SURVEY §7).
object Streaming { def defs: Seq[QueryDef] = Seq.empty }
