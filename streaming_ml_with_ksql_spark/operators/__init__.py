"""Dataflow operators: the reference's KSQL operator surface plus the
large-scale training-data pipeline extensions, each expressed as a
DataFrame → DataFrame function so plans stay composable and Catalyst keeps
optimizing across operator boundaries."""
