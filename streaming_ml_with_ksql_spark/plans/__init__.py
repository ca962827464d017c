"""Multi-table relational plans over the driver's TPC-H-ish star schema —
the 'Spark gives these free' surface (SURVEY.md §2.9) exercised with real
plans so joins/aggregations keep their coverage boxes checked."""
