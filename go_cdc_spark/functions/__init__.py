"""Custom function layer: GTID-set algebra, filter-rule compiler."""
