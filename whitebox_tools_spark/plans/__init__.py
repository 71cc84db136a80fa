"""Job drivers: lineage, checkpoint/resume."""
