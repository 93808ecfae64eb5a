"""Plans: lineage tracking and checkpoint-resume."""
