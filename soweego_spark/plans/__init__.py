"""Plans: the end-to-end ER pipeline and stage checkpointing."""
