"""Batch-transform stages: map_batches callables (stateless fns + actor classes)."""
