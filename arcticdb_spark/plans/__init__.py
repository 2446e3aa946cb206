"""Planning helpers: row-id assignment, schema promotion, pruning."""
