"""Sources: deterministic synthetic generators + IO registry."""
