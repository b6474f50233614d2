"""External ground-truth validation data and profile extraction."""
