"""Plan module — populated incrementally."""
