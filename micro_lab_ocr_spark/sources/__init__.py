"""Sources: fixture corpus generator (FIXTURES.md) and table readers."""
