"""End-to-end extraction pipeline (spans → normalized spans) + checkpointing."""
