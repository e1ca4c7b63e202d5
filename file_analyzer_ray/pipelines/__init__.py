"""Pipeline compositions (Dataset plans)."""
