"""Pure, deterministic scalar/vector functions shared by stages and oracle."""
