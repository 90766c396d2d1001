"""Query plans: the engine's public query surface + ANSI-SQL oracles."""
