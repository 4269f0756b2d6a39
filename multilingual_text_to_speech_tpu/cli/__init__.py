"""Command-line entry points (train / synthesize / gta / prepare)."""
