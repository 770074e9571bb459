"""Data providers: MegaPose training shards, BOP test scenes, synthetic."""
