"""Host-side utilities: data prep, BOP IO, timing, visualization."""
