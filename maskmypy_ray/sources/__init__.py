"""Sources: deterministic web-page derivation + side-table synthesis."""
