"""Import-only stand-in for biopandas (never invoked by the tests)."""
