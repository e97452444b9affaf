"""Import-only stand-in for BioPython (tests never call the parser; see
tests/refsupport/jax_dataclasses for rationale)."""
