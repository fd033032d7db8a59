"""Sketch-operator queries (approximate — rows-only driver check; accuracy
is asserted in tests/ against the exact oracles with reference tolerances).

Populated as the sketch UDAFs land (SURVEY §7.1 M2-M4).
"""
