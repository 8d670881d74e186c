"""Test support: pure-numpy scalar mirrors of the reference kernels and
synthetic scene generators.

The reference's own verification methodology was host-mirror differential
testing (CPU twins of each GPU stage + mismatch-count comparators, see
SURVEY.md section 4).  We keep that idea but make the mirrors pure numpy,
deterministic, and pytest-asserted.
"""
