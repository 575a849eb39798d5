"""Frozen semantic contracts shared by the Spark engine and the oracle.

Everything in this package is pure Python with zero Spark imports, so the
same byte-identical logic runs inside pandas-UDF workers, inside the
plain-Python oracle, and inside tests.  That sharing is the mechanism that
turns the BASELINE "triple P/R >= 0.95" gate into a deterministic equality.
"""
