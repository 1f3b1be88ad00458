"""Scalar / vectorized kernels: cell grid, geodesy, text, vectors.

Everything row-level is either a Catalyst column expression (preferred —
JVM-side, whole-stage codegen) or an Arrow-batched pandas UDF (NumPy inside,
never per-row Python), per the engine's vectorization constraint.
"""
