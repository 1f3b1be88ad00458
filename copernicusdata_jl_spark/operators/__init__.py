"""Dataflow operators: selection/masking, spatial join, kNN, tiling,
interpolation, dedup, similarity — each a declarative DataFrame
transformation (Catalyst-planned) with Arrow-batched kernels only where SQL
cannot express the semantics (PIP, interpolation, minhash)."""
