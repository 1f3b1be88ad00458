"""O7: example processing units — the two-step chained pipeline analog of
the reference's ``ExampleProcessor`` (reference src/ExampleProcessor.jl:8-93:
step 1 masks a variable against an ADF threshold, step 2 consumes step 1's
output — ``[inputs..., step1]`` chaining at :88-89).

Uniform PU contract: ``fn(inputs: list[DataTree], adfs: dict[str,
DataTree], spark=..., **kwargs) -> DataTree``.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions import cells
from ..sources.datatree import DataTree


def mask_threshold(inputs, adfs, spark=None, variable: str = "value", **kwargs) -> DataTree:
    """Step 1: element-wise conditional masking (the reference's where /
    pwhere, src/YAXTrees.jl:794-854) with the threshold read from an ADF
    (src/ExampleProcessor.jl step 1)."""
    tree = inputs[0]
    # typed ADF scalar: {"threshold": {"value": .., "type": ..}} becomes a
    # child node whose properties hold value/type (S5 from_dict semantics)
    thr = float(adfs["ADF1"]["params"]["threshold"].properties["value"]) if "ADF1" in adfs else 0.0
    out = DataTree(tree.name + "_masked")
    src = tree.data if tree.data is not None else next(n for n in tree if n.data is not None).data
    out.data = src.withColumn(
        variable,
        F.when(F.coalesce(F.col(variable) > thr, F.lit(False)), F.col(variable)).otherwise(F.lit(None)),
    )
    return out


def cell_counts(inputs, adfs, spark=None, res: int = 5, **kwargs) -> DataTree:
    """Step 2: consumes step 1's masked output — per-cell surviving-row
    counts (the flagship tiling aggregation)."""
    tree = inputs[-1]  # chained output arrives last, like [inputs..., step1]
    df = tree.data
    assert df is not None
    out = DataTree(tree.name + "_cells")
    out.data = (
        df.filter(F.col("value").isNotNull())
        .withColumn("cell_id", cells.latlng_to_cell_expr("lat", "lon", res))
        .groupBy("cell_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return out


def layer_stats(inputs, adfs, spark=None, var: str = "layer", **kwargs) -> DataTree:
    """Quickstart-parity unit (reference docs/src/quickstart.md:43-44):
    null-skipping min/max/count over a measurement variable of a NATIVE
    zarr product — Spark aggregates skip NULLs exactly like the
    reference's ``skipmissing`` after fill normalization."""
    tree = inputs[0]
    src = tree.data if tree.data is not None else next(n for n in tree if n.data is not None).data
    out = DataTree(tree.name + "_stats")
    out.data = src.agg(
        F.count(var).alias("n"), F.min(var).alias("vmin"), F.max(var).alias("vmax")
    )
    return out
