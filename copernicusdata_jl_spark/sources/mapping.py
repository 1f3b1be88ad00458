"""S4/P5: mapping-driven scan with variable rename projection — the Spark
re-expression of the reference's SEN3/SAFE JSON mapping files
(reference src/safe.jl:4-11; src/YAXTrees.jl:529-613; e.g.
src/mappings/S03OLCEFR_mapping.json: ``chunk_sizes`` + ``data_mapping``
{group_path → {source → [[src_var, dest_var], ...]}}, with renames like
``Oa01_radiance → oa01_radiance``).

Our mapping dict (JSON-loadable):

    {
      "chunk_sizes": {"rows": 1024},          # → repartition granularity
      "data_mapping": {
        "measurements/geo": {
          "source": "<parquet path relative to product root>",
          "vars": [["Latitude", "lat"], ["Longitude", "lon"]]
        }, ...
      }
    }

The rename projection is a pure ``select(col(src).alias(dest))`` — Catalyst
column pruning pushes it into the parquet scan, so unmapped columns are
never read (the reference reads only mapped variables per nc file).
``group`` filters mapped groups by substring before any scan is planned
(S4's group filter, src/YAXTrees.jl:566-568 — partition-pruning analog).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .datatree import DataTree


def apply_mapping(df: DataFrame, var_pairs: list[list[str]], strict: bool = False) -> DataFrame:
    """select(col(src).alias(dest)) for each [src, dest] pair; missing
    sources are skipped with the reference's warn-don't-fail contract
    (src/YAXTrees.jl copy_subset verbose path) unless ``strict``."""
    cols = []
    for src, dest in var_pairs:
        if src in df.columns:
            cols.append(F.col(src).alias(dest))
        elif strict:
            raise KeyError(f"mapped variable {src!r} not in {df.columns}")
    return df.select(*cols)


def open_mapped_datatree(
    spark: SparkSession,
    product_root: str,
    mapping: dict | str,
    name: str | None = None,
    group: str | None = None,
) -> DataTree:
    if isinstance(mapping, str):
        with open(mapping) as f:
            mapping = json.load(f)
    assert isinstance(mapping, dict)
    chunk = mapping.get("chunk_sizes", {})
    tree = DataTree(name or os.path.basename(product_root.rstrip("/")))
    tree.properties["chunk_sizes"] = chunk
    for group_path, spec in sorted(mapping.get("data_mapping", {}).items()):
        if group is not None and group not in group_path:
            continue  # group filter: dataset never planned/scanned
        node = tree.add_children_full_path(group_path)
        src = os.path.join(product_root, spec["source"])
        strict = bool(spec.get("strict", False))
        if src.endswith(".nc"):
            # real .SEN3 container: the pure-stdlib NetCDF-3 reader
            # (sources/netcdf3.py; NetCDF-4/HDF5 stays gated on h5py).
            # Mapped variables must be co-dimensioned (they are, per nc
            # group in the reference's mappings); index columns ride along
            # and the missing_value map is re-keyed to the dest names.
            from .netcdf3 import nc3_group_frames

            frames, _gattrs, fills = nc3_group_frames(spark, src)
            if not frames:
                raise ValueError(f"{src}: NetCDF container holds no variables")
            wanted = {s for s, _d in spec["vars"]}
            df, members = max(frames, key=lambda fm: len(set(fm[1]) & wanted))
            # the mapping contract is co-dimensioned vars per source; a
            # spec whose vars span differently-shaped nc groups must fail
            # LOUDLY, not silently drop the minority shape (r5 review) —
            # vars absent from the file entirely stay governed by `strict`
            in_file = {v for _f, ms in frames for v in ms}
            cross = sorted((wanted & in_file) - set(members))
            if cross:
                raise ValueError(
                    f"{src}: mapped variables {cross} have a different "
                    f"shape than {sorted(set(members) & wanted)}; mapped "
                    f"vars must be co-dimensioned per source"
                )
            idx_pairs = [[c, c] for c in df.columns if c.startswith("idx_")]
            df = apply_mapping(df, idx_pairs + [list(p) for p in spec["vars"]], strict=strict)
            mv = {d: fills[s] for s, d in spec["vars"] if s in fills and s in members}
            if mv:
                node.properties["missing_value"] = mv
        else:
            df = spark.read.parquet(src)
            df = apply_mapping(df, spec["vars"], strict=strict)
        nrows = chunk.get("rows")
        if nrows:
            # chunk_sizes → partition granularity (reference attaches
            # chunk_sizes to the tree, src/YAXTrees.jl:608-610)
            node.properties["target_rows_per_partition"] = nrows
        node.data = df
    return tree
