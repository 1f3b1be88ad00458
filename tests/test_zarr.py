"""Native Zarr v2 reader (sources/zarr.py): opens the REFERENCE's own
committed fixture (test/resources/yax.zarr, blosc/lz4/shuffle) from
scratch — pure-Python LZ4 block + blosc container decode — plus the zip
twin, chunk-grid assembly, fill-value holes, and a zlib round trip.
"""

from __future__ import annotations

import numpy as np
import pytest

REF = "/root/reference/test/resources"


def test_reference_fixture_opens_natively(spark):
    """The reference's golden store (reference test/test_yaxtree.jl:49-71
    asserts this structure) opens without zarr/numcodecs installed."""
    from copernicusdata_jl_spark.sources.zarr import open_zarr_datatree

    t = open_zarr_datatree(spark, f"{REF}/yax.zarr")
    assert sorted(t.children) == ["grp1"]
    assert sorted(t.data.columns) == ["Dim_1", "idx_Dim_1", "layer"]
    assert sorted(t["grp1"].data.columns) == ["Dim_1", "a1", "a2", "idx_Dim_1"]
    rows = t.data.orderBy("idx_Dim_1").collect()
    assert len(rows) == 100
    vals = np.array([r["layer"] for r in rows])
    assert np.allclose(vals, np.linspace(0.0, 100.0, 100))
    assert [r["Dim_1"] for r in rows] == list(range(1, 101))
    # fill_value surfaced the reference way: per-variable missing_value
    assert float(t.properties["missing_value"]["layer"]) == 1.0e32
    assert t["grp1"].data.count() == 10


def test_zip_twin_isomorphic(spark):
    """reference src/YAXTrees.jl:454-455: the zipped store opens to the
    same tree (isomorphic = schema/structure parity, T9 contract)."""
    from copernicusdata_jl_spark.sources.datatree import open_datatree
    from copernicusdata_jl_spark.sources.zarr import open_zarr_datatree

    t_dir = open_zarr_datatree(spark, f"{REF}/yax.zarr")
    t_zip = open_datatree(spark, f"{REF}/yax.zarr.zip")  # dispatch sniffs zarr members
    assert t_dir.isomorphic(t_zip)
    a = t_dir.data.orderBy("idx_Dim_1").collect()
    b = t_zip.data.orderBy("idx_Dim_1").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_open_datatree_dispatches_zarr_dir(spark):
    from copernicusdata_jl_spark.sources.datatree import open_datatree

    t = open_datatree(spark, f"{REF}/yax.zarr")
    assert "layer" in t.data.columns


def test_roundtrip_zlib_multichunk_edge_and_hole(spark, tmp_path):
    """Writer/reader round trip on a 2-d array with edge chunks; deleting
    a chunk file leaves a fill_value hole (spec behavior for sparse
    stores)."""
    import os

    from copernicusdata_jl_spark.sources.zarr import (
        open_zarr_datatree,
        write_zarr_array,
        write_zarr_group,
    )

    root = str(tmp_path / "store.zarr")
    write_zarr_group(root)
    a = np.arange(35, dtype=np.float64).reshape(5, 7)
    write_zarr_array(
        root, "m", a, chunks=(2, 3), fill_value=-1.0,
        attrs={"_ARRAY_DIMENSIONS": ["y", "x"]},
    )
    t = open_zarr_datatree(spark, root)
    got = {(r["idx_y"], r["idx_x"]): r["m"] for r in t.data.collect()}
    assert len(got) == 35
    assert all(got[(i, j)] == a[i, j] for i in range(5) for j in range(7))

    os.remove(os.path.join(root, "m", "0.0"))  # chunk hole
    t2 = open_zarr_datatree(spark, root)
    got2 = {(r["idx_y"], r["idx_x"]): r["m"] for r in t2.data.collect()}
    # fill sentinel normalizes to NULL (None) at scan
    assert got2[(0, 0)] is None and got2[(1, 2)] is None
    assert got2[(0, 3)] == a[0, 3] and got2[(4, 6)] == a[4, 6]


def test_blosc_decoder_errors_are_loud():
    from copernicusdata_jl_spark.sources.zarr import blosc_decompress

    with pytest.raises(ValueError):
        blosc_decompress(b"short")
    # bit-shuffle flag (0x4) must refuse, never return wrong bytes
    import struct

    hdr = bytes([2, 1, 0x4, 8]) + struct.pack("<III", 16, 16, 16)
    with pytest.raises(NotImplementedError):
        blosc_decompress(hdr)


def test_lz4_block_roundtrip_against_fixture_bytes():
    """Value pin: decode the fixture's raw chunk and compare against the
    known linspace contents (independently of the tree layer)."""
    import struct

    from copernicusdata_jl_spark.sources.zarr import blosc_decompress

    raw = open(f"{REF}/yax.zarr/layer/0", "rb").read()
    buf = blosc_decompress(raw)
    vals = np.frombuffer(buf, dtype="<f8")
    assert np.allclose(vals, np.linspace(0.0, 100.0, 100))
    nbytes = struct.unpack("<I", raw[4:8])[0]
    assert len(buf) == nbytes == 800


def test_tree_to_zarr_roundtrip_native(spark, tmp_path):
    """S10 native round trip (reference to_zarr, src/YAXTrees.jl:748-773):
    open the reference fixture, write it back as a Zarr v2 store, re-open
    — isomorphic tree, identical values, NULL sentinels preserved, and
    the rewritten store opens consolidated (one .zmetadata read)."""
    from copernicusdata_jl_spark.sources.zarr import open_zarr_datatree

    t = open_zarr_datatree(spark, f"{REF}/yax.zarr")
    out = str(tmp_path / "copy.zarr")
    t.to_zarr(out)
    import pytest as _pytest

    with _pytest.raises(FileExistsError):
        t.to_zarr(out)  # refuse-overwrite, like the reference
    back = open_zarr_datatree(spark, out)
    assert back.isomorphic(t)
    a = [tuple(r) for r in t.data.orderBy("idx_Dim_1").collect()]
    b = [tuple(r) for r in back.data.orderBy("idx_Dim_1").collect()]
    assert a == b
    g1 = [tuple(r) for r in t["grp1"].data.orderBy("idx_Dim_1").collect()]
    g2 = [tuple(r) for r in back["grp1"].data.orderBy("idx_Dim_1").collect()]
    assert g1 == g2
    import os

    assert os.path.exists(os.path.join(out, ".zmetadata"))


def test_to_zarr_null_sentinel_roundtrip(spark, tmp_path):
    """NULLs written through the recorded missing_value sentinel come back
    as NULLs."""
    from copernicusdata_jl_spark.sources.datatree import DataTree
    from copernicusdata_jl_spark.sources.zarr import open_zarr_datatree
    from pyspark.sql import functions as F

    df = spark.range(6).select(
        F.col("id").alias("idx_t"),
        F.when(F.col("id") == 3, None).otherwise(F.col("id") * 1.5).alias("v"),
    )
    t = DataTree("x", properties={"missing_value": {"v": 1.0e32}})
    t.data = df
    out = str(tmp_path / "n.zarr")
    t.to_zarr(out)
    back = open_zarr_datatree(spark, out)
    got = {r["idx_t"]: r["v"] for r in back.data.collect()}
    assert got[3] is None and got[2] == 3.0 and len(got) == 6


def test_payload_binds_reference_zarr_zip(spark, tmp_path):
    """The reference's own payload shape (test/resources/payload.toml:
    inputs_products path=resources/yax.zarr.zip, store_type='zarr') runs
    through our orchestrator against the reference's actual store: bind
    the zipped zarr product natively, compute skipmissing-style stats."""
    from copernicusdata_jl_spark.plans import payload as P

    toml = tmp_path / "p.toml"
    toml.write_text(
        f"""
[[workflow]]
module = "copernicusdata_jl_spark.plans.example_processor"
processing_unit = "layer_stats"
name = "stats"
inputs = ["yax-input"]

["I/O"]
  [["I/O".inputs_products]]
  id = "yax-input"
  path = "{REF}/yax.zarr.zip"
  store_type = "zarr"

[breakpoints]
related_unit = []
break_mode = "soft"
storage = "bp"

[logging]
level = "warning"
"""
    )
    outs = P.run(str(toml), spark)
    row = outs["stats"].data.first()
    assert row["n"] == 100 and row["vmin"] == 0.0 and row["vmax"] == 100.0
